"""Tokenizer-repair + name-mapper tests (reference: tokenizer_utils.py
behaviors; loader_utils.get_model_name + mapper catalog)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.data.tokenizer_utils import (check_tokenizer,
                                              fix_pad_token,
                                              fix_untrained_tokens,
                                              validate_chat_template)
from unsloth_tpu.models.mapper import (get_model_name, search_models,
                                       strip_quant_suffix)


class FakeTok:
    eos_token = "</s>"
    eos_token_id = 2
    bos_token_id = 1
    pad_token = None

    def __init__(self, vocab=None):
        self._vocab = vocab or {"</s>": 2, "<s>": 1, "hello": 5, "world": 6}

    def get_vocab(self):
        return self._vocab

    def __call__(self, text, **kw):
        return {"input_ids": [self._vocab.get(w, 0)
                              for w in text.split()]}

    def decode(self, ids, **kw):
        inv = {v: k for k, v in self._vocab.items()}
        return " ".join(inv.get(i, "?") for i in ids)


def test_fix_pad_token_prefers_dedicated():
    tok = FakeTok(vocab={"</s>": 2, "<pad>": 3, "hello": 5, "world": 6})
    fix_pad_token(tok)
    assert tok.pad_token == "<pad>"


def test_fix_pad_token_falls_back_to_eos():
    tok = FakeTok()
    fix_pad_token(tok)
    assert tok.pad_token == "</s>"


def test_fix_pad_token_llama31_style():
    tok = FakeTok(vocab={"</s>": 2, "<|finetune_right_pad_id|>": 9,
                         "hello": 5, "world": 6})
    fix_pad_token(tok)
    assert tok.pad_token == "<|finetune_right_pad_id|>"


def test_check_tokenizer_flags_oversized_ids():
    class M:
        class cfg:
            vocab_size = 4

    problems = check_tokenizer(M(), FakeTok())
    assert any("vocab" in p for p in problems)


def test_check_tokenizer_healthy():
    class M:
        class cfg:
            vocab_size = 100

    assert check_tokenizer(M(), FakeTok()) == []


def test_validate_chat_template_catches_drop():
    class T:
        chat_template = "broken"

        def apply_chat_template(self, msgs, **kw):
            return "nothing here"

    assert "dropped" in validate_chat_template(T())


def test_fix_untrained_tokens(rng):
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_params

    cfg = ModelConfig(vocab_size=32, hidden_size=16, intermediate_size=32,
                      num_layers=1, num_heads=2, num_kv_heads=2)
    params = init_params(cfg, rng)
    params["embed"] = params["embed"].at[5].set(0.0)  # untrained row
    model = LanguageModel(cfg=cfg, params=params)
    fix_untrained_tokens(model, None)
    row = model.params["embed"][5]
    assert float(jnp.linalg.norm(row)) > 0  # now mean-initialized


def _tiny_slow_tokenizer(tmp_path):
    import json
    import string

    from transformers import GPT2Tokenizer

    vocab = {"<|endoftext|>": 0}
    toks = list(string.ascii_lowercase) + ["Ġ", "he", "ll", "o",
                                           "hell", "Ġw", "or", "ld"]
    for t in toks:
        if t not in vocab:
            vocab[t] = len(vocab)
    merges = ["h e", "l l", "he ll", "Ġ w", "o r"]
    d = str(tmp_path)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n" + "\n".join(merges) + "\n")
    return GPT2Tokenizer(os.path.join(d, "vocab.json"),
                         os.path.join(d, "merges.txt"),
                         unk_token="<|endoftext|>")


def test_add_new_tokens(rng, tmp_path):
    """reference: tokenizer_utils.py:35-46 add_new_tokens — grows the
    tokenizer + embedding/lm_head with mean / interpolated init."""
    pytest.importorskip("transformers")
    from unsloth_tpu.data.tokenizer_utils import (add_new_tokens,
                                                  mean_of_trained_tokens)
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_params

    tok = _tiny_slow_tokenizer(tmp_path)
    v0 = len(tok)
    cfg = ModelConfig(vocab_size=v0, hidden_size=16, intermediate_size=32,
                      num_layers=1, num_heads=2, num_kv_heads=2,
                      tie_word_embeddings=False)
    model = LanguageModel(cfg=cfg, params=init_params(cfg, rng),
                          tokenizer=tok)
    mean_e, mean_h = mean_of_trained_tokens(model)
    embed_before = np.asarray(model.params["embed"])

    add_new_tokens(model, tok, ["<REASON>", "<SQL>"], method="mean")
    assert len(tok) == v0 + 2
    assert model.cfg.vocab_size == v0 + 2
    assert model.params["embed"].shape[0] == v0 + 2
    assert model.params["lm_head"].shape[0] == v0 + 2
    # old rows intact, new rows = mean of trained rows
    np.testing.assert_allclose(np.asarray(model.params["embed"][:v0]),
                               embed_before, rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(model.params["embed"][v0]),
                               np.asarray(mean_e), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(model.params["lm_head"][v0 + 1]),
                               np.asarray(mean_h), rtol=1e-5, atol=1e-6)

    # duplicate add is refused
    with pytest.raises(ValueError):
        add_new_tokens(model, tok, ["<SQL>"])


def test_add_new_tokens_interpolation(rng, tmp_path):
    pytest.importorskip("transformers")
    from unsloth_tpu.data.tokenizer_utils import (add_new_tokens,
                                                  mean_of_trained_tokens)
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_params

    tok = _tiny_slow_tokenizer(tmp_path)
    v0 = len(tok)
    cfg = ModelConfig(vocab_size=v0, hidden_size=16, intermediate_size=32,
                      num_layers=1, num_heads=2, num_kv_heads=2,
                      tie_word_embeddings=True)
    model = LanguageModel(cfg=cfg, params=init_params(cfg, rng),
                          tokenizer=tok)
    mean_e, _ = mean_of_trained_tokens(model)
    sub_ids = tok("hello!", add_special_tokens=False)["input_ids"]
    embed = np.asarray(model.params["embed"], dtype=np.float32)
    expected = 0.75 * np.asarray(mean_e) \
        + 0.25 * embed[np.asarray(sub_ids)].mean(axis=0)

    add_new_tokens(model, tok, ["hello!"], method="interpolation",
                   interpolation=0.25)
    got = np.asarray(model.params["embed"][v0])
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# mapper
# ---------------------------------------------------------------------------

def test_strip_quant_suffix():
    assert strip_quant_suffix("x/y-bnb-4bit") == ("x/y", "-bnb-4bit")
    assert strip_quant_suffix("x/y-unsloth-bnb-4bit") == \
        ("x/y", "-unsloth-bnb-4bit")
    assert strip_quant_suffix("x/y") == ("x/y", None)


def test_get_model_name_redirects_unsloth_mirror():
    name, four_bit = get_model_name(
        "unsloth/Llama-3.1-8B-Instruct-bnb-4bit", load_in_4bit=False)
    assert name == "meta-llama/Llama-3.1-8B-Instruct"
    assert four_bit is True  # mirror implies 4-bit intent


def test_get_model_name_passthrough():
    name, four_bit = get_model_name("meta-llama/Llama-3.1-8B", True)
    assert name == "meta-llama/Llama-3.1-8B"
    assert four_bit is True


def test_search_models():
    out = search_models("qwen3")
    assert any("Qwen3-8B" in m for m in out)
    assert search_models("llama-3.2", family="llama")
    assert search_models("nonexistent-xyz") == []


def _fabricate_sp_model(path, pieces):
    """Write a minimal sentencepiece tokenizer.model proto."""
    from transformers.convert_slow_tokenizer import import_protobuf

    pb = import_protobuf()
    proto = pb.ModelProto()
    for text, ptype in pieces:
        p = proto.pieces.add()
        p.piece = text
        p.score = 0.0
        p.type = ptype
    proto.trainer_spec.model_type = 1  # unigram
    with open(path, "wb") as f:
        f.write(proto.SerializeToString())
    return pb


def test_rename_sentencepiece_pieces(tmp_path):
    """File-level piece renaming (reference: tokenizer_utils.py:347
    fix_sentencepiece_tokenizer proto surgery)."""
    from unsloth_tpu.data.tokenizer_utils import rename_sentencepiece_pieces

    mf = str(tmp_path / "tokenizer.model")
    pb = _fabricate_sp_model(mf, [("<unk>", 2), ("<s>", 3), ("hello", 1),
                                  ("world", 1)])
    n = rename_sentencepiece_pieces(mf, {"hello": "<|reserved|>",
                                         "missing": "x",
                                         "world": "<s>"})  # <s> exists
    assert n == 1
    proto = pb.ModelProto()
    proto.ParseFromString(open(mf, "rb").read())
    texts = [p.piece for p in proto.pieces]
    assert "<|reserved|>" in texts and "hello" not in texts
    assert texts.count("<s>") == 1  # collision skipped


def test_fix_sentencepiece_gguf(tmp_path):
    """GGUF prep (reference: tokenizer_utils.py:432): NORMAL-typed special
    tokens become CONTROL; missing added tokens appended."""
    import json

    from unsloth_tpu.data.tokenizer_utils import fix_sentencepiece_gguf

    d = str(tmp_path)
    mf = os.path.join(d, "tokenizer.model")
    pb = _fabricate_sp_model(mf, [
        ("<unk>", 2), ("<start_of_turn>", 1),   # wrongly NORMAL
        ("hi", 1)])
    with open(os.path.join(d, "special_tokens_map.json"), "w") as f:
        json.dump({"additional_special_tokens": ["<start_of_turn>"],
                   "eos_token": "<end_of_turn>"}, f)
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"added_tokens_decoder": {
            "100": {"content": "<end_of_turn>", "special": True},
            "101": {"content": "<extra>", "special": False}}}, f)
    changed = fix_sentencepiece_gguf(d)
    assert changed >= 3
    proto = pb.ModelProto()
    proto.ParseFromString(open(mf, "rb").read())
    by = {p.piece: p.type for p in proto.pieces}
    assert by["<start_of_turn>"] == 3        # retyped to CONTROL
    assert by["<end_of_turn>"] == 3          # appended as CONTROL
    assert by["<extra>"] == 4                # appended USER_DEFINED
    assert by["hi"] == 1                     # untouched


def test_convert_to_fast_tokenizer(tmp_path):
    """Slow GPT2-style tokenizer converts to fast with identical ids
    (reference: tokenizer_utils.py:141-262)."""
    import json

    transformers = pytest.importorskip("transformers")
    from transformers import GPT2Tokenizer

    # fabricate a tiny byte-level BPE vocab
    vocab = {"<|endoftext|>": 0}
    import string

    toks = list(string.ascii_lowercase) + ["Ġ", "he", "ll", "o",
                                           "hell", "Ġw", "or", "ld"]
    for t in toks:
        if t not in vocab:
            vocab[t] = len(vocab)
    merges = ["h e", "l l", "he ll", "Ġ w", "o r"]
    d = str(tmp_path)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n" + "\n".join(merges) + "\n")
    slow = GPT2Tokenizer(os.path.join(d, "vocab.json"),
                         os.path.join(d, "merges.txt"),
                         unk_token="<|endoftext|>")
    assert not slow.is_fast

    from unsloth_tpu.data.tokenizer_utils import (
        assert_same_tokenization, convert_to_fast_tokenizer)

    probes = ("hello", "hello world", "abc")
    fast = convert_to_fast_tokenizer(slow, texts=probes)
    assert fast.is_fast
    assert assert_same_tokenization(slow, fast,
                                    texts=("hello", "hello world", "abc"))


def test_add_new_tokens_rejects_packed_lm_head(rng, tmp_path):
    """ADVICE r3: a packed (quantized) lm_head must raise, not be silently
    skipped while embed/vocab_size still grow (head rows would be short of
    the new token ids)."""
    pytest.importorskip("transformers")
    from unsloth_tpu.data.tokenizer_utils import add_new_tokens
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_params
    from unsloth_tpu.ops.nf4 import quantize_nf4

    tok = _tiny_slow_tokenizer(tmp_path)
    v0 = len(tok)
    cfg = ModelConfig(vocab_size=v0, hidden_size=16, intermediate_size=32,
                      num_layers=1, num_heads=2, num_kv_heads=2,
                      tie_word_embeddings=False)
    params = init_params(cfg, rng)
    params["lm_head"] = quantize_nf4(params["lm_head"], block_size=16)
    model = LanguageModel(cfg=cfg, params=params, tokenizer=tok)
    with pytest.raises(ValueError, match="lm_head"):
        add_new_tokens(model, tok, ["<REASON>"])
    # nothing mutated
    assert model.cfg.vocab_size == v0
    assert len(tok) == v0
