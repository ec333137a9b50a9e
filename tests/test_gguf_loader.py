"""GGUF -> model loading (export/gguf_loader.py).

The reference serves GGUF artifacts via llama.cpp's llama-server
(reference: studio/backend/core/inference/llama_cpp.py); here a .gguf
loads straight back into the functional decoder, so these tests close
the loop: export -> load -> logit parity -> generate.
"""

import json
import os

import numpy as np
import pytest


def _make_bpe_tokenizer_json(path, corpus=None):
    """Train a tiny byte-level BPE and write tokenizer.json (+ the HF
    tokenizer_config files so AutoTokenizer can load the directory)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from tokenizers.trainers import BpeTrainer

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = BpeTrainer(
        vocab_size=300, special_tokens=["<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(
        corpus or ["hello world", "the quick brown fox", "pack my box",
                   "jumps over the lazy dog"] * 8, trainer)
    tok.save(os.path.join(path, "tokenizer.json"))
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "bos_token": "<s>", "eos_token": "</s>",
                   "chat_template": "{% for m in messages %}"
                                    "{{ m['content'] }}{% endfor %}"}, f)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    """Tiny llama checkpoint -> model -> f32 + q8_0 GGUF files."""
    from tests.helpers import TINY_LLAMA, make_hf_checkpoint
    from unsloth_tpu.export.gguf import save_to_gguf
    from unsloth_tpu.models.loader import FastLanguageModel

    tmp = tmp_path_factory.mktemp("gguf_loader")
    ckpt = str(tmp / "m")
    cfg = dict(TINY_LLAMA)
    # model vocab must cover the byte-level BPE vocab (256 alphabet +
    # specials + merges); extra rows become [PADi] tokens in the GGUF
    cfg["vocab_size"] = 320
    cfg["bos_token_id"] = 0   # trained specials: <s>=0, </s>=1
    cfg["eos_token_id"] = 1
    make_hf_checkpoint(ckpt, cfg)
    _make_bpe_tokenizer_json(ckpt)
    model, tokenizer = FastLanguageModel.from_pretrained(
        ckpt, load_in_4bit=False, dtype="float32")
    f32 = save_to_gguf(model, str(tmp / "model-f32.gguf"),
                       quantization_method="f32")
    q8 = save_to_gguf(model, str(tmp / "model-q8.gguf"),
                      quantization_method="q8_0")
    return model, tokenizer, f32, q8


@pytest.mark.slow
def test_f32_round_trip_logits_exact(exported):
    import jax.numpy as jnp

    from unsloth_tpu.export.gguf_loader import load_gguf

    model, _, f32, _ = exported
    loaded, _ = load_gguf(f32, dtype=jnp.float32)
    assert loaded.cfg.num_layers == model.cfg.num_layers
    assert loaded.cfg.hidden_size == model.cfg.hidden_size
    assert loaded.cfg.num_kv_heads == model.cfg.num_kv_heads
    assert loaded.cfg.tie_word_embeddings == model.cfg.tie_word_embeddings

    ids = np.arange(12, dtype=np.int32)[None] % 100
    ref = np.asarray(model.logits(jnp.asarray(ids)), np.float32)
    got = np.asarray(loaded.logits(jnp.asarray(ids)), np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_q8_round_trip_logits_close(exported):
    import jax.numpy as jnp

    from unsloth_tpu.export.gguf_loader import load_gguf

    model, _, _, q8 = exported
    loaded, _ = load_gguf(q8, dtype=jnp.float32)
    ids = np.arange(12, dtype=np.int32)[None] % 100
    ref = np.asarray(model.logits(jnp.asarray(ids)), np.float32)
    got = np.asarray(loaded.logits(jnp.asarray(ids)), np.float32)
    # q8_0 weight error ~0.4% of amax per block; logits track closely
    assert np.mean(np.abs(got - ref)) < 0.05 * (np.mean(np.abs(ref)) + 1)


def test_facade_routes_gguf_and_generates(exported):
    from unsloth_tpu.models.loader import FastLanguageModel

    _, _, f32, _ = exported
    model, tok = FastLanguageModel.from_pretrained(
        f32, load_in_4bit=False, dtype="float32")
    out = model.generate(["hello world"], max_new_tokens=4)
    assert isinstance(out, list) and len(out) == 1


@pytest.mark.slow
def test_nf4_requantize_on_load(exported):
    """load_in_4bit=True re-quantizes 2-D projections to NF4 pytrees."""
    import jax.numpy as jnp

    from unsloth_tpu.export.gguf_loader import load_gguf
    from unsloth_tpu.ops.nf4 import NF4Tensor

    _, _, f32, _ = exported
    loaded, _ = load_gguf(f32, dtype=jnp.bfloat16, load_in_4bit=True)
    layer = loaded.params["layers"][0]
    assert isinstance(layer["q"], NF4Tensor)
    ids = np.arange(8, dtype=np.int32)[None] % 100
    logits = np.asarray(loaded.logits(jnp.asarray(ids)), np.float32)
    assert np.all(np.isfinite(logits))


def test_tokenizer_rebuilt_from_gguf(exported):
    from unsloth_tpu.export.gguf_loader import load_gguf

    model, tokenizer, f32, _ = exported
    _, rebuilt = load_gguf(f32)
    assert rebuilt is not None
    for text in ("hello world", "the quick brown fox", "pack my box"):
        assert rebuilt.encode(text, add_special_tokens=False) == \
            tokenizer.encode(text, add_special_tokens=False), text
        assert rebuilt.decode(
            rebuilt.encode(text, add_special_tokens=False)) == text
    assert rebuilt.eos_token == tokenizer.eos_token
    assert rebuilt.chat_template == tokenizer.chat_template


@pytest.mark.slow
def test_metadata_to_config_knobs(tmp_path):
    """Windowed/softcapped/yarn metadata survives the round trip."""
    import jax.numpy as jnp

    from tests.helpers import TINY_LLAMA, make_hf_checkpoint
    from unsloth_tpu.export.gguf import save_to_gguf
    from unsloth_tpu.export.gguf_loader import load_gguf
    from unsloth_tpu.models.loader import FastLanguageModel

    ckpt = str(tmp_path / "m")
    cfg = dict(TINY_LLAMA)
    cfg["model_type"] = "qwen2"
    cfg["sliding_window"] = 64
    cfg["use_sliding_window"] = True
    cfg["attention_bias"] = True
    cfg["rope_scaling"] = {"rope_type": "yarn", "factor": 2.0,
                           "original_max_position_embeddings": 64}
    make_hf_checkpoint(ckpt, cfg)
    model, _ = FastLanguageModel.from_pretrained(ckpt, load_in_4bit=False,
                                                 dtype="float32")
    path = save_to_gguf(model, str(tmp_path / "m.gguf"),
                        quantization_method="f16")
    loaded, _ = load_gguf(path, dtype=jnp.float32)
    assert loaded.cfg.sliding_window == 64
    assert loaded.cfg.rope_scaling.rope_type == "yarn"
    assert loaded.cfg.rope_scaling.factor == 2.0
    assert "q_bias" in loaded.params["layers"][0]
    ids = np.arange(10, dtype=np.int32)[None] % 100
    ref = np.asarray(model.logits(jnp.asarray(ids)), np.float32)
    got = np.asarray(loaded.logits(jnp.asarray(ids)), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


@pytest.mark.slow
def test_moe_gguf_round_trip(tmp_path):
    """qwen3-moe export/load: router + stacked expert tensors under
    llama.cpp MoE naming (ffn_gate_inp / ffn_*_exps), expert_count keys
    (reference exports MoE GGUFs via llama-quantize, save.py:1856-2250)."""
    import jax
    import jax.numpy as jnp

    from unsloth_tpu.export.gguf import save_to_gguf
    from unsloth_tpu.export.gguf_loader import load_gguf
    from unsloth_tpu.export.gguf_writer import read_gguf
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_params

    cfg = ModelConfig(model_type="qwen3_moe", vocab_size=128,
                      hidden_size=32, intermediate_size=64, num_layers=2,
                      num_heads=2, num_kv_heads=2, qk_norm=True,
                      num_experts=4, num_experts_per_tok=2,
                      moe_intermediate_size=16, norm_topk_prob=True,
                      max_position_embeddings=64)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    model = LanguageModel(cfg=cfg, params=params)

    path = save_to_gguf(model, str(tmp_path / "moe.gguf"),
                        quantization_method="f32")
    md, tensors, _ = read_gguf(path)
    assert md["general.architecture"] == "qwen3moe"
    assert md["qwen3moe.expert_count"] == 4
    assert md["qwen3moe.expert_used_count"] == 2
    assert md["qwen3moe.expert_feed_forward_length"] == 16
    names = {t["name"] for t in tensors}
    assert "blk.0.ffn_gate_inp.weight" in names
    assert "blk.1.ffn_down_exps.weight" in names
    assert "blk.0.ffn_gate.weight" not in names
    shapes = {t["name"]: t["shape"] for t in tensors}
    assert shapes["blk.0.ffn_gate_exps.weight"] == (4, 16, 32)
    assert shapes["blk.0.ffn_down_exps.weight"] == (4, 32, 16)

    loaded, _ = load_gguf(path, dtype=jnp.float32)
    assert loaded.cfg.num_experts == 4
    assert loaded.cfg.num_experts_per_tok == 2
    assert loaded.cfg.moe_intermediate_size == 16
    ids = np.arange(10, dtype=np.int32)[None] % 100
    ref = np.asarray(model.logits(jnp.asarray(ids)), np.float32)
    got = np.asarray(loaded.logits(jnp.asarray(ids)), np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_mixtral_gguf_round_trip(tmp_path):
    """Mixtral exports under the llama arch with expert_count metadata
    (llama.cpp's mixtral convention); the loader detects the MoE keys."""
    import jax
    import jax.numpy as jnp

    from unsloth_tpu.export.gguf import save_to_gguf
    from unsloth_tpu.export.gguf_loader import load_gguf
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_params

    cfg = ModelConfig(model_type="mixtral", vocab_size=128,
                      hidden_size=32, intermediate_size=64, num_layers=2,
                      num_heads=2, num_kv_heads=2, num_experts=4,
                      num_experts_per_tok=2, norm_topk_prob=True,
                      max_position_embeddings=64)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    model = LanguageModel(cfg=cfg, params=params)
    path = save_to_gguf(model, str(tmp_path / "mx.gguf"),
                        quantization_method="f32")
    loaded, _ = load_gguf(path, dtype=jnp.float32)
    assert loaded.cfg.model_type == "mixtral"
    assert loaded.cfg.num_experts == 4
    ids = np.arange(10, dtype=np.int32)[None] % 100
    ref = np.asarray(model.logits(jnp.asarray(ids)), np.float32)
    got = np.asarray(loaded.logits(jnp.asarray(ids)), np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
