"""Synthetic data kit tests (reference: dataprep/synthetic.py drives vLLM;
here the native generate loop)."""

import jax
import pytest

from unsloth_tpu.data.synthetic import SyntheticConfig, SyntheticDataKit
from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_params

from tests.test_trainer_grpo import CharTokenizer


def test_parse_qa_pairs():
    text = "Q: What is X?\nA: X is a thing.\nQ2: And Y?\nA2: Y too.\nnoise"
    pairs = SyntheticDataKit.parse_qa_pairs(text)
    assert len(pairs) == 2
    assert pairs[0]["question"] == "What is X?"
    assert pairs[1]["answer"] == "Y too.\nnoise"


def test_chunking_overlap():
    kit = SyntheticDataKit.__new__(SyntheticDataKit)
    kit.config = SyntheticConfig(chunk_size=100, overlap=20, max_chunks=5)
    from unsloth_tpu.data.raw_text import TextPreprocessor

    kit.preprocessor = TextPreprocessor()
    chunks = kit.chunk_document("x" * 400)
    assert len(chunks) == 5
    assert all(len(c) <= 100 for c in chunks)


def test_generate_qa_end_to_end():
    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=1, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=512, eos_token_id=0)
    model = LanguageModel(cfg=cfg, params=init_params(
        cfg, jax.random.PRNGKey(0)), tokenizer=CharTokenizer())
    kit = SyntheticDataKit(model, config=SyntheticConfig(
        chunk_size=80, pairs_per_chunk=1, max_new_tokens=16, max_chunks=2))
    # random model won't emit Q:/A: format — assert the pipeline runs and
    # returns a (possibly empty) list of well-formed examples
    out = kit.generate_qa(["some document text " * 20])
    assert isinstance(out, list)
    for ex in out:
        assert set(ex["messages"][0]) == {"role", "content"}


def test_chunk_tokens_reference_math():
    """Token-budget chunking follows the reference's boundary math
    (reference: dataprep/synthetic.py:388-450): window = max_seq -
    2*gen - 128; overlapping linspace boundaries; whole-doc shortcut."""
    kit = SyntheticDataKit.__new__(SyntheticDataKit)
    kit.config = SyntheticConfig(max_new_tokens=16)
    kit.tokenizer = CharTokenizer()
    CharTokenizer.decode = staticmethod(
        lambda ids, **kw: "".join(chr(i) for i in ids))

    text = "ab" * 300                       # 600 tokens
    chunks = kit.chunk_tokens(text, max_seq_length=400,
                              max_generation_tokens=64, overlap=16)
    # window = 400 - 128 - 128 = 144; n = ceil((600-16)/128) = 5
    assert len(chunks) == 5
    assert all(len(c) <= 144 for c in chunks)
    # consecutive chunks overlap
    assert chunks[0][-10:] in chunks[1]
    # short doc -> single chunk
    one = kit.chunk_tokens("ab" * 10, max_seq_length=400,
                           max_generation_tokens=64)
    assert len(one) == 1 and len(one[0]) == 20
    # bad budgets raise
    with pytest.raises(RuntimeError):
        kit.chunk_tokens(text, max_seq_length=200,
                         max_generation_tokens=64, overlap=16)


def test_dedup_pairs():
    pairs = [{"question": "What is X?", "answer": "a"},
             {"question": "what is x", "answer": "b"},
             {"question": "And Y?", "answer": "c"}]
    out = SyntheticDataKit.dedup_pairs(pairs)
    assert len(out) == 2 and out[0]["answer"] == "a"


def test_run_pipeline_writes_layout(tmp_path):
    import json
    import os

    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=1, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=512, eos_token_id=0)
    model = LanguageModel(cfg=cfg, params=init_params(
        cfg, jax.random.PRNGKey(0)), tokenizer=CharTokenizer())
    kit = SyntheticDataKit(model, config=SyntheticConfig(
        chunk_size=80, pairs_per_chunk=1, max_new_tokens=8, max_chunks=1))
    out_dir = str(tmp_path / "data")
    final = kit.run_pipeline(["doc text " * 30], output_folder=out_dir)
    for sub in ("generated", "cleaned", "final"):
        assert os.path.exists(
            os.path.join(out_dir, sub, "qa_pairs.jsonl"))
    assert isinstance(final, list)
