"""Embedding fine-tuning tests (reference: sentence_transformer.py;
embedding fine-tuning headline README.md:219)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_lora_tree, init_params
from unsloth_tpu.models.sentence_transformer import (
    EmbeddingTrainerConfig, SentenceTransformerModel,
    SentenceTransformerTrainer, cosine_similarity_loss, mean_pool,
    multiple_negatives_ranking_loss)

from tests.test_trainer_grpo import CharTokenizer


@pytest.fixture()
def st_model():
    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=256)
    lm = LanguageModel(cfg=cfg, params=init_params(
        cfg, jax.random.PRNGKey(0)), tokenizer=CharTokenizer())
    lm.lora = init_lora_tree(cfg, jax.random.PRNGKey(1), r=4, alpha=8)
    return SentenceTransformerModel(lm=lm, pooling="mean")


@pytest.mark.slow
def test_encode_shapes_and_norm(st_model):
    embs = st_model.encode(["hello world", "hi", "something longer here"])
    assert embs.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=-1), 1.0,
                               atol=1e-5)


def test_mnrl_loss_prefers_diagonal():
    a = jnp.eye(4, 8)
    perfect = multiple_negatives_ranking_loss(a, a)
    shuffled = multiple_negatives_ranking_loss(a, jnp.roll(a, 1, axis=0))
    assert float(perfect) < float(shuffled)


def test_cosine_loss_zero_at_target():
    a = jnp.ones((2, 4))
    assert float(cosine_similarity_loss(a, a, jnp.ones(2))) < 1e-10


def test_mean_pool_ignores_padding():
    h = jnp.asarray(np.random.RandomState(0).randn(1, 4, 8))
    mask_full = jnp.ones((1, 4), jnp.int32)
    mask_half = jnp.asarray([[1, 1, 0, 0]], jnp.int32)
    p_half = mean_pool(h, mask_half)
    expect = jnp.mean(h[:, :2], axis=1)
    np.testing.assert_allclose(np.asarray(p_half), np.asarray(expect),
                               atol=1e-6)
    assert not np.allclose(np.asarray(mean_pool(h, mask_full)),
                           np.asarray(p_half))


@pytest.mark.slow
def test_bidirectional_changes_embeddings(st_model):
    e_bi = st_model.encode(["hello world"])
    st_model.bidirectional = False
    e_causal = st_model.encode(["hello world"])
    assert not np.allclose(e_bi, e_causal)


@pytest.mark.slow
def test_contrastive_training_separates_pairs(st_model):
    ds = [
        {"anchor": "aaaa bbbb", "positive": "aaab bbba"},
        {"anchor": "cccc dddd", "positive": "cccd dddc"},
        {"anchor": "eeee ffff", "positive": "eeef fffe"},
        {"anchor": "gggg hhhh", "positive": "gggh hhhg"},
    ]

    def paired_vs_random_margin():
        a = st_model.encode([ex["anchor"] for ex in ds])
        p = st_model.encode([ex["positive"] for ex in ds])
        sim = st_model.similarity(a, p)
        paired = np.mean(np.diag(sim))
        off = (np.sum(sim) - np.trace(sim)) / (sim.size - len(ds))
        return paired - off

    before = paired_vs_random_margin()
    trainer = SentenceTransformerTrainer(
        st_model, ds, EmbeddingTrainerConfig(
            learning_rate=5e-3, max_steps=30,
            per_device_train_batch_size=4, logging_steps=5))
    log = trainer.train()
    after = paired_vs_random_margin()
    assert log[-1]["loss"] < log[0]["loss"]
    assert after > before, (before, after)


def test_hard_negative_mnrl_and_triplet():
    from unsloth_tpu.models.sentence_transformer import triplet_loss

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    p = a + 0.01 * jnp.asarray(rng.randn(4, 8).astype(np.float32))
    far = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    # hard negatives = near-duplicates of the anchors raise the loss
    near = a + 0.02 * jnp.asarray(rng.randn(4, 8).astype(np.float32))
    l_far = multiple_negatives_ranking_loss(a, p, negatives=far)
    l_near = multiple_negatives_ranking_loss(a, p, negatives=near)
    l_none = multiple_negatives_ranking_loss(a, p)
    assert float(l_near) > float(l_far) >= float(l_none) * 0.99
    # triplet: zero when negative is far beyond the margin
    t_far = triplet_loss(a, a, a + 100.0, margin=5.0)
    t_near = triplet_loss(a, a + 1.0, a, margin=5.0)
    assert float(t_far) == 0.0 and float(t_near) > 0.0


def test_st_module_graph_roundtrip(st_model, tmp_path):
    from unsloth_tpu.models.sentence_transformer import (
        read_st_module_graph, write_st_module_graph)

    st_model.pooling = "cls"
    st_model.normalize = True
    st_model.max_seq_length = 128
    d = str(tmp_path)
    write_st_module_graph(st_model, d)
    graph = read_st_module_graph(d)
    assert graph == {"normalize": True, "pooling": "cls",
                     "max_seq_length": 128}


def test_st_save_pretrained_gguf(st_model, tmp_path):
    """Embedder GGUF export: tower exports as a causal LM, module graph
    rides alongside (reference: sentence_transformer.py:62-285)."""
    import os

    from unsloth_tpu.export.gguf_writer import read_gguf

    out = st_model.save_pretrained_gguf(str(tmp_path), "q8_0")
    assert os.path.exists(out)
    md, tensors, _ = read_gguf(out)
    assert md["general.architecture"] == "llama"
    assert os.path.exists(str(tmp_path / "modules.json"))


@pytest.mark.slow
def test_trainer_with_hard_negatives(st_model):
    args = EmbeddingTrainerConfig(max_steps=3,
                                  per_device_train_batch_size=2,
                                  learning_rate=1e-3, logging_steps=1)
    ds = [{"anchor": "hello there", "positive": "hi there",
           "negative": "completely different"},
          {"anchor": "good day", "positive": "nice day",
           "negative": "bad night"}]
    tr = SentenceTransformerTrainer(st_model, ds, args)
    log = tr.train()
    assert len(log) == 3 and np.isfinite(log[-1]["loss"])


@pytest.mark.slow
def test_bert_backed_st_from_pretrained(tmp_path):
    """A sentence-transformers BERT checkpoint (modules.json + pooling
    config) loads through FastSentenceTransformer and encodes."""
    torch = pytest.importorskip("torch")
    from transformers import AutoTokenizer, BertConfig, BertModel

    from unsloth_tpu.models.sentence_transformer import (
        FastSentenceTransformer)

    cfg = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    torch.manual_seed(0)
    model = BertModel(cfg)
    path = str(tmp_path / "st")
    model.save_pretrained(path, safe_serialization=True)
    import json
    import os

    with open(os.path.join(path, "modules.json"), "w") as f:
        json.dump([
            {"idx": 0, "name": "0", "path": "",
             "type": "sentence_transformers.models.Transformer"},
            {"idx": 1, "name": "1", "path": "1_Pooling",
             "type": "sentence_transformers.models.Pooling"},
            {"idx": 2, "name": "2", "path": "2_Normalize",
             "type": "sentence_transformers.models.Normalize"}], f)
    os.makedirs(os.path.join(path, "1_Pooling"), exist_ok=True)
    with open(os.path.join(path, "1_Pooling", "config.json"), "w") as f:
        json.dump({"pooling_mode_cls_token": True,
                   "pooling_mode_mean_tokens": False}, f)

    st, tok = FastSentenceTransformer.from_pretrained(path)
    assert st.pooling == "cls" and st.normalize

    class SmallTok:
        def __call__(self, text, **kw):
            return {"input_ids": [ord(c) % 100 for c in text]}

    st.encoder.tokenizer = SmallTok()
    emb = st.encode(["ab", "cdef"])
    assert emb.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0,
                               rtol=1e-5)
