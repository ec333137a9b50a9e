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


def test_bidirectional_changes_embeddings(st_model):
    e_bi = st_model.encode(["hello world"])
    st_model.bidirectional = False
    e_causal = st_model.encode(["hello world"])
    assert not np.allclose(e_bi, e_causal)


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
