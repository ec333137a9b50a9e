"""Decoder archetype tests: shapes, causality, LoRA plumbing, QLoRA,
loss paths (fused vs unfused), and config-knob coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.decoder import forward, logits_fn, loss_fn
from unsloth_tpu.models.params import (init_lora_tree, init_params,
                                       quantize_params)


def _batch(rng, cfg, b=2, t=16):
    k1, k2 = jax.random.split(rng)
    ids = jax.random.randint(k1, (b, t), 0, cfg.vocab_size)
    labels = jax.random.randint(k2, (b, t), 0, cfg.vocab_size)
    return {"input_ids": ids, "labels": labels}


def test_forward_shapes(rng, tiny_config):
    params = init_params(tiny_config, rng)
    batch = _batch(rng, tiny_config)
    h = forward(params, None, batch["input_ids"], tiny_config, remat=False)
    assert h.shape == (2, 16, tiny_config.hidden_size)
    logits = logits_fn(params, None, batch["input_ids"], tiny_config,
                       remat=False)
    assert logits.shape == (2, 16, tiny_config.vocab_size)


def test_causality(rng, tiny_config):
    params = init_params(tiny_config, rng)
    ids = jax.random.randint(rng, (1, 16), 0, tiny_config.vocab_size)
    h1 = forward(params, None, ids, tiny_config, remat=False)
    ids2 = ids.at[0, -1].set((ids[0, -1] + 1) % tiny_config.vocab_size)
    h2 = forward(params, None, ids2, tiny_config, remat=False)
    np.testing.assert_allclose(np.asarray(h1[:, :-1]), np.asarray(h2[:, :-1]),
                               atol=1e-5)


@pytest.mark.slow
def test_loss_fused_matches_unfused(rng, tiny_config):
    params = init_params(tiny_config, rng)
    batch = _batch(rng, tiny_config)
    l1 = loss_fn(params, None, batch, tiny_config, fused_ce=True, remat=False,
                 chunk_size=8)
    l2 = loss_fn(params, None, batch, tiny_config, fused_ce=False, remat=False)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_lora_zero_init_is_identity(rng, tiny_config):
    params = init_params(tiny_config, rng)
    lora = init_lora_tree(tiny_config, rng, r=4, alpha=8)
    ids = jax.random.randint(rng, (1, 8), 0, tiny_config.vocab_size)
    h_base = forward(params, None, ids, tiny_config, remat=False)
    h_lora = forward(params, lora, ids, tiny_config, remat=False)
    np.testing.assert_allclose(np.asarray(h_base), np.asarray(h_lora),
                               atol=1e-6)


@pytest.mark.slow
def test_lora_gradients_flow(rng, tiny_config):
    params = init_params(tiny_config, rng)
    lora = init_lora_tree(tiny_config, rng, r=4, alpha=8)
    batch = _batch(rng, tiny_config)

    def f(lora):
        return loss_fn(params, lora, batch, tiny_config, remat=False)

    grads = jax.grad(f)(lora)
    ga = grads["layers"][0]["q"].a
    gb = grads["layers"][0]["q"].b
    # B is zero-init so dA = s·Bᵀ(...) = 0 at step 0; dB must be nonzero.
    assert float(jnp.max(jnp.abs(gb))) > 0
    assert ga.shape == lora["layers"][0]["q"].a.shape


def test_qlora_forward_close_to_dense(rng, tiny_config):
    params = init_params(tiny_config, rng, dtype=jnp.float32)
    qparams = quantize_params(params, tiny_config, dtype=jnp.float32)
    ids = jax.random.randint(rng, (1, 8), 0, tiny_config.vocab_size)
    h_dense = forward(params, None, ids, tiny_config, remat=False)
    h_q = forward(qparams, None, ids, tiny_config, remat=False)
    # NF4 introduces bounded error; direction should match closely
    cos = float(jnp.sum(h_dense * h_q) /
                (jnp.linalg.norm(h_dense) * jnp.linalg.norm(h_q)))
    assert cos > 0.98, cos


def test_qlora_train_step_runs(rng, tiny_config):
    params = quantize_params(init_params(tiny_config, rng), tiny_config,
                             dtype=jnp.float32)
    lora = init_lora_tree(tiny_config, rng, r=4, alpha=8)
    batch = _batch(rng, tiny_config)

    @jax.jit
    def step(lora):
        return jax.value_and_grad(
            lambda l: loss_fn(params, l, batch, tiny_config, remat=True))(lora)

    loss, grads = step(lora)
    assert jnp.isfinite(loss)
    gb = grads["layers"][0]["v"].b
    assert float(jnp.max(jnp.abs(gb))) > 0


def test_remat_matches_no_remat(rng, tiny_config):
    params = init_params(tiny_config, rng)
    lora = init_lora_tree(tiny_config, rng, r=4, alpha=8)
    batch = _batch(rng, tiny_config)
    l1 = loss_fn(params, lora, batch, tiny_config, remat=False)
    l2 = loss_fn(params, lora, batch, tiny_config, remat=True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


@pytest.mark.parametrize("model_type,knobs", [
    ("qwen3", dict(qk_norm=True)),
    ("gemma", dict(gemma_norm=True, embed_scale=8.0, hidden_act="gelu_tanh",
                   tie_word_embeddings=True)),
    ("gemma2", dict(gemma_norm=True, embed_scale=8.0, use_post_norms=True,
                    attn_softcap=50.0, final_softcap=30.0,
                    sliding_window=8, layer_pattern=("sliding", "global"),
                    tie_word_embeddings=True, hidden_act="gelu_tanh")),
    ("cohere", dict(norm_type="layernorm", logit_scale=0.0625,
                    tie_word_embeddings=True)),
])
def test_arch_variants_run(rng, model_type, knobs):
    cfg = ModelConfig(model_type=model_type, vocab_size=128, hidden_size=32,
                      intermediate_size=64, num_layers=2, num_heads=2,
                      num_kv_heads=2, max_position_embeddings=64, **knobs)
    params = init_params(cfg, rng)
    batch = {"input_ids": jax.random.randint(rng, (1, 8), 0, 128),
             "labels": jax.random.randint(rng, (1, 8), 0, 128)}
    loss = loss_fn(params, None, batch, cfg, remat=False)
    assert jnp.isfinite(loss), model_type


def test_moe_variant_runs(rng):
    cfg = ModelConfig(model_type="qwen3_moe", vocab_size=128, hidden_size=32,
                      intermediate_size=64, num_layers=2, num_heads=2,
                      num_kv_heads=2, qk_norm=True, num_experts=4,
                      num_experts_per_tok=2, moe_intermediate_size=16,
                      norm_topk_prob=True, max_position_embeddings=64)
    params = init_params(cfg, rng)
    batch = {"input_ids": jax.random.randint(rng, (1, 8), 0, 128),
             "labels": jax.random.randint(rng, (1, 8), 0, 128)}
    loss = loss_fn(params, None, batch, cfg, remat=False)
    assert jnp.isfinite(loss)


def test_packed_segments_match_separate(rng, tiny_config):
    """Packing two sequences with segment ids == running them separately."""
    params = init_params(tiny_config, rng)
    k1, k2 = jax.random.split(rng)
    a = jax.random.randint(k1, (1, 8), 0, tiny_config.vocab_size)
    b = jax.random.randint(k2, (1, 8), 0, tiny_config.vocab_size)
    packed_ids = jnp.concatenate([a, b], axis=1)
    seg = jnp.array([[0] * 8 + [1] * 8], jnp.int32)
    pos = jnp.array([list(range(8)) * 2], jnp.int32)
    h_packed = forward(params, None, packed_ids, tiny_config,
                       segment_ids=seg, positions=pos, remat=False)
    h_a = forward(params, None, a, tiny_config, remat=False)
    h_b = forward(params, None, b, tiny_config, remat=False)
    np.testing.assert_allclose(np.asarray(h_packed[:, :8]), np.asarray(h_a),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_packed[:, 8:]), np.asarray(h_b),
                               atol=2e-5)


@pytest.mark.slow
def test_tiled_mlp_matches_dense(rng, tiny_config, monkeypatch):
    """UNSLOTH_TILED_MLP chunking must be numerically identical."""
    from unsloth_tpu.models.decoder import forward as fwd

    params = init_params(tiny_config, rng)
    ids = jax.random.randint(rng, (2, 32), 0, tiny_config.vocab_size)
    h_dense = fwd(params, None, ids, tiny_config, remat=False)
    monkeypatch.setenv("UNSLOTH_TILED_MLP", "chunk:16")
    h_tiled = fwd(params, None, ids, tiny_config, remat=False)
    np.testing.assert_allclose(np.asarray(h_dense), np.asarray(h_tiled),
                               atol=1e-5)


def test_moe_remat_policies_match(rng):
    """save_moe_out / save_attn_moe change only WHAT backward saves, not
    the math: grads must match full remat exactly."""
    cfg = ModelConfig(model_type="qwen3_moe", vocab_size=128, hidden_size=32,
                      intermediate_size=64, num_layers=2, num_heads=2,
                      num_kv_heads=2, qk_norm=True, num_experts=4,
                      num_experts_per_tok=2, moe_intermediate_size=16,
                      norm_topk_prob=True, max_position_embeddings=64)
    params = init_params(cfg, rng)
    from unsloth_tpu.models.params import init_lora_tree
    lora = init_lora_tree(cfg, rng, r=2, alpha=2)
    batch = {"input_ids": jax.random.randint(rng, (1, 8), 0, 128),
             "labels": jax.random.randint(rng, (1, 8), 0, 128)}

    def grads(policy):
        return jax.grad(lambda l: loss_fn(params, l, batch, cfg, remat=True,
                                          remat_policy=policy))(lora)

    g_none = grads(None)
    for policy in ("save_moe_out", "save_attn_moe"):
        g_pol = grads(policy)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6), g_none, g_pol)
