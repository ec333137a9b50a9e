"""MoE grouped-GEMM parity tests (reference: kernels/moe/tests/
test_grouped_gemm.py compares the fused kernel against HF reference
blocks; here the oracle is the dense einsum implementation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.ops.moe import moe_mlp_dense, moe_mlp_grouped


def _setup(rng, n=32, d=64, f=32, e=4, k=2):
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    x = jax.random.normal(k1, (n, d), jnp.float32)
    experts = {
        "gate": jax.random.normal(k2, (e, f, d), jnp.float32) * 0.1,
        "up": jax.random.normal(k3, (e, f, d), jnp.float32) * 0.1,
        "down": jax.random.normal(k4, (e, d, f), jnp.float32) * 0.1,
    }
    router = jax.random.normal(k5, (n, e), jnp.float32)
    return x, router, experts, k


@pytest.mark.slow
@pytest.mark.parametrize("norm_topk", [False, True])
def test_grouped_matches_dense(rng, norm_topk):
    x, router, experts, k = _setup(rng)
    dense = moe_mlp_dense(x, router, experts, k, "silu", norm_topk)
    grouped = moe_mlp_grouped(x, router, experts, k, "silu", norm_topk,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(dense),
                               atol=2e-5, rtol=2e-4)


@pytest.mark.slow
def test_grouped_grad_matches_dense(rng):
    x, router, experts, k = _setup(rng, n=16)

    def loss_dense(x, experts):
        return jnp.sum(jnp.sin(moe_mlp_dense(x, router, experts, k, "silu")))

    def loss_grouped(x, experts):
        return jnp.sum(jnp.sin(moe_mlp_grouped(x, router, experts, k,
                                               "silu", interpret=True)))

    gx1, ge1 = jax.grad(loss_dense, argnums=(0, 1))(x, experts)
    gx2, ge2 = jax.grad(loss_grouped, argnums=(0, 1))(x, experts)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               atol=1e-4, rtol=1e-3)
    for key in experts:
        np.testing.assert_allclose(np.asarray(ge1[key]),
                                   np.asarray(ge2[key]),
                                   atol=1e-4, rtol=1e-3, err_msg=key)


def test_expert_imbalance(rng):
    """All tokens routed to one expert still works (extreme group sizes)."""
    x, router, experts, k = _setup(rng, n=16, e=4, k=1)
    router = jnp.full_like(router, -10.0).at[:, 2].set(10.0)
    dense = moe_mlp_dense(x, router, experts, 1, "silu")
    grouped = moe_mlp_grouped(x, router, experts, 1, "silu", interpret=True)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(dense),
                               atol=2e-5, rtol=2e-4)


def test_nf4_stacked_experts_round_trip(rng):
    """Stacked per-expert NF4 (MoE QLoRA): quantize/dequant error bound
    and storage ~0.56 B/param."""
    import jax.numpy as jnp

    from unsloth_tpu.ops.nf4 import (dequantize_nf4_stacked,
                                     quantize_nf4_stacked)

    w = jax.random.normal(rng, (4, 32, 128), jnp.float32) * 0.1
    q = quantize_nf4_stacked(w)
    back = dequantize_nf4_stacked(q, jnp.float32)
    assert back.shape == w.shape
    rel = float(jnp.abs(back - w).max() / jnp.abs(w).max())
    assert rel < 0.15, rel
    nbytes = q.packed.size + q.absmax.size * 4
    assert nbytes < w.size * 0.6


@pytest.mark.slow
def test_moe_qlora_trains(rng):
    """A MoE model with NF4-quantized experts trains (LoRA on attention;
    experts frozen NF4) — the gpt-oss MoE QLoRA shape (BASELINE.md:36)."""
    import jax.numpy as jnp
    import optax

    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.decoder import loss_fn
    from unsloth_tpu.models.params import (init_lora_tree, init_params,
                                           quantize_params)
    from unsloth_tpu.ops.nf4 import NF4Stacked

    cfg = ModelConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=64, num_experts=4,
                      num_experts_per_tok=2, moe_intermediate_size=128,
                      norm_topk_prob=True)
    params = quantize_params(init_params(cfg, rng, dtype=jnp.float32), cfg,
                             dtype=jnp.float32)
    assert isinstance(params["layers"][0]["experts"]["gate"], NF4Stacked)
    lora = init_lora_tree(cfg, rng, r=4, alpha=8)
    ids = jax.random.randint(rng, (2, 32), 0, cfg.vocab_size)
    batch = {"input_ids": ids, "labels": ids}
    tx = optax.adam(5e-3)
    opt = tx.init(lora)

    @jax.jit
    def step(lora, opt, params):
        loss, g = jax.value_and_grad(
            lambda l: loss_fn(params, l, batch, cfg, remat=True))(lora)
        upd, opt = tx.update(g, opt, lora)
        return optax.apply_updates(lora, upd), opt, loss

    losses = []
    for _ in range(12):
        lora, opt, loss = step(lora, opt, params)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.2, losses


@pytest.mark.parametrize("routing", ["softmax_topk", "llama4"])
def test_expert_loop_matches_dense(rng, routing):
    """The HF-style loop-over-experts baseline (bench's hf-equivalent,
    UNSLOTH_MOE_IMPL=eloop) is numerically the same layer."""
    from unsloth_tpu.ops.moe import moe_mlp_expert_loop

    x, router, experts, k = _setup(rng)
    if routing == "llama4":
        experts = dict(experts)
    dense = moe_mlp_dense(x, router, experts, k, "silu",
                          routing=routing)
    loop = moe_mlp_expert_loop(x, router, experts, k, "silu",
                               routing=routing)
    np.testing.assert_allclose(np.asarray(loop), np.asarray(dense),
                               atol=2e-5, rtol=2e-4)


def test_expert_loop_with_biases(rng):
    """gpt-oss per-expert biases apply inside the expert, before the
    routing weight — parity with the dense oracle."""
    from unsloth_tpu.ops.moe import moe_mlp_expert_loop

    x, router, experts, k = _setup(rng)
    keys = jax.random.split(rng, 3)
    e, f, d = experts["gate"].shape[0], experts["gate"].shape[1], \
        experts["down"].shape[1]
    experts = {**experts,
               "gate_bias": jax.random.normal(keys[0], (e, f)) * 0.1,
               "up_bias": jax.random.normal(keys[1], (e, f)) * 0.1,
               "down_bias": jax.random.normal(keys[2], (e, d)) * 0.1}
    dense = moe_mlp_dense(x, router, experts, k, "silu")
    loop = moe_mlp_expert_loop(x, router, experts, k, "silu")
    np.testing.assert_allclose(np.asarray(loop), np.asarray(dense),
                               atol=2e-5, rtol=2e-4)
