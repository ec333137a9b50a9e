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


@pytest.mark.parametrize("norm_topk", [False, True])
def test_grouped_matches_dense(rng, norm_topk):
    x, router, experts, k = _setup(rng)
    dense = moe_mlp_dense(x, router, experts, k, "silu", norm_topk)
    grouped = moe_mlp_grouped(x, router, experts, k, "silu", norm_topk,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(grouped), np.asarray(dense),
                               atol=2e-5, rtol=2e-4)


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
