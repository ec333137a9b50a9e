"""Fused NF4 grouped-matmul parity (interpret mode on CPU; the same
kernel runs compiled on TPU). Oracle: dequantize + per-group dense
matmul, including the autodiff backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.ops.nf4 import dequantize_nf4_stacked, quantize_nf4_stacked
from unsloth_tpu.ops.nf4_gmm import (_nf4_gmm_bwd_impl, _nf4_gmm_fwd_impl,
                                     nf4_gmm, nf4_gmm_ref)


def _make(e=4, n=320, k=256, m=50, seed=0):
    kq, kx, kg = jax.random.split(jax.random.PRNGKey(seed), 3)
    w = jax.random.normal(kq, (e, n, k), jnp.float32) * 0.1
    q = quantize_nf4_stacked(w, block_size=64, dtype=jnp.float32)
    x = jax.random.normal(kx, (m, k), jnp.float32)
    # random group sizes summing to m (some empty)
    cuts = np.sort(np.asarray(
        jax.random.randint(kg, (e - 1,), 0, m + 1)))
    sizes = np.diff(np.concatenate([[0], cuts, [m]])).astype(np.int32)
    return q, x, jnp.asarray(sizes)


@pytest.mark.parametrize("shape", [(4, 320, 256, 50), (3, 128, 384, 17),
                                   (2, 256, 128, 200)])
@pytest.mark.slow
def test_fwd_matches_ref(shape):
    e, n, k, m = shape
    q, x, sizes = _make(e, n, k, m, seed=e)
    got = _nf4_gmm_fwd_impl(x, q, sizes, interpret=True)
    want = nf4_gmm_ref(x, q, sizes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_bwd_matches_dense_autodiff():
    q, x, sizes = _make()
    w = dequantize_nf4_stacked(q, jnp.float32)

    def dense_loss(x_):
        y = nf4_gmm_ref(x_, q, sizes)
        return jnp.sum(jnp.sin(y))

    # cotangent from the same loss, pushed through the fused bwd kernel
    y = _nf4_gmm_fwd_impl(x, q, sizes, interpret=True)
    g = jnp.cos(y)
    dx = _nf4_gmm_bwd_impl(g, q, sizes, interpret=True)
    want = jax.grad(dense_loss)(x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
    del w


@pytest.mark.slow
def test_custom_vjp_wiring():
    q, x, sizes = _make(e=2, n=128, k=128, m=24, seed=7)

    def loss(x_):
        return jnp.sum(nf4_gmm(x_, q, sizes) ** 2)

    # interpret mode comes from backend detection (CPU in tests)
    val, grad = jax.value_and_grad(loss)(x)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).max()) > 0


@pytest.mark.slow
def test_fwd_bias_epilogue():
    """Per-expert bias added in the kernel's store epilogue equals
    dequantize + matmul + bias[expert] per row."""
    import jax.numpy as jnp

    from unsloth_tpu.ops.nf4 import dequantize_nf4_stacked
    from unsloth_tpu.ops.nf4_gmm import nf4_gmm

    q, lhs, gs = _make()
    e, n, k = q.shape
    bias = jax.random.normal(jax.random.PRNGKey(5), (e, n),
                             jnp.float32) * 0.5
    out = nf4_gmm(lhs, q, gs, bias=bias)
    w = dequantize_nf4_stacked(q, jnp.float32)
    ends = jnp.cumsum(gs)
    starts = ends - gs
    row = jnp.arange(lhs.shape[0])
    want = jnp.zeros((lhs.shape[0], n), jnp.float32)
    for g in range(e):
        mask = (row >= starts[g]) & (row < ends[g])
        y = lhs.astype(jnp.float32) @ w[g].T + bias[g][None, :]
        want = jnp.where(mask[:, None], y, want)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(want.astype(lhs.dtype)),
                               atol=2e-2, rtol=2e-2)

    # grads still flow to lhs only, unaffected by the bias term
    g1 = jax.grad(lambda x: jnp.sum(
        nf4_gmm(x, q, gs, bias=bias).astype(jnp.float32)))(lhs)
    g2 = jax.grad(lambda x: jnp.sum(
        nf4_gmm(x, q, gs).astype(jnp.float32)))(lhs)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5)
