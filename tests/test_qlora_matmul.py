"""Fused NF4-matmul kernel parity tests (interpret mode on CPU; the TPU
run is exercised by bench.py). Oracle: dequantize-then-matmul."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.ops.nf4 import dequantize_nf4, quantize_nf4
from unsloth_tpu.ops.qlora_matmul import (_bwd_pallas, _fwd_pallas,
                                          nf4_matmul)


@pytest.fixture(scope="module")
def q_and_w():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (256, 512), jnp.float32) * 0.05
    q = quantize_nf4(w, double_quant=True, dtype=jnp.float32)
    wd = dequantize_nf4(q, jnp.float32)
    return q, wd


def test_fwd_kernel_matches_dequant_matmul(q_and_w, rng):
    q, wd = q_and_w
    x = jax.random.normal(rng, (48, 512), jnp.float32)
    y = _fwd_pallas(x, q, bm=16, bn=128, bk=128, interpret=True)
    ref = x @ wd.T
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_bwd_kernel_matches_dequant_matmul(q_and_w, rng):
    q, wd = q_and_w
    g = jax.random.normal(rng, (48, 256), jnp.float32)
    dx = _bwd_pallas(g, q, bm=16, bn=128, bk=128, interpret=True)
    ref = g @ wd
    np.testing.assert_allclose(np.asarray(dx), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_custom_vjp_grad(q_and_w, rng):
    q, wd = q_and_w
    x = jax.random.normal(rng, (16, 512), jnp.float32)

    # interpret mode is selected automatically off-TPU
    def f(x):
        return jnp.sum(jnp.sin(nf4_matmul(x, q)))

    def ref(x):
        return jnp.sum(jnp.sin(x @ wd.T))

    np.testing.assert_allclose(float(f(x)), float(ref(x)), rtol=1e-4)
    g1 = jax.grad(f)(x)
    g2 = jax.grad(ref)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-3, rtol=1e-3)


def test_batched_leading_dims(q_and_w, rng):
    q, wd = q_and_w
    x = jax.random.normal(rng, (2, 8, 512), jnp.float32)
    y = nf4_matmul(x, q)
    assert y.shape == (2, 8, 256)
    ref = jnp.einsum("btd,od->bto", x, wd)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_row_padding(q_and_w, rng):
    """m not a multiple of the row block."""
    q, wd = q_and_w
    x = jax.random.normal(rng, (7, 512), jnp.float32)
    y = _fwd_pallas(x, q, bm=16, bn=128, bk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ wd.T),
                               atol=1e-3, rtol=1e-3)
