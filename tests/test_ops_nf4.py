"""NF4 quantization tests (reference: kernels/utils.py:567-679 double
dequant; tests mirror the reference's kernel parity strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.ops.nf4 import (NF4_CODE, NF4Tensor, dequantize_nf4,
                                 nf4_matmul_ref, quantize_nf4)


def test_codebook_values_roundtrip():
    """Weights exactly on codebook values quantize losslessly."""
    w = jnp.asarray(np.tile(NF4_CODE, 8).reshape(2, 64), jnp.float32)
    q = quantize_nf4(w, block_size=64, double_quant=False)
    wd = dequantize_nf4(q, jnp.float32)
    np.testing.assert_allclose(np.asarray(wd), np.asarray(w), atol=1e-6)


@pytest.mark.parametrize("double_quant", [False, True])
def test_quant_error_small(rng, double_quant):
    w = jax.random.normal(rng, (128, 256), jnp.float32) * 0.05
    q = quantize_nf4(w, double_quant=double_quant)
    wd = dequantize_nf4(q, jnp.float32)
    rel = float(jnp.sqrt(jnp.mean((w - wd) ** 2)) / jnp.sqrt(jnp.mean(w ** 2)))
    # NF4 typical relative RMS error ~0.07-0.12 for gaussian weights
    assert rel < 0.15, rel


def test_double_quant_close_to_plain(rng):
    w = jax.random.normal(rng, (64, 128), jnp.float32)
    q1 = quantize_nf4(w, double_quant=False)
    q2 = quantize_nf4(w, double_quant=True)
    w1 = dequantize_nf4(q1, jnp.float32)
    w2 = dequantize_nf4(q2, jnp.float32)
    # absmax int8 quantization adds <1% extra error
    extra = float(jnp.max(jnp.abs(w1 - w2)))
    assert extra < 0.02 * float(jnp.max(jnp.abs(w))), extra


@pytest.mark.slow
def test_memory_footprint(rng):
    w = jax.random.normal(rng, (1024, 1024), jnp.float32)
    q = quantize_nf4(w, double_quant=True)
    # ~0.53 bytes/param with double quant (0.5 + absmax overhead)
    assert q.nbytes < 0.6 * w.size


def test_nf4_matmul_matches_dequant(rng):
    k1, k2 = jax.random.split(rng)
    w = jax.random.normal(k1, (64, 128), jnp.float32) * 0.1
    x = jax.random.normal(k2, (4, 128), jnp.float32)
    q = quantize_nf4(w, double_quant=True, dtype=jnp.float32)
    y = nf4_matmul_ref(x, q)
    wd = dequantize_nf4(q, jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ wd.T),
                               atol=1e-4, rtol=1e-4)


def test_nf4_is_pytree(rng):
    w = jax.random.normal(rng, (64, 128), jnp.float32)
    q = quantize_nf4(w)
    leaves = jax.tree_util.tree_leaves(q)
    assert len(leaves) == 4
    q2 = jax.tree_util.tree_map(lambda x: x, q)
    assert isinstance(q2, NF4Tensor)
    assert q2.shape == (64, 128)


def test_nf4_under_jit(rng):
    k1, k2 = jax.random.split(rng)
    w = jax.random.normal(k1, (64, 128), jnp.float32) * 0.1
    x = jax.random.normal(k2, (4, 128), jnp.float32)
    q = quantize_nf4(w, dtype=jnp.float32)
    y1 = nf4_matmul_ref(x, q)
    y2 = jax.jit(nf4_matmul_ref)(x, q)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
