"""RMSNorm / LayerNorm parity tests (reference: kernels/rms_layernorm.py
in-file test suite :301-342 compares Triton vs HF module; here we compare
the fused op — including its custom VJP — against the jnp reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.ops.rms_norm import rms_norm, rms_norm_ref, layer_norm_ref


@pytest.mark.parametrize("gemma", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_rms_norm_forward(rng, gemma, dtype):
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (4, 37, 256), dtype) * 3.0
    w = jax.random.normal(k2, (256,), dtype) * 0.1 + 1.0
    out = rms_norm(x, w, 1e-6, gemma)
    ref = rms_norm_ref(x, w, 1e-6, gemma)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol, rtol=tol)


@pytest.mark.parametrize("gemma", [False, True])
def test_rms_norm_grad_matches_autodiff(rng, gemma):
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (8, 256), jnp.float32)
    w = jax.random.normal(k2, (256,), jnp.float32) * 0.1 + 1.0

    def f_fused(x, w):
        return jnp.sum(jnp.sin(rms_norm(x, w, 1e-6, gemma)))

    def f_ref(x, w):
        return jnp.sum(jnp.sin(rms_norm_ref(x, w, 1e-6, gemma)))

    gx1, gw1 = jax.grad(f_fused, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               atol=1e-5, rtol=1e-5)


def test_rms_norm_fp32_stats_in_bf16():
    # bf16 inputs with large magnitude: fp32 statistics keep the result sane
    x = (jnp.ones((2, 128), jnp.bfloat16) * 100.0)
    w = jnp.ones((128,), jnp.bfloat16)
    out = rms_norm(x, w, 1e-6, False)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.ones((2, 128), np.float32), atol=1e-2)


def test_layer_norm_ref(rng):
    x = jax.random.normal(rng, (4, 64), jnp.float32)
    w = jnp.ones((64,))
    b = jnp.zeros((64,))
    out = layer_norm_ref(x, w, b)
    np.testing.assert_allclose(np.mean(np.asarray(out), -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.std(np.asarray(out), -1), 1.0, atol=1e-2)
