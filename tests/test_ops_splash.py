"""Splash-attention path parity vs the reference implementation
(interpret mode on CPU; same role as the reference's flex-attention vs
eager checks, kernels/flex_attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.ops.attention import _tpu_splash, attention_ref


def _qkv(rng, b=1, t=256, hq=4, hkv=2, dh=128):
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (b, t, hq, dh), jnp.float32)
    k = jax.random.normal(k2, (b, t, hkv, dh), jnp.float32)
    v = jax.random.normal(k3, (b, t, hkv, dh), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("window,softcap", [
    (None, None), (64, None), (None, 20.0), (64, 20.0)])
def test_splash_matches_ref(rng, window, softcap):
    q, k, v = _qkv(rng)
    scale = q.shape[-1] ** -0.5
    out = _tpu_splash(q, k, v, causal=True, segment_ids=None,
                      window=window, softcap=softcap, scale=scale,
                      interpret=True)
    ref = attention_ref(q, k, v, causal=True, window=window,
                        softcap=softcap, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_splash_segment_ids(rng):
    q, k, v = _qkv(rng, t=256)
    seg = jnp.concatenate([jnp.zeros((1, 128), jnp.int32),
                           jnp.ones((1, 128), jnp.int32)], axis=1)
    scale = q.shape[-1] ** -0.5
    out = _tpu_splash(q, k, v, causal=True, segment_ids=seg,
                      window=None, softcap=None, scale=scale,
                      interpret=True)
    ref = attention_ref(q, k, v, causal=True, segment_ids=seg, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_splash_grads(rng):
    q, k, v = _qkv(rng, t=128)
    scale = q.shape[-1] ** -0.5

    def f(q, k, v):
        return jnp.sum(_tpu_splash(q, k, v, causal=True, segment_ids=None,
                                   window=None, softcap=None, scale=scale,
                                   interpret=True).astype(jnp.float32))

    def f_ref(q, k, v):
        return jnp.sum(attention_ref(q, k, v, causal=True,
                                     scale=scale).astype(jnp.float32))

    g1 = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3)
