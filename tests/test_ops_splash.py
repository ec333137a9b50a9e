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
@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_splash_prefix_layout_matches_ref(rng):
    """Shared-prefix GRPO mask (training-side PrefixGrouper): the splash
    kernel with the static prefix mask must match the masked-SDPA
    reference with the same layout."""
    P, G, L = 128, 2, 128
    t = P + G * L
    q, k, v = _qkv(rng, t=t)
    scale = q.shape[-1] ** -0.5
    seg = np.ones((1, t), np.int32)
    seg[0, :40] = 0          # left-pad of a short prompt
    seg[0, P + 90:P + L] = 0  # first completion shorter than its region
    seg = jnp.asarray(seg)
    out = _tpu_splash(q, k, v, causal=True, segment_ids=seg,
                      window=None, softcap=None, scale=scale,
                      interpret=True, prefix_layout=(P, G, L))
    ref = attention_ref(q, k, v, causal=True, segment_ids=seg,
                        scale=scale, prefix_layout=(P, G, L))
    mask = np.asarray(seg[0]).astype(bool)
    np.testing.assert_allclose(np.asarray(out)[0][mask],
                               np.asarray(ref)[0][mask],
                               atol=2e-3, rtol=2e-3)


def test_prefix_mask_structure():
    """Completions see the shared prefix and themselves only."""
    from unsloth_tpu.ops.attention import prefix_mask_array

    m = prefix_mask_array(4, 2, 3)      # T = 10
    # prompt causal
    assert m[2, 1] and not m[1, 2]
    # completion 0 (slots 4-6): sees prompt + itself causally
    assert m[5, 0] and m[5, 4] and m[5, 5] and not m[5, 6]
    # completion 1 (slots 7-9): sees prompt + itself, NOT completion 0
    assert m[8, 2] and m[8, 7] and not m[8, 5] and not m[8, 4] is False
    assert not m[8, 6]
    # prompt never sees completions
    assert not m[3, 4] and not m[3, 7]
