"""Attention + RoPE semantics tests (reference: utils/attention_dispatch.py
mask normalization / GQA / sliding window; kernels/rope_embedding.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.models.config import RopeScaling
from unsloth_tpu.ops.attention import attention_ref
from unsloth_tpu.ops.rope import (apply_rope, rope_inv_freq, rope_table)


def _qkv(rng, b=2, t=16, hq=4, hkv=2, dh=8):
    k1, k2, k3 = jax.random.split(rng, 3)
    q = jax.random.normal(k1, (b, t, hq, dh), jnp.float32)
    k = jax.random.normal(k2, (b, t, hkv, dh), jnp.float32)
    v = jax.random.normal(k3, (b, t, hkv, dh), jnp.float32)
    return q, k, v


def test_causal_masking(rng):
    q, k, v = _qkv(rng)
    out = attention_ref(q, k, v, causal=True)
    # Changing future keys must not change earlier outputs.
    k2 = k.at[:, -1].set(999.0)
    v2 = v.at[:, -1].set(999.0)
    out2 = attention_ref(q, k2, v2, causal=True)
    np.testing.assert_allclose(np.asarray(out[:, :-1]),
                               np.asarray(out2[:, :-1]), atol=1e-6)
    assert not np.allclose(np.asarray(out[:, -1]), np.asarray(out2[:, -1]))


def test_segment_isolation(rng):
    """Packed sequences must not attend across segment boundaries."""
    q, k, v = _qkv(rng, b=1, t=16)
    seg = jnp.array([[0] * 8 + [1] * 8], jnp.int32)
    pos = jnp.array([list(range(8)) + list(range(8))], jnp.int32)
    packed = attention_ref(q, k, v, causal=True, segment_ids=seg,
                           positions=pos)
    # second segment standalone
    alone = attention_ref(q[:, 8:], k[:, 8:], v[:, 8:], causal=True)
    np.testing.assert_allclose(np.asarray(packed[:, 8:]), np.asarray(alone),
                               atol=1e-5)


def test_sliding_window(rng):
    q, k, v = _qkv(rng, b=1, t=32)
    win = attention_ref(q, k, v, causal=True, window=4)
    # token 31 with window 4 sees keys 28..31 only; zeroing key 0..20 is a no-op
    k2 = k.at[:, :20].set(7.0)
    v2 = v.at[:, :20].set(7.0)
    win2 = attention_ref(q, k2, v2, causal=True, window=4)
    np.testing.assert_allclose(np.asarray(win[:, -1]), np.asarray(win2[:, -1]),
                               atol=1e-6)


def test_softcap_changes_scores(rng):
    q, k, v = _qkv(rng)
    a = attention_ref(q * 10, k * 10, v, causal=True)
    b = attention_ref(q * 10, k * 10, v, causal=True, softcap=5.0)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_gqa_equals_repeated_kv(rng):
    q, k, v = _qkv(rng, hq=8, hkv=2)
    out = attention_ref(q, k, v, causal=True)
    k_rep = jnp.repeat(k, 4, axis=2)
    v_rep = jnp.repeat(v, 4, axis=2)
    out_rep = attention_ref(q, k_rep, v_rep, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_rep), atol=1e-6)


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def test_rope_preserves_norm(rng):
    x = jax.random.normal(rng, (1, 8, 2, 16), jnp.float32)
    inv = rope_inv_freq(16, 10000.0)
    pos = jnp.arange(8, dtype=jnp.int32)[None]
    cos, sin = rope_table(pos, inv)
    out = apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)


def test_rope_relative_position_property(rng):
    """<rope(q,m), rope(k,n)> depends only on m-n."""
    k1, k2 = jax.random.split(rng)
    q = jax.random.normal(k1, (1, 1, 1, 32), jnp.float32)
    k = jax.random.normal(k2, (1, 1, 1, 32), jnp.float32)
    inv = rope_inv_freq(32, 10000.0)

    def score(m, n):
        cq, sq = rope_table(jnp.array([[m]], jnp.int32), inv)
        ck, sk = rope_table(jnp.array([[n]], jnp.int32), inv)
        qr = apply_rope(q, cq, sq)
        kr = apply_rope(k, ck, sk)
        return float(jnp.sum(qr * kr))

    np.testing.assert_allclose(score(5, 3), score(10, 8), rtol=1e-4)
    np.testing.assert_allclose(score(100, 90), score(20, 10), rtol=1e-4)


def test_llama3_rope_scaling_shapes():
    s = RopeScaling(rope_type="llama3", factor=8.0, low_freq_factor=1.0,
                    high_freq_factor=4.0,
                    original_max_position_embeddings=8192)
    inv_plain = rope_inv_freq(128, 500000.0)
    inv_scaled = rope_inv_freq(128, 500000.0, s)
    assert inv_scaled.shape == inv_plain.shape
    # low-frequency (long wavelength) components get divided by factor
    assert float(inv_scaled[-1]) < float(inv_plain[-1])
    # high-frequency components unchanged
    np.testing.assert_allclose(float(inv_scaled[0]), float(inv_plain[0]),
                               rtol=1e-6)


def test_yarn_rope_scaling():
    s = RopeScaling(rope_type="yarn", factor=4.0,
                    original_max_position_embeddings=4096)
    inv = rope_inv_freq(64, 10000.0, s)
    inv_plain = rope_inv_freq(64, 10000.0)
    assert inv.shape == inv_plain.shape
    assert float(inv[-1]) <= float(inv_plain[-1])


@pytest.mark.slow
def test_sinks_lse_rescale_matches_ref(rng):
    """The TPU sinks path is out_nosink * sigmoid(lse - sink); must equal
    the reference's augmented-softmax formulation (values + grads)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unsloth_tpu.ops.attention import (_apply_sinks, _chunked_lse,
                                           attention_ref)

    b, t, hq, hkv, dh = 2, 256, 4, 2, 32
    ks = jax.random.split(rng, 5)
    q = jax.random.normal(ks[0], (b, t, hq, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, hkv, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, hkv, dh), jnp.float32)
    sinks = jax.random.normal(ks[3], (hq,), jnp.float32)
    seg = jnp.asarray(
        np.repeat(np.arange(1, 5), t // 4)[None, :].repeat(b, 0),
        jnp.int32)
    scale = dh ** -0.5

    def fast(q, k, v, sinks):
        out = attention_ref(q, k, v, causal=True, segment_ids=seg,
                            scale=scale)
        lse = _chunked_lse(q, k, causal=True, segment_ids=seg, window=None,
                           softcap=None, scale=scale, q_chunk=64)
        return _apply_sinks(out, lse, sinks)

    def ref(q, k, v, sinks):
        return attention_ref(q, k, v, causal=True, segment_ids=seg,
                             scale=scale, sinks=sinks)

    np.testing.assert_allclose(np.asarray(fast(q, k, v, sinks)),
                               np.asarray(ref(q, k, v, sinks)),
                               atol=1e-5, rtol=1e-5)

    g_fast = jax.grad(lambda *a: jnp.sum(fast(*a) ** 2), argnums=(0, 1, 3))(
        q, k, v, sinks)
    g_ref = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=(0, 1, 3))(
        q, k, v, sinks)
    for a, b_ in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_sinks_with_window_matches_ref(rng):
    """Sliding-window + sinks (the gpt-oss sliding layers)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unsloth_tpu.ops.attention import (_apply_sinks, _chunked_lse,
                                           attention_ref)

    b, t, hq, hkv, dh = 1, 128, 2, 1, 16
    ks = jax.random.split(rng, 4)
    q = jax.random.normal(ks[0], (b, t, hq, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, hkv, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, hkv, dh), jnp.float32)
    sinks = jax.random.normal(ks[3], (hq,), jnp.float32)
    scale = dh ** -0.5
    out = attention_ref(q, k, v, causal=True, window=8, scale=scale)
    lse = _chunked_lse(q, k, causal=True, segment_ids=None, window=8,
                       softcap=None, scale=scale, q_chunk=32)
    got = _apply_sinks(out, lse, sinks)
    want = attention_ref(q, k, v, causal=True, window=8, scale=scale,
                         sinks=sinks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
