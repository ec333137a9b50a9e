"""Mamba2/SSD op tests: chunk-size invariance (the chunked algorithm must
compute the same scan regardless of chunking), a sequential-scan oracle,
conv semantics, and gradient flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsloth_tpu.ops.ssm import causal_conv1d, mamba2_mixer, ssd_chunked


def _inputs(rng, b=2, t=24, h=3, p=4, n=5):
    ks = jax.random.split(rng, 4)
    xd = jax.random.normal(ks[0], (b, t, h, p), jnp.float32) * 0.5
    Ad = -jax.nn.softplus(jax.random.normal(ks[1], (b, t, h)))  # negative
    B = jax.random.normal(ks[2], (b, t, h, n), jnp.float32) * 0.5
    C = jax.random.normal(ks[3], (b, t, h, n), jnp.float32) * 0.5
    return xd, Ad, B, C


def ssd_sequential(xd, Ad, B, C):
    """O(T) recurrent oracle: s_t = exp(Ad_t) s_{t-1} + B_t x_t;
    y_t = C_t . s_t."""
    b, t, h, p = xd.shape
    n = B.shape[-1]
    s = np.zeros((b, h, p, n), np.float64)
    xd, Ad, B, C = map(np.asarray, (xd, Ad, B, C))
    ys = np.zeros((b, t, h, p), np.float64)
    for i in range(t):
        s = s * np.exp(Ad[:, i])[:, :, None, None] \
            + B[:, i][:, :, None, :] * xd[:, i][..., None]
        ys[:, i] = (s * C[:, i][:, :, None, :]).sum(-1)
    return ys


def test_ssd_matches_sequential_oracle(rng):
    xd, Ad, B, C = _inputs(rng)
    want = ssd_sequential(xd, Ad, B, C)
    got = np.asarray(ssd_chunked(xd, Ad, B, C, chunk_size=8))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("chunk", [4, 6, 24, 64])
def test_ssd_chunk_invariance(rng, chunk):
    xd, Ad, B, C = _inputs(rng)
    ref = np.asarray(ssd_chunked(xd, Ad, B, C, chunk_size=24))
    got = np.asarray(ssd_chunked(xd, Ad, B, C, chunk_size=chunk))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_ssd_grads_flow(rng):
    xd, Ad, B, C = _inputs(rng, t=16)

    def loss(xd, Ad, B, C):
        return jnp.sum(ssd_chunked(xd, Ad, B, C, 8) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(xd, Ad, B, C)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


def test_causal_conv1d_matches_numpy(rng):
    b, t, c, k = 2, 10, 6, 4
    ks = jax.random.split(rng, 3)
    x = jax.random.normal(ks[0], (b, t, c), jnp.float32)
    w = jax.random.normal(ks[1], (c, 1, k), jnp.float32)
    bias = jax.random.normal(ks[2], (c,), jnp.float32)
    got = np.asarray(causal_conv1d(x, w, bias))
    xn, wn = np.asarray(x), np.asarray(w)[:, 0]
    want = np.zeros((b, t, c), np.float32)
    for i in range(t):
        for j in range(k):
            if i - (k - 1 - j) >= 0:
                want[:, i] += xn[:, i - (k - 1 - j)] * wn[:, j]
    want += np.asarray(bias)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_mixer_padding_mask_ignores_pad(rng):
    """Padded (segment 0) tokens must not change real tokens' outputs."""
    b, t, d = 1, 12, 16
    mc = dict(d_ssm=16, n_heads=2, head_dim=8, n_groups=1, d_state=4,
              chunk_size=4)
    ks = jax.random.split(rng, 8)
    z = 2 * mc["d_ssm"] + 2 * mc["n_groups"] * mc["d_state"] \
        + mc["n_heads"]
    conv_c = mc["d_ssm"] + 2 * mc["n_groups"] * mc["d_state"]
    p = {
        "in_proj": jax.random.normal(ks[0], (z, d)) * 0.2,
        "conv_w": jax.random.normal(ks[1], (conv_c, 1, 4)) * 0.3,
        "conv_b": jnp.zeros((conv_c,)),
        "dt_bias": jnp.zeros((mc["n_heads"],)),
        "A_log": jnp.zeros((mc["n_heads"],)),
        "D": jnp.ones((mc["n_heads"],)),
        "out_proj": jax.random.normal(ks[2], (d, mc["d_ssm"])) * 0.2,
    }
    x = jax.random.normal(ks[3], (b, t, d), jnp.float32)
    real = 8
    mask = jnp.asarray((np.arange(t) < real)[None, :].astype(np.float32))
    y_mask = mamba2_mixer(x, p, padding_mask=mask, **mc)
    y_trunc = mamba2_mixer(x[:, :real], p,
                           padding_mask=mask[:, :real], **mc)
    np.testing.assert_allclose(np.asarray(y_mask[:, :real]),
                               np.asarray(y_trunc), atol=1e-5, rtol=1e-4)
