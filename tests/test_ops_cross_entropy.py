"""Cross-entropy kernel parity (reference: kernels/cross_entropy_loss.py —
loss+logsumexp forward, chunked vocab, softcap/logit-scale branches,
in-place dlogits backward, n_items division)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.ops.cross_entropy import (
    IGNORE_INDEX, cross_entropy_per_row, cross_entropy_ref,
    fast_cross_entropy_loss)
from unsloth_tpu.ops.fused_ce_linear import (
    fused_ce_loss_mean, fused_linear_cross_entropy)


def _labels(key, n, v, n_ignored=3):
    labels = jax.random.randint(key, (n,), 0, v)
    return labels.at[:n_ignored].set(IGNORE_INDEX)


@pytest.mark.parametrize("softcap,logit_scale", [
    (None, None), (30.0, None), (None, 0.0625), (30.0, 0.0625)])
def test_ce_matches_ref(rng, softcap, logit_scale):
    k1, k2 = jax.random.split(rng)
    n, v = 64, 1000
    logits = jax.random.normal(k1, (n, v), jnp.float32) * 4.0
    labels = _labels(k2, n, v)
    out = cross_entropy_per_row(logits, labels, softcap, logit_scale)
    ref = cross_entropy_ref(logits, labels, softcap, logit_scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("softcap,logit_scale", [
    (None, None), (30.0, None), (None, 0.0625)])
@pytest.mark.slow
def test_ce_grad_matches_autodiff(rng, softcap, logit_scale):
    k1, k2 = jax.random.split(rng)
    n, v = 32, 500
    logits = jax.random.normal(k1, (n, v), jnp.float32)
    labels = _labels(k2, n, v)

    g1 = jax.grad(lambda x: jnp.sum(
        cross_entropy_per_row(x, labels, softcap, logit_scale)))(logits)
    g2 = jax.grad(lambda x: jnp.sum(
        cross_entropy_ref(x, labels, softcap, logit_scale)))(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-5, rtol=1e-4)


def test_ignored_rows_zero_loss_and_grad(rng):
    n, v = 16, 100
    logits = jax.random.normal(rng, (n, v), jnp.float32)
    labels = jnp.full((n,), IGNORE_INDEX, jnp.int32)
    loss = cross_entropy_per_row(logits, labels)
    assert float(jnp.sum(loss)) == 0.0
    g = jax.grad(lambda x: jnp.sum(cross_entropy_per_row(x, labels)))(logits)
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_fast_ce_n_items_scaling(rng):
    k1, k2 = jax.random.split(rng)
    logits = jax.random.normal(k1, (2, 8, 100), jnp.float32)
    labels = jax.random.randint(k2, (2, 8), 0, 100)
    mean_loss = fast_cross_entropy_loss(logits, labels)
    scaled = fast_cross_entropy_loss(logits, labels, n_items=jnp.float32(32))
    np.testing.assert_allclose(float(scaled) * 32, float(mean_loss) * 16,
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# Fused linear + CE (logits never materialized)
# ---------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("softcap", [None, 30.0])
@pytest.mark.parametrize("chunk", [16, 64, 1000])
def test_fused_linear_ce_matches_unfused(rng, softcap, chunk):
    k1, k2, k3 = jax.random.split(rng, 3)
    n, d, v = 50, 32, 128
    h = jax.random.normal(k1, (n, d), jnp.float32)
    w = jax.random.normal(k2, (d, v), jnp.float32) * 0.1
    labels = _labels(k3, n, v)

    loss = fused_ce_loss_mean(h, w, labels, softcap=softcap, chunk_size=chunk)
    ref = jnp.sum(cross_entropy_ref(h @ w, labels, softcap)) / jnp.sum(
        labels != IGNORE_INDEX)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)


@pytest.mark.slow
def test_fused_linear_ce_grads(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    n, d, v = 40, 16, 64
    h = jax.random.normal(k1, (n, d), jnp.float32)
    w = jax.random.normal(k2, (d, v), jnp.float32) * 0.2
    labels = _labels(k3, n, v)

    def fused(h, w):
        return fused_ce_loss_mean(h, w, labels, chunk_size=16)

    def unfused(h, w):
        return jnp.sum(cross_entropy_ref(h @ w, labels)) / jnp.sum(
            labels != IGNORE_INDEX)

    gh1, gw1 = jax.grad(fused, argnums=(0, 1))(h, w)
    gh2, gw2 = jax.grad(unfused, argnums=(0, 1))(h, w)
    np.testing.assert_allclose(np.asarray(gh1), np.asarray(gh2),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               atol=1e-5, rtol=1e-4)


def test_fused_linear_ce_frozen_w_skips_dw(rng):
    k1, k2, k3 = jax.random.split(rng, 3)
    n, d, v = 32, 16, 64
    h = jax.random.normal(k1, (n, d), jnp.float32)
    w = jax.random.normal(k2, (d, v), jnp.float32) * 0.2
    labels = _labels(k3, n, v)

    def fused_frozen(h, w):
        return fused_ce_loss_mean(h, w, labels, chunk_size=16,
                                  w_trainable=False)

    gh, gw = jax.grad(fused_frozen, argnums=(0, 1))(h, w)
    # dh still correct; dw reported as zeros (frozen)
    gh_ref = jax.grad(lambda h_: jnp.sum(cross_entropy_ref(h_ @ w, labels))
                      / jnp.sum(labels != IGNORE_INDEX))(h)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_ref),
                               atol=1e-5, rtol=1e-4)
    assert float(jnp.max(jnp.abs(gw))) == 0.0
