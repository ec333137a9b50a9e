"""TPU-native image diffusion (DiT) — the native replacement for the
reference's stable-diffusion.cpp sidecar (reference:
studio/backend/core/inference/sd_cpp_server.py and the studio diffusion
trainers)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsloth_tpu.models.image_diffusion import (DiTConfig,
                                                ImageDiffusionConfig,
                                                ImageDiffusionTrainer,
                                                cosine_betas, ddim_sample,
                                                diffusion_loss,
                                                dit_forward, init_dit,
                                                patchify, unpatchify)


def _cfg(**kw):
    base = dict(image_size=8, patch_size=2, in_channels=3, hidden_size=64,
                num_layers=2, num_heads=2, timesteps=100)
    base.update(kw)
    return DiTConfig(**base)


def test_patchify_roundtrip(rng):
    cfg = _cfg()
    x = jax.random.normal(rng, (2, 8, 8, 3))
    np.testing.assert_allclose(np.asarray(unpatchify(patchify(x, cfg),
                                                     cfg)),
                               np.asarray(x))


def test_forward_shapes_and_identity_init(rng):
    """adaLN-zero: zero-init modulation + head make the untrained model
    output exactly zero (each block starts as identity)."""
    cfg = _cfg()
    params = init_dit(cfg, rng)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 8, 8, 3))
    t = jnp.array([0, 50])
    eps = dit_forward(params, x, t, cfg)
    assert eps.shape == (2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(eps), 0.0)


def test_cosine_schedule_monotone():
    betas = cosine_betas(100)
    ab = np.cumprod(1 - betas)
    assert ab[0] > 0.99 and ab[-1] < 0.01
    assert (np.diff(ab) < 0).all()


def test_training_reduces_loss(rng):
    cfg = _cfg()
    params = init_dit(cfg, rng)
    # toy dataset: smooth gradients (learnable structure)
    xs = np.linspace(-1, 1, 8)
    img = np.stack(np.meshgrid(xs, xs), -1).sum(-1, keepdims=True)
    images = np.repeat(img[None], 16, 0)
    images = np.repeat(images, 3, axis=-1).astype(np.float32) / 2
    tr = ImageDiffusionTrainer(
        params, cfg, images,
        args=ImageDiffusionConfig(max_steps=60, logging_steps=10,
                                  learning_rate=2e-3))
    log = tr.train()
    assert log[-1]["loss"] < log[0]["loss"] * 0.8, log


def test_ddim_sampler_shapes_and_finite(rng):
    cfg = _cfg()
    params = init_dit(cfg, rng)
    out = ddim_sample(params, cfg, rng, num_images=2, steps=5)
    assert out.shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_class_conditional(rng):
    cfg = _cfg(num_classes=4)
    params = init_dit(cfg, rng)
    assert "label_embed" in params
    x = jax.random.normal(rng, (2, 8, 8, 3))
    loss = diffusion_loss(params, x, rng, cfg,
                          np.cumprod(1 - cosine_betas(cfg.timesteps)),
                          labels=jnp.array([0, 3]))
    assert np.isfinite(float(loss))
