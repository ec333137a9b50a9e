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


@pytest.mark.slow
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


def test_dit_checkpoint_roundtrip(tmp_path):
    """save_dit/load_dit preserve the tree and config exactly."""
    import jax.tree_util as jtu

    from unsloth_tpu.models.image_diffusion import (DiTConfig, init_dit,
                                                    load_dit, save_dit)

    cfg = DiTConfig(image_size=16, patch_size=4, hidden_size=64,
                    num_layers=2, num_heads=2, num_classes=3)
    p = init_dit(cfg, jax.random.PRNGKey(0))
    save_dit(p, cfg, str(tmp_path / "dit"))
    p2, cfg2 = load_dit(str(tmp_path / "dit"))
    assert cfg2 == cfg
    l1, t1 = jtu.tree_flatten(p)
    l2, t2 = jtu.tree_flatten(p2)
    assert t1 == t2
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b))


def test_images_generations_route(tmp_path):
    """OpenAI-shape /v1/images/generations serves PNGs from a DiT
    checkpoint (the reference's sd.cpp sidecar analog)."""
    import base64
    import io
    import json as jsonlib
    import urllib.request

    from PIL import Image

    from unsloth_tpu.models.image_diffusion import (DiTConfig, init_dit,
                                                    save_dit)
    from unsloth_tpu.studio.server import StudioServer

    cfg = DiTConfig(image_size=16, patch_size=4, hidden_size=64,
                    num_layers=2, num_heads=2, num_classes=3)
    save_dit(init_dit(cfg, jax.random.PRNGKey(0)), cfg,
             str(tmp_path / "dit"))

    token = "img-test-token"
    srv = StudioServer(workdir=str(tmp_path / "jobs"), token=token)
    httpd = srv.serve(port=18379, background=True)
    url = "http://127.0.0.1:18379"

    def post(body):
        req = urllib.request.Request(
            url + "/v1/images/generations",
            data=jsonlib.dumps(body).encode(),
            headers={"Content-Type": "application/json",
                     "Authorization": f"Bearer {token}"})
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.status, jsonlib.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, jsonlib.loads(e.read())

    try:
        code, out = post({"model": str(tmp_path / "dit"), "n": 2,
                          "steps": 4, "label": 1, "seed": 7})
        assert code == 200 and len(out["data"]) == 2
        img = Image.open(io.BytesIO(
            base64.b64decode(out["data"][0]["b64_json"])))
        assert img.size == (16, 16)
        # determinism: same seed -> same bytes; model stays cached
        code, out2 = post({"n": 2, "steps": 4, "label": 1, "seed": 7})
        assert out2["data"][0]["b64_json"] == out["data"][0]["b64_json"]

        code, _ = post({"steps": 4})
        assert code in (200, 400)  # cached model serves; fresh -> 400
        code, _ = post({"model": "/nonexistent", "steps": 2})
        assert code == 404
    finally:
        httpd.shutdown()
