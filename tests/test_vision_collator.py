"""UnslothVisionDataCollator tests: collated batches feed the vision loss
for both families."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.test_vision import gemma3_ckpt  # noqa: F401 (fixture)
from tests.test_qwen_vl import qwen_vl_ckpt, IMG_TOKEN  # noqa: F401

from unsloth_tpu.data.vision_collator import (UnslothVisionDataCollator,
                                              preprocess_gemma3,
                                              preprocess_qwen_vl)


class VTok:
    pad_token_id = 0
    eos_token_id = 2

    def __call__(self, text, **kw):
        return {"input_ids": [ord(c) % 128 for c in text]}


def _rows():
    img = (np.random.RandomState(0).rand(40, 52, 3) * 255).astype(np.uint8)
    return [{
        "messages": [
            {"role": "user", "content": [
                {"type": "image", "image": img},
                {"type": "text", "text": "what is this?"}]},
            {"role": "assistant", "content": "a picture"},
        ],
    }]


def test_preprocess_shapes():
    img = (np.random.RandomState(1).rand(50, 60, 3) * 255).astype(np.uint8)
    g = preprocess_gemma3(img, image_size=28)
    assert g.shape == (3, 28, 28)
    patches, grid = preprocess_qwen_vl(img, patch_size=14, merge=2)
    t, gh, gw = grid
    assert patches.shape == (gh * gw, 3 * 2 * 14 * 14)
    assert gh % 2 == 0 and gw % 2 == 0


def test_collator_gemma3(gemma3_ckpt):
    from unsloth_tpu.models.vision import FastVisionModel

    path, _ = gemma3_ckpt
    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    coll = UnslothVisionDataCollator(model, VTok())
    batch = coll(_rows())
    assert batch["pixel_values"].shape[1:] == (3, 28, 28)
    n_img = int((np.asarray(batch["input_ids"])
                 == model.image_token_id).sum())
    assert n_img == model.mm_tokens_per_image
    # user tokens masked, assistant tokens labeled
    labels = np.asarray(batch["labels"])[0]
    assert (labels[:10] == -100).all()
    assert (labels != -100).sum() == len("a picture")
    loss = model.vision_loss_fn(None, batch, remat=False)
    assert np.isfinite(float(loss))


def test_collator_qwen_vl(qwen_vl_ckpt):
    from unsloth_tpu.models.vision import FastVisionModel

    path, _ = qwen_vl_ckpt
    model, _ = FastVisionModel.from_pretrained(path, load_in_4bit=False,
                                               dtype="float32")
    coll = UnslothVisionDataCollator(model, VTok())
    batch = coll(_rows())
    assert "grid_thw" in batch
    t, gh, gw = batch["grid_thw"][0]
    n_img = int((np.asarray(batch["input_ids"])
                 == model.image_token_id).sum())
    assert n_img == gh // 2 * (gw // 2)
    loss = model.vision_loss_fn(None, batch, remat=False)
    assert np.isfinite(float(loss))
