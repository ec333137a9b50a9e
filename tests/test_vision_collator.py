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


@pytest.mark.slow
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


@pytest.mark.slow
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


# ---- video path validation (reference: models/vision.py:2435) ----

def _video_rows(paths):
    return [{"messages": [
        {"role": "user", "content": [
            {"type": "video", "video": p},
            {"type": "text", "text": "describe"}]},
        {"role": "assistant", "content": "a video"}]} for p in paths]


def test_missing_video_raises(tmp_path):
    from unsloth_tpu.data.vision_collator import (
        check_dataset_for_missing_videos)

    good = tmp_path / "clip.mp4"
    good.write_bytes(b"\x00")
    bad = str(tmp_path / "nope.mp4")
    rows = _video_rows([str(good), bad])
    try:
        check_dataset_for_missing_videos(rows)
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError as e:
        assert bad in str(e) and str(good) not in str(e)
    # warn-only mode returns the list instead
    missing = check_dataset_for_missing_videos(rows, raise_error=False)
    assert missing == [bad]


def test_video_check_skips_remote_and_caches(tmp_path):
    from unsloth_tpu.data.vision_collator import (
        check_dataset_for_missing_videos)

    good = tmp_path / "ok.mp4"
    good.write_bytes(b"\x00")
    rows = _video_rows([
        "https://example.com/v.mp4",          # remote: not checked
        "data:video/mp4;base64,AAAA",          # inline: not checked
        "file://remotehost/v.mp4",             # non-local file://
        f"file://{good}",                      # local file:// exists
        str(good),                             # plain path exists
    ])
    checked = set()
    assert check_dataset_for_missing_videos(rows, checked=checked) == []
    assert str(good) in checked
    # cached paths short-circuit even after deletion
    good.unlink()
    assert check_dataset_for_missing_videos(rows, checked=checked) == []


def test_collator_rejects_missing_video(tmp_path):
    from unsloth_tpu.data.vision_collator import UnslothVisionDataCollator

    coll = UnslothVisionDataCollator(model=None, tokenizer=None)
    rows = _video_rows([str(tmp_path / "gone.mp4")])
    try:
        coll(rows)
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError:
        pass
