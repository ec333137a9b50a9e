"""Vision SFT collation.

Parity target: the reference's `UnslothVisionDataCollator` (zoo
vision_utils, used by every vision notebook): turns {"messages": [...],
"images": [...]} rows into model-ready batches — pixel preprocessing,
image-token expansion, response-only label masking.

Two families:
  * gemma3: resize to a fixed square, SigLIP normalization, each image
    becomes `mm_tokens_per_image` image tokens wrapped in boi/eoi.
  * qwen2.5-vl: resize to patch-grid multiples, CLIP normalization,
    patch-voxel flattening ([S, C*Tp*P*P]) + grid_thw.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

IGNORE_INDEX = -100

# SigLIP (gemma3) normalization
_SIGLIP_MEAN = np.array([0.5, 0.5, 0.5], np.float32)
_SIGLIP_STD = np.array([0.5, 0.5, 0.5], np.float32)
# CLIP (qwen-vl) normalization
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _to_rgb_array(image) -> np.ndarray:
    """PIL image / array -> float32 [H, W, 3] in [0, 1]."""
    if hasattr(image, "convert"):
        image = np.asarray(image.convert("RGB"), np.float32) / 255.0
    else:
        image = np.asarray(image, np.float32)
        if image.max() > 1.5:
            image = image / 255.0
        if image.ndim == 2:
            image = np.stack([image] * 3, -1)
    return image


def _resize(image: np.ndarray, h: int, w: int) -> np.ndarray:
    from PIL import Image

    pil = Image.fromarray((np.clip(image, 0, 1) * 255).astype(np.uint8))
    pil = pil.resize((w, h), Image.BILINEAR)
    return np.asarray(pil, np.float32) / 255.0


def preprocess_gemma3(image, image_size: int = 896) -> np.ndarray:
    """-> [3, S, S] SigLIP-normalized."""
    arr = _resize(_to_rgb_array(image), image_size, image_size)
    arr = (arr - _SIGLIP_MEAN) / _SIGLIP_STD
    return arr.transpose(2, 0, 1)


def preprocess_qwen_vl(image, patch_size: int = 14, merge: int = 2,
                       temporal: int = 2, max_side: int = 1024
                       ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """-> (patches [S, C*Tp*P*P], grid_thw). Images duplicate the frame
    across the temporal patch axis (the processor convention)."""
    arr = _to_rgb_array(image)
    h, w = arr.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    factor = patch_size * merge
    gh = max(1, round(h * scale / factor)) * merge
    gw = max(1, round(w * scale / factor)) * merge
    arr = _resize(arr, gh * patch_size, gw * patch_size)
    arr = (arr - _CLIP_MEAN) / _CLIP_STD
    chw = arr.transpose(2, 0, 1)                        # [3, H, W]
    c = 3
    x = chw.reshape(c, gh, patch_size, gw, patch_size)
    x = x.transpose(1, 3, 0, 2, 4)                      # [gh, gw, C, P, P]
    # voxel layout is [C, Tp, P, P]: repeat the frame on the temporal axis
    vox = np.repeat(
        x.reshape(gh * gw, c, 1, patch_size, patch_size), temporal, axis=2)
    patches = vox.reshape(gh * gw, c * temporal * patch_size * patch_size)
    return patches.astype(np.float32), (1, gh, gw)


@dataclasses.dataclass
class UnslothVisionDataCollator:
    """Callable collator: rows {"messages": [...]} where message content is
    a list of {"type": "text"|"image", ...} blocks (images either inline
    in the block as "image" or in row["images"]). Produces the batch dict
    the vision loss consumes; assistant turns are the only labeled spans
    (train_on_responses_only semantics built in)."""

    model: Any
    tokenizer: Any
    max_seq_length: int = 2048
    train_on_responses_only: bool = True

    def _family(self) -> str:
        return ("qwen_vl" if type(self.model).__name__ == "QwenVLModel"
                else "gemma3")

    def __call__(self, rows: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
        import jax.numpy as jnp

        # Per-batch guard against silently-empty video inputs (reference:
        # unsloth/trainer.py:81 runs the same check per collator call with
        # a cross-call known-good cache).
        if not hasattr(self, "_checked_videos"):
            self._checked_videos = set()
        check_dataset_for_missing_videos(rows, raise_error=True,
                                         checked=self._checked_videos)
        tok = self.tokenizer
        family = self._family()
        all_ids, all_labels = [], []
        pixel_list, grids = [], []
        for row in rows:
            images = list(row.get("images", []))
            ids: List[int] = []
            labels: List[int] = []
            for msg in row["messages"]:
                content = msg["content"]
                blocks = (content if isinstance(content, list)
                          else [{"type": "text", "text": content}])
                turn_ids: List[int] = []
                img_slots: List[int] = []
                for b in blocks:
                    if b.get("type") == "image":
                        img = b.get("image")
                        if img is None and images:
                            img = images.pop(0)
                        n_tok, pixels, grid = self._encode_image(img,
                                                                 family)
                        pixel_list.append(pixels)
                        if grid is not None:
                            grids.append(grid)
                        turn_ids.extend([self.model.image_token_id] * n_tok)
                    else:
                        turn_ids.extend(tok(b.get("text", ""),
                                            add_special_tokens=False)
                                        ["input_ids"])
                is_assistant = msg["role"] == "assistant"
                lab = (turn_ids if (is_assistant
                                    or not self.train_on_responses_only)
                       else [IGNORE_INDEX] * len(turn_ids))
                ids.extend(turn_ids)
                labels.extend(lab)
            all_ids.append(ids[: self.max_seq_length])
            all_labels.append(labels[: self.max_seq_length])

        t = max(len(x) for x in all_ids)
        t = ((t + 7) // 8) * 8
        pad = getattr(tok, "pad_token_id", 0) or 0
        input_ids = np.full((len(rows), t), pad, np.int32)
        labels_arr = np.full((len(rows), t), IGNORE_INDEX, np.int32)
        for i, (ids, labs) in enumerate(zip(all_ids, all_labels)):
            input_ids[i, :len(ids)] = ids
            labels_arr[i, :len(labs)] = labs

        batch: Dict[str, Any] = {
            "input_ids": jnp.asarray(input_ids),
            "labels": jnp.asarray(labels_arr),
        }
        if family == "qwen_vl":
            batch["pixel_values"] = jnp.asarray(
                np.concatenate(pixel_list, axis=0))
            batch["grid_thw"] = tuple(grids)
        else:
            batch["pixel_values"] = jnp.asarray(np.stack(pixel_list))
        return batch

    def _encode_image(self, image, family):
        if family == "qwen_vl":
            vc = self.model.vision_cfg
            patches, grid = preprocess_qwen_vl(
                image, patch_size=vc.patch_size,
                merge=vc.spatial_merge_size,
                temporal=vc.temporal_patch_size)
            n_tok = grid[0] * (grid[1] // vc.spatial_merge_size) * (
                grid[2] // vc.spatial_merge_size)
            return n_tok, patches, grid
        vc = self.model.vision_cfg
        pixels = preprocess_gemma3(image, vc.image_size)
        return self.model.mm_tokens_per_image, pixels, None


def _local_video_path(value: str):
    """Resolve a message video value to a local filesystem path, or None
    when it is not a local file (data: URI, http(s), non-local file://)."""
    if value.startswith("data:"):
        return None
    if "://" not in value:
        return value
    if not value.startswith("file://"):
        return None
    from urllib.parse import urlparse
    from urllib.request import url2pathname

    parsed = urlparse(value)
    if parsed.netloc and parsed.netloc != "localhost":
        return None
    return url2pathname(parsed.path) or None


def check_dataset_for_missing_videos(dataset, column: str = "messages",
                                     raise_error: bool = True,
                                     checked: Optional[set] = None):
    """Pre-training validation that every local video path referenced in a
    chat dataset exists (reference: unsloth/models/vision.py:2435
    check_dataset_for_missing_videos — a decoder given a missing path
    yields an empty tensor and the model silently trains with no video
    signal while loss still falls).

    Accepts a map-style dataset / list of example dicts; scans `column`
    plus the standard chat columns for message lists, collects `type:
    "video"` content items, and checks their local paths. Returns the
    list of missing paths; raises FileNotFoundError when `raise_error`.
    `checked` is an optional cross-call cache of known-good paths."""
    import os
    import warnings

    try:
        from datasets import IterableDataset

        if isinstance(dataset, IterableDataset):
            warnings.warn(
                "check_dataset_for_missing_videos: streaming "
                "IterableDataset would be exhausted by validation; "
                "skipping — pass a map-style Dataset.", stacklevel=2)
            return []
    except ImportError:
        pass

    def message_lists(example):
        looks = lambda v: isinstance(v, (list, tuple)) and v and all(  # noqa: E731
            isinstance(m, dict) and "role" in m for m in v)
        if looks(example):
            yield example
            return
        if not isinstance(example, dict):
            return
        for key in dict.fromkeys(
                (column, "messages", "conversations", "prompt",
                 "completion")):
            if looks(example.get(key)):
                yield example[key]

    if checked is None:
        checked = set()
    missing, seen_missing = [], set()
    for example in dataset:
        for messages in message_lists(example):
            for msg in messages:
                content = msg.get("content", [])
                if not isinstance(content, (list, tuple)):
                    continue
                for item in content:
                    if not (isinstance(item, dict)
                            and item.get("type") == "video"):
                        continue
                    value = item.get("video", "")
                    if not isinstance(value, str) or not value:
                        continue
                    path = _local_video_path(value)
                    if (path is None or path in checked
                            or path in seen_missing):
                        continue
                    if os.path.isfile(path):
                        checked.add(path)
                    else:
                        seen_missing.add(path)
                        missing.append(path)
    if missing:
        msg = (f"{len(missing)} video file(s) referenced in the dataset "
               "do not exist — training would silently receive empty "
               "video tensors:\n" + "\n".join(f"  - {p}" for p in missing))
        if raise_error:
            raise FileNotFoundError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
    return missing
