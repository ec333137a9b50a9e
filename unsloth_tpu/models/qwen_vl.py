"""Qwen2.5-VL: windowed vision transformer + M-RoPE text integration.

Parity target: the reference fine-tunes Qwen2.5-VL through FastVisionModel
(reference: models/vision.py; the driver's vision bench config). Semantics
follow the public Qwen2.5-VL architecture as implemented in HF transformers
(parity-tested against it in tests/test_qwen_vl.py):

  * patch embedding over (temporal=2, 14, 14) patch voxels (a conv that is
    a matmul over flattened patches);
  * 2-D rotary embeddings per (h, w) patch position;
  * windowed attention (8x8 merged-cell windows) on most layers with a few
    full-attention layers — both are SEGMENT-ID attention here: window ids
    or image ids become segments, bidirectional within a segment;
  * 2x2 spatial merger MLP producing LLM-space tokens;
  * M-RoPE in the text model: temporal/height/width position streams
    select rope channels by mrope_section.

The window permutation / cu_seqlens bookkeeping is host-side numpy on the
STATIC image grid (grid_thw) — it parameterizes the compiled program, it
does not run on device.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rms_norm import rms_norm
from ..ops.rope import apply_rope_qk


@dataclasses.dataclass(frozen=True)
class QwenVisionConfig:
    hidden_size: int = 1280
    out_hidden_size: int = 3584
    intermediate_size: int = 3420
    num_heads: int = 16
    depth: int = 32
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    in_channels: int = 3
    eps: float = 1e-6
    # qwen2-vl (2.0) ViT: LayerNorm (w/ bias), plain fc1/act/fc2 MLP with
    # quick-gelu, NO windowed attention (every block attends per image)
    windowed: bool = True
    norm: str = "rms"            # "rms" (2.5) | "ln" (2.0)
    gated_mlp: bool = True       # False: fc1/act/fc2 (2.0)
    act: str = "silu"            # 2.0: "quick_gelu"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size ** 2

    @classmethod
    def from_hf(cls, hf: Dict[str, Any]) -> "QwenVisionConfig":
        if "embed_dim" in hf:  # qwen2-vl (2.0) vision config
            embed = int(hf["embed_dim"])
            return cls(
                hidden_size=embed,
                out_hidden_size=int(hf.get("hidden_size", 3584)),
                intermediate_size=int(embed * float(
                    hf.get("mlp_ratio", 4.0))),
                num_heads=int(hf.get("num_heads", 16)),
                depth=int(hf.get("depth", 32)),
                patch_size=int(hf.get("patch_size", 14)),
                temporal_patch_size=int(hf.get("temporal_patch_size", 2)),
                spatial_merge_size=int(hf.get("spatial_merge_size", 2)),
                in_channels=int(hf.get("in_channels",
                                       hf.get("in_chans", 3))),
                windowed=False, norm="ln", gated_mlp=False,
                act=hf.get("hidden_act", "quick_gelu"),
            )
        return cls(
            hidden_size=int(hf.get("hidden_size", 1280)),
            out_hidden_size=int(hf.get("out_hidden_size", 3584)),
            intermediate_size=int(hf.get("intermediate_size", 3420)),
            num_heads=int(hf.get("num_heads", 16)),
            depth=int(hf.get("depth", 32)),
            patch_size=int(hf.get("patch_size", 14)),
            temporal_patch_size=int(hf.get("temporal_patch_size", 2)),
            spatial_merge_size=int(hf.get("spatial_merge_size", 2)),
            window_size=int(hf.get("window_size", 112)),
            fullatt_block_indexes=tuple(hf.get("fullatt_block_indexes",
                                               (7, 15, 23, 31))),
            in_channels=int(hf.get("in_channels", hf.get("in_chans", 3))),
        )


# ---------------------------------------------------------------------------
# Host-side (static) index computation
# ---------------------------------------------------------------------------

def window_layout(grid_thw: Sequence[Tuple[int, int, int]],
                  cfg: QwenVisionConfig):
    """Returns (window_index [S/unit], window_seg [S], image_seg [S]) as
    numpy. window_index permutes merged cells into window order;
    window_seg/image_seg are segment ids in the PERMUTED patch order."""
    merge = cfg.spatial_merge_size
    unit = cfg.merge_unit
    win_cells = cfg.window_size // merge // cfg.patch_size

    index_chunks = []
    win_sizes: List[int] = []       # cells per window, permuted order
    img_sizes_cells: List[int] = []
    offset = 0
    for t, h, w in grid_thw:
        lh, lw = h // merge, w // merge
        idx = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % win_cells
        pad_w = (-lw) % win_cells
        nh = (lh + pad_h) // win_cells
        nw = (lw + pad_w) // win_cells
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        padded[:, :lh, :lw] = idx
        padded = padded.reshape(t, nh, win_cells, nw, win_cells)
        padded = padded.transpose(0, 1, 3, 2, 4).reshape(
            t, nh * nw, win_cells, win_cells)
        sizes = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        flat = flat[flat != -100]
        index_chunks.append(flat + offset)
        win_sizes.extend(int(s) for s in sizes if s > 0)
        img_sizes_cells.append(t * lh * lw)
        offset += t * lh * lw
    window_index = np.concatenate(index_chunks)

    # segment ids per PATCH in permuted order
    window_seg = np.repeat(np.arange(len(win_sizes)),
                           np.asarray(win_sizes) * unit).astype(np.int32)
    image_seg_cells = np.repeat(np.arange(len(img_sizes_cells)),
                                img_sizes_cells)
    image_seg_cells = image_seg_cells[window_index]   # permute cell order
    image_seg = np.repeat(image_seg_cells, unit).astype(np.int32)
    return window_index, window_seg, image_seg


def rot_pos_ids(grid_thw: Sequence[Tuple[int, int, int]],
                cfg: QwenVisionConfig) -> np.ndarray:
    """(h, w) position ids per patch in the merged-cell traversal order
    (pre-permutation), [S, 2]."""
    merge = cfg.spatial_merge_size
    out = []
    for t, h, w in grid_thw:
        hpos = np.arange(h)[:, None].repeat(w, 1)
        hpos = hpos.reshape(h // merge, merge, w // merge, merge)
        hpos = hpos.transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.arange(w)[None, :].repeat(h, 0)
        wpos = wpos.reshape(h // merge, merge, w // merge, merge)
        wpos = wpos.transpose(0, 2, 1, 3).reshape(-1)
        pos = np.stack([hpos, wpos], -1)
        out.append(np.tile(pos, (t, 1)))
    return np.concatenate(out)


# ---------------------------------------------------------------------------
# Vision forward
# ---------------------------------------------------------------------------

def _vis_attention(x, layer, cfg: QwenVisionConfig, cos, sin, seg):
    """x [S, H]; segment-bidirectional attention."""
    s, hdim = x.shape
    heads, dh = cfg.num_heads, cfg.head_dim
    qkv = jnp.dot(x, layer["qkv"]["kernel"]) + layer["qkv"]["bias"]
    qkv = qkv.reshape(s, 3, heads, dh)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]          # [S, heads, dh]
    q, k = apply_rope_qk(q[None], k[None], cos[None], sin[None])
    q, k = q[0].astype(jnp.float32), k[0].astype(jnp.float32)
    scores = jnp.einsum("shd,zhd->hsz", q, k) * (dh ** -0.5)
    mask = seg[:, None] == seg[None, :]
    scores = jnp.where(mask[None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, -1).astype(x.dtype)
    out = jnp.einsum("hsz,zhd->shd", probs, v).reshape(s, hdim)
    return jnp.dot(out, layer["out"]["kernel"]) + layer["out"]["bias"]


def qwen_vision_forward(vision: Dict[str, Any], pixel_patches: jnp.ndarray,
                        grid_thw: Sequence[Tuple[int, int, int]],
                        cfg: QwenVisionConfig) -> jnp.ndarray:
    """pixel_patches [S, C*Tp*P*P] (HF processor layout) + static grid ->
    LLM-space image tokens [S/merge_unit, out_hidden] in original order."""
    grid_thw = tuple(tuple(int(v) for v in g) for g in grid_thw)
    unit = cfg.merge_unit
    s = pixel_patches.shape[0]

    x = jnp.dot(pixel_patches.astype(jnp.float32),
                vision["patch_embed"]["kernel"])
    if vision["patch_embed"].get("bias") is not None:
        x = x + vision["patch_embed"]["bias"]
    x = x.astype(pixel_patches.dtype)

    if cfg.windowed:
        window_index, window_seg, image_seg = window_layout(grid_thw, cfg)
    else:
        # qwen2-vl: no windows — identity cell order, per-image segments
        cells = [t * (h // cfg.spatial_merge_size)
                 * (w // cfg.spatial_merge_size) for t, h, w in grid_thw]
        window_index = np.arange(sum(cells))
        window_seg = np.zeros(sum(cells) * unit, np.int32)  # unused
        image_seg = np.repeat(np.repeat(np.arange(len(cells)), cells),
                              unit).astype(np.int32)
    pos2d = rot_pos_ids(grid_thw, cfg)                 # [S, 2]

    # half-dim rope table: h positions drive the first hd/4 channels,
    # w positions the next hd/4
    inv = 1.0 / (10000.0 ** (np.arange(0, cfg.head_dim // 4)
                             / (cfg.head_dim // 4)))
    freqs = pos2d[:, :, None] * inv[None, None, :]     # [S, 2, hd/4]
    freqs = freqs.reshape(s, -1)                       # [S, hd/2]
    cos = jnp.asarray(np.cos(freqs), jnp.float32)
    sin = jnp.asarray(np.sin(freqs), jnp.float32)

    # permute patches (and their rope tables) into window order
    perm = (window_index[:, None] * unit
            + np.arange(unit)[None, :]).reshape(-1)
    x = x[perm]
    cos = cos[perm]
    sin = sin[perm]
    win_seg = jnp.asarray(window_seg)
    img_seg = jnp.asarray(image_seg)

    def norm(u, w):
        if cfg.norm == "ln":
            from ..ops.rms_norm import layer_norm_ref

            return layer_norm_ref(u, w["w"], w["b"], cfg.eps)
        return rms_norm(u, w, cfg.eps)

    def mlp(h, layer):
        if not cfg.gated_mlp:
            # qwen2-vl VisionMlp: fc1 -> act -> fc2
            u = jnp.dot(h, layer["fc1"]["kernel"]) + layer["fc1"]["bias"]
            uf = u.astype(jnp.float32)
            if cfg.act == "quick_gelu":
                uf = uf * jax.nn.sigmoid(1.702 * uf)
            else:
                uf = jax.nn.gelu(uf, approximate=False)
            u = uf.astype(h.dtype)
            return jnp.dot(u, layer["fc2"]["kernel"]) \
                + layer["fc2"]["bias"]
        gate = jnp.dot(h, layer["gate"]["kernel"]) + layer["gate"]["bias"]
        up = jnp.dot(h, layer["up"]["kernel"]) + layer["up"]["bias"]
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype) * up
        return jnp.dot(act, layer["down"]["kernel"]) \
            + layer["down"]["bias"]

    for i, layer in enumerate(vision["layers"]):
        if not cfg.windowed:
            seg = img_seg
        else:
            seg = img_seg if i in cfg.fullatt_block_indexes else win_seg
        h = norm(x, layer["norm1"])
        x = x + _vis_attention(h, layer, cfg, cos, sin, seg)
        h = norm(x, layer["norm2"])
        x = x + mlp(h, layer)

    # merger: norm then 2x2 cell concat -> MLP
    x = norm(x, vision["merger"]["ln_q"])
    x = x.reshape(-1, unit * cfg.hidden_size)
    x = jnp.dot(x, vision["merger"]["fc1"]["kernel"]) \
        + vision["merger"]["fc1"]["bias"]
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(
        x.dtype)
    x = jnp.dot(x, vision["merger"]["fc2"]["kernel"]) \
        + vision["merger"]["fc2"]["bias"]

    # restore original cell order
    reverse = np.argsort(window_index)
    return x[jnp.asarray(reverse)]


# ---------------------------------------------------------------------------
# M-RoPE position computation (text side, host-side per example)
# ---------------------------------------------------------------------------

def mrope_positions_for(input_ids: np.ndarray, image_token_id: int,
                        grid_thw: Sequence[Tuple[int, int, int]],
                        merge: int = 2) -> np.ndarray:
    """[T] token ids -> [3, T] (t, h, w) positions (HF get_rope_index
    semantics for interleaved text/images; each image occupies
    t*(h/merge)*(w/merge) consecutive image tokens)."""
    t_len = len(input_ids)
    out = np.zeros((3, t_len), np.int32)
    img_i = 0
    pos = 0          # running position value
    i = 0
    while i < t_len:
        if input_ids[i] == image_token_id:
            t, h, w = grid_thw[img_i]
            lh, lw = h // merge, w // merge
            n = t * lh * lw
            tt = np.repeat(np.arange(t), lh * lw)
            hh = np.tile(np.repeat(np.arange(lh), lw), t)
            ww = np.tile(np.tile(np.arange(lw), lh), t)
            out[0, i:i + n] = pos + tt
            out[1, i:i + n] = pos + hh
            out[2, i:i + n] = pos + ww
            pos = pos + max(t, lh, lw)
            img_i += 1
            i += n
        else:
            out[:, i] = pos
            pos += 1
            i += 1
    return out


# ---------------------------------------------------------------------------
# Checkpoint loading
# ---------------------------------------------------------------------------

def load_qwen_vision_params(reader, cfg: QwenVisionConfig, dtype):
    from .hf_loader import _to_jnp

    prefixes = ("model.visual.", "visual.")
    prefix = None
    for p in prefixes:
        if p + "patch_embed.proj.weight" in reader:
            prefix = p
            break
    assert prefix, "no qwen2.5-vl vision tower in checkpoint"

    def get(name):
        return _to_jnp(reader.get(prefix + name), dtype)

    def has(name):
        return (prefix + name) in reader

    ln = cfg.norm == "ln"
    conv = get("patch_embed.proj.weight")   # [H, C, Tp, P, P]
    kernel = conv.reshape(conv.shape[0], -1).T
    vision = {
        "patch_embed": {
            "kernel": kernel,
            "bias": get("patch_embed.proj.bias")
            if has("patch_embed.proj.bias") else None,
        },
        "merger": {
            "ln_q": {"w": get("merger.ln_q.weight"),
                     "b": get("merger.ln_q.bias")} if ln
            else get("merger.ln_q.weight"),
            "fc1": {"kernel": get("merger.mlp.0.weight").T,
                    "bias": get("merger.mlp.0.bias")},
            "fc2": {"kernel": get("merger.mlp.2.weight").T,
                    "bias": get("merger.mlp.2.bias")},
        },
        "layers": [],
    }
    for i in range(cfg.depth):
        p = f"blocks.{i}."

        def lin(stem):
            return {"kernel": get(p + stem + ".weight").T,
                    "bias": get(p + stem + ".bias")}

        def nrm(stem):
            if ln:
                return {"w": get(p + stem + ".weight"),
                        "b": get(p + stem + ".bias")}
            return get(p + stem + ".weight")

        layer = {
            "norm1": nrm("norm1"),
            "norm2": nrm("norm2"),
            "qkv": lin("attn.qkv"),
            "out": lin("attn.proj"),
        }
        if cfg.gated_mlp:
            layer.update(gate=lin("mlp.gate_proj"), up=lin("mlp.up_proj"),
                         down=lin("mlp.down_proj"))
        else:
            layer.update(fc1=lin("mlp.fc1"), fc2=lin("mlp.fc2"))
        vision["layers"].append(layer)
    return vision
