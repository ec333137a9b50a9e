"""Qwen3-VL: ViT with interpolated position embeddings + DeepStack.

Parity target: HF Qwen3VLForConditionalGeneration (the reference catalogs
qwen3-vl repos in mapper.py). Vision side (HF Qwen3VLVisionModel):

  * linear patch embed over (Tp, P, P) voxels + BILINEARLY INTERPOLATED
    learned position embeddings (a num_grid_per_side^2 table sampled at
    the image grid — host-side static indices/weights);
  * biased-LayerNorm ViT blocks, fused qkv, gelu-tanh MLP, 2-D rope,
    per-frame full attention (no windows);
  * a patch merger (2x2 concat -> LN -> fc/gelu/fc) for the final tokens
    AND one merger per `deepstack_visual_indexes` entry producing extra
    feature sets from intermediate layers.

Text side: qwen3 (per-head qk-norm) with channel-INTERLEAVED M-RoPE, and
the DeepStack features added at the visual positions after each of the
first N decoder layers (decoder.forward's `deepstack_embeds`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rope import apply_rope_qk


@dataclasses.dataclass(frozen=True)
class Qwen3VisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    out_hidden_size: int = 3584
    num_heads: int = 16
    depth: int = 27
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    num_position_embeddings: int = 2304
    deepstack_visual_indexes: Tuple[int, ...] = (8, 16, 24)
    in_channels: int = 3
    hidden_act: str = "gelu_tanh"
    eps: float = 1e-6  # LayerNorms are hardcoded eps=1e-6 in HF

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def grid_side(self) -> int:
        return int(self.num_position_embeddings ** 0.5)

    @classmethod
    def from_hf(cls, hf: Dict[str, Any]) -> "Qwen3VisionConfig":
        act = hf.get("hidden_act", "gelu_pytorch_tanh")
        return cls(
            hidden_size=int(hf.get("hidden_size", 1152)),
            intermediate_size=int(hf.get("intermediate_size", 4304)),
            out_hidden_size=int(hf.get("out_hidden_size", 3584)),
            num_heads=int(hf.get("num_heads", 16)),
            depth=int(hf.get("depth", 27)),
            patch_size=int(hf.get("patch_size", 16)),
            temporal_patch_size=int(hf.get("temporal_patch_size", 2)),
            spatial_merge_size=int(hf.get("spatial_merge_size", 2)),
            num_position_embeddings=int(
                hf.get("num_position_embeddings", 2304)),
            deepstack_visual_indexes=tuple(
                hf.get("deepstack_visual_indexes", (8, 16, 24))),
            in_channels=int(hf.get("in_channels", 3)),
            hidden_act={"gelu_pytorch_tanh": "gelu_tanh"}.get(act, act),
        )


def _pos_embed_weights(grid_thw, cfg: Qwen3VisionConfig):
    """Host-side bilinear sampling of the learned position grid (HF
    fast_pos_embed_interpolate): returns (idx [4, S_raster], w [4,
    S_raster]) plus the merged-traversal permutation per image."""
    side = cfg.grid_side
    m = cfg.spatial_merge_size
    idxs = [[] for _ in range(4)]
    ws = [[] for _ in range(4)]
    perm_chunks = []
    offset = 0
    for t, h, w in grid_thw:
        hi = np.linspace(0, side - 1, h)
        wi = np.linspace(0, side - 1, w)
        hf_, wf_ = hi.astype(np.int64), wi.astype(np.int64)
        hc = np.clip(hf_ + 1, None, side - 1)
        wc = np.clip(wf_ + 1, None, side - 1)
        dh, dw = hi - hf_, wi - wf_
        for k, (bh, bw, wgt) in enumerate([
                (hf_, wf_, np.outer(1 - dh, 1 - dw)),
                (hf_, wc, np.outer(1 - dh, dw)),
                (hc, wf_, np.outer(dh, 1 - dw)),
                (hc, wc, np.outer(dh, dw))]):
            idxs[k].extend((bh[:, None] * side + bw[None, :])
                           .reshape(-1).tolist())
            ws[k].extend(wgt.reshape(-1).tolist())
        # raster -> merged-cell traversal, repeated per frame
        raster = np.arange(h * w).reshape(h // m, m, w // m, m)
        raster = raster.transpose(0, 2, 1, 3).reshape(-1)
        for _ in range(t):
            perm_chunks.append(raster + offset)
        offset += h * w
    return (np.asarray(idxs, np.int64), np.asarray(ws, np.float32),
            np.concatenate(perm_chunks))


def qwen3_vision_forward(vision: Dict[str, Any],
                         pixel_patches: jnp.ndarray,
                         grid_thw: Sequence[Tuple[int, int, int]],
                         cfg: Qwen3VisionConfig):
    """pixel_patches [S, C*Tp*P*P] (processor layout, merged traversal)
    + static grid -> (tokens [S/unit, out_hidden],
    deepstack [n, S/unit, out_hidden])."""
    from ..ops.rms_norm import layer_norm_ref

    grid_thw = tuple(tuple(int(v) for v in g) for g in grid_thw)
    unit = cfg.spatial_merge_size ** 2
    s = pixel_patches.shape[0]
    nh, dh = cfg.num_heads, cfg.head_dim
    eps = cfg.eps

    x = jnp.dot(pixel_patches, vision["patch_embed"]["kernel"]) \
        + vision["patch_embed"]["bias"]

    # interpolated pos embeds (one frame per image, raster order),
    # permuted into merged traversal and repeated across frames
    idx, wgt, perm = _pos_embed_weights(grid_thw, cfg)
    pe = vision["pos_embed"][jnp.asarray(idx)]          # [4, Sr, H]
    pe = jnp.sum(pe * jnp.asarray(wgt)[:, :, None], axis=0)
    x = x + pe[jnp.asarray(perm)].astype(x.dtype)

    # 2-D rope over (h, w) in merged traversal (same scheme as qwen2.5)
    from .qwen_vl import rot_pos_ids

    class _C:  # rot_pos_ids only reads spatial_merge_size
        spatial_merge_size = cfg.spatial_merge_size

    pos2d = rot_pos_ids(grid_thw, _C)                   # [S, 2]
    inv = 1.0 / (10000.0 ** (np.arange(0, dh // 4) / (dh // 4)))
    freqs = (pos2d[:, :, None] * inv[None, None, :]).reshape(s, -1)
    cos = jnp.asarray(np.cos(freqs), jnp.float32)
    sin = jnp.asarray(np.sin(freqs), jnp.float32)

    # per-frame full attention (HF cu_seqlens: h*w repeated t times)
    frame_sizes = [g[1] * g[2] for g in grid_thw for _ in range(g[0])]
    seg = jnp.asarray(np.repeat(np.arange(len(frame_sizes)),
                                frame_sizes).astype(np.int32))

    def attn(h_in, layer):
        qkv = jnp.dot(h_in, layer["qkv"]["kernel"]) + layer["qkv"]["bias"]
        qkv = qkv.reshape(s, 3, nh, dh)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q, k = apply_rope_qk(q[None], k[None], cos[None], sin[None])
        q, k = q[0].astype(jnp.float32), k[0].astype(jnp.float32)
        scores = jnp.einsum("shd,zhd->hsz", q, k) * (dh ** -0.5)
        mask = seg[:, None] == seg[None, :]
        scores = jnp.where(mask[None], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, -1).astype(h_in.dtype)
        out = jnp.einsum("hsz,zhd->shd", probs, v).reshape(s, -1)
        return jnp.dot(out, layer["proj"]["kernel"]) \
            + layer["proj"]["bias"]

    from ..ops.activations import act_for

    act = act_for(cfg.hidden_act)

    def merger(m, h_in):
        """2x2-cell concat -> LN -> fc1/gelu/fc2 (HF
        Qwen3VLVisionPatchMerger; prenorm on hidden unless postshuffle)."""
        if m["postshuffle"]:
            u = h_in.reshape(-1, unit * cfg.hidden_size)
            u = layer_norm_ref(u, m["ln"]["w"], m["ln"]["b"], eps)
        else:
            u = layer_norm_ref(h_in, m["ln"]["w"], m["ln"]["b"], eps)
            u = u.reshape(-1, unit * cfg.hidden_size)
        u = jnp.dot(u, m["fc1"]["kernel"]) + m["fc1"]["bias"]
        u = jax.nn.gelu(u.astype(jnp.float32), approximate=False).astype(
            u.dtype)
        return jnp.dot(u, m["fc2"]["kernel"]) + m["fc2"]["bias"]

    deepstack = []
    for i, layer in enumerate(vision["layers"]):
        h = layer_norm_ref(x, layer["norm1"]["w"], layer["norm1"]["b"],
                           eps)
        x = x + attn(h, layer)
        h = layer_norm_ref(x, layer["norm2"]["w"], layer["norm2"]["b"],
                           eps)
        h = jnp.dot(h, layer["fc1"]["kernel"]) + layer["fc1"]["bias"]
        h = act(h)
        x = x + jnp.dot(h, layer["fc2"]["kernel"]) + layer["fc2"]["bias"]
        if i in cfg.deepstack_visual_indexes:
            j = cfg.deepstack_visual_indexes.index(i)
            deepstack.append(merger(vision["deepstack_mergers"][j], x))

    tokens = merger(vision["merger"], x)
    return tokens, jnp.stack(deepstack) if deepstack else None


def load_qwen3_vision_params(reader, cfg: Qwen3VisionConfig, dtype):
    from .hf_loader import _to_jnp

    prefixes = ("model.visual.", "visual.")
    prefix = None
    for p in prefixes:
        if p + "patch_embed.proj.weight" in reader:
            prefix = p
            break
    assert prefix, "no qwen3-vl vision tower in checkpoint"

    def get(name):
        return _to_jnp(reader.get(prefix + name), dtype)

    conv = get("patch_embed.proj.weight")   # [H, C, Tp, P, P]
    vision = {
        "patch_embed": {"kernel": conv.reshape(conv.shape[0], -1).T,
                        "bias": get("patch_embed.proj.bias")},
        "pos_embed": get("pos_embed.weight"),
        "layers": [],
    }

    def lin(base):
        return {"kernel": get(base + ".weight").T,
                "bias": get(base + ".bias")}

    def ln(base):
        return {"w": get(base + ".weight"), "b": get(base + ".bias")}

    for i in range(cfg.depth):
        p = f"blocks.{i}."
        vision["layers"].append({
            "norm1": ln(p + "norm1"),
            "norm2": ln(p + "norm2"),
            "qkv": lin(p + "attn.qkv"),
            "proj": lin(p + "attn.proj"),
            "fc1": lin(p + "mlp.linear_fc1"),
            "fc2": lin(p + "mlp.linear_fc2"),
        })

    def load_merger(base, postshuffle):
        return {
            "postshuffle": postshuffle,
            "ln": ln(base + ".norm"),
            "fc1": lin(base + ".linear_fc1"),
            "fc2": lin(base + ".linear_fc2"),
        }

    vision["merger"] = load_merger("merger", False)
    vision["deepstack_mergers"] = [
        load_merger(f"deepstack_merger_list.{j}", True)
        for j in range(len(cfg.deepstack_visual_indexes))]
    return vision
