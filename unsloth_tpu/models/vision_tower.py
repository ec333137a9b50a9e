"""SigLIP vision tower + Gemma-3 multimodal projector (functional).

Parity target: the reference's vision path loads HF vision towers as torch
modules (reference: models/vision.py FastBaseModel — VLM processor
selection :963-972, vision-layer finetuning selectors :1827). Here the
tower is a functional JAX program mirroring transformers'
SiglipVisionModel + Gemma3MultiModalProjector semantics exactly (parity
test vs transformers in tests/test_vision.py).

Param tree schema:

  vision = {
    "patch_embed": {"kernel": [P*P*C, H], "bias": [H]},   # conv as matmul
    "pos_embed": [nP, H],
    "layers": [{"ln1": {w,b}, "ln2": {w,b},
                "q","k","v","out": {"kernel": [H,H] (in->out), "bias"}},
               ...],
    "post_ln": {w, b},
  }
  projector = {"mm_norm": [H_vit], "mm_proj": [H_vit, H_text]}
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.rms_norm import layer_norm_ref, rms_norm


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_layers: int = 27
    num_heads: int = 16
    image_size: int = 896
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu_tanh"

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.patches_per_side ** 2

    @classmethod
    def from_hf(cls, hf: Dict[str, Any]) -> "VisionConfig":
        return cls(
            hidden_size=int(hf.get("hidden_size", 1152)),
            intermediate_size=int(hf.get("intermediate_size", 4304)),
            num_layers=int(hf.get("num_hidden_layers", 27)),
            num_heads=int(hf.get("num_attention_heads", 16)),
            image_size=int(hf.get("image_size", 896)),
            patch_size=int(hf.get("patch_size", 14)),
            layer_norm_eps=float(hf.get("layer_norm_eps", 1e-6)),
            hidden_act=hf.get("hidden_act", "gelu_pytorch_tanh"),
        )


def extract_patches(pixel_values: jnp.ndarray, patch_size: int
                    ) -> jnp.ndarray:
    """[B, C, H, W] -> [B, nP, C*P*P] with (C, ph, pw) flattening order —
    matching an HF conv2d patch embedding's [out, C, kh, kw] kernel."""
    b, c, h, w = pixel_values.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = pixel_values.reshape(b, c, gh, p, gw, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)        # [B, gh, gw, C, p, p]
    return x.reshape(b, gh * gw, c * p * p)


def _attn(x, layer, num_heads, eps):
    b, t, h = x.shape
    dh = h // num_heads

    def proj(p, v):
        return jnp.dot(v, p["kernel"]) + p["bias"]

    q = proj(layer["q"], x).reshape(b, t, num_heads, dh)
    k = proj(layer["k"], x).reshape(b, t, num_heads, dh)
    v = proj(layer["v"], x).reshape(b, t, num_heads, dh)
    scores = jnp.einsum("bthd,bshd->bhts", q, k) * (dh ** -0.5)
    probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, h)
    return proj(layer["out"], out)


def siglip_forward(vision: Dict[str, Any], pixel_values: jnp.ndarray,
                   cfg: VisionConfig, apply_post_ln: bool = True
                   ) -> jnp.ndarray:
    """pixel_values [B, C, H, W] (normalized) -> [B, nP, hidden].
    apply_post_ln=False returns hidden_states[-1] (aya-vision's
    vision_feature_layer=-1 skips post_layernorm)."""
    patches = extract_patches(pixel_values, cfg.patch_size)
    x = jnp.dot(patches, vision["patch_embed"]["kernel"]) \
        + vision["patch_embed"]["bias"]
    x = x + vision["pos_embed"][None]
    eps = cfg.layer_norm_eps
    for layer in vision["layers"]:
        h = layer_norm_ref(x, layer["ln1"]["w"], layer["ln1"]["b"], eps)
        x = x + _attn(h, layer, cfg.num_heads, eps)
        h = layer_norm_ref(x, layer["ln2"]["w"], layer["ln2"]["b"], eps)
        h = jnp.dot(h, layer["fc1"]["kernel"]) + layer["fc1"]["bias"]
        h = jax.nn.gelu(h, approximate=True)
        h = jnp.dot(h, layer["fc2"]["kernel"]) + layer["fc2"]["bias"]
        x = x + h
    if not apply_post_ln:
        return x
    return layer_norm_ref(x, vision["post_ln"]["w"], vision["post_ln"]["b"],
                          eps)


def aya_project(projector: Dict[str, Any], vision_out: jnp.ndarray,
                downsample: int, eps: float) -> jnp.ndarray:
    """[B, nP, H_vit] -> [B, nP/ds^2, D_text] (HF
    AyaVisionMultiModalProjector): pixel-shuffle downsample, LayerNorm,
    linear_1 -> SwiGLU (x, gate halves; silu(gate)*x) -> linear_2."""
    b, s, d = vision_out.shape
    side = int(round(s ** 0.5))
    # exact HF pixel_shuffle permute/reshape sequence
    x = vision_out.reshape(b, side, side, d)
    x = x.reshape(b, side, side // downsample, d * downsample)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(b, side // downsample, side // downsample,
                  d * downsample * downsample)
    x = x.transpose(0, 2, 1, 3)
    x = layer_norm_ref(x, projector["ln"]["w"], projector["ln"]["b"], eps)
    h = jnp.dot(x, projector["linear_1"]["kernel"]) \
        + projector["linear_1"]["bias"]
    u, gate = jnp.split(h, 2, axis=-1)
    h = jax.nn.silu(gate.astype(jnp.float32)).astype(u.dtype) * u
    h = jnp.dot(h, projector["linear_2"]["kernel"]) \
        + projector["linear_2"]["bias"]
    return h.reshape(b, -1, h.shape[-1])


@dataclasses.dataclass(frozen=True)
class PixtralVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    image_size: int = 1024
    patch_size: int = 16
    rope_theta: float = 10000.0
    hidden_act: str = "gelu"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def from_hf(cls, hf: Dict[str, Any]) -> "PixtralVisionConfig":
        return cls(
            hidden_size=int(hf.get("hidden_size", 1024)),
            intermediate_size=int(hf.get("intermediate_size", 4096)),
            num_layers=int(hf.get("num_hidden_layers", 24)),
            num_heads=int(hf.get("num_attention_heads", 16)),
            image_size=int(hf.get("image_size", 1024)),
            patch_size=int(hf.get("patch_size", 16)),
            rope_theta=float(hf.get("rope_theta", 10000.0)),
            hidden_act=hf.get("hidden_act", "gelu"),
        )


def _pixtral_rope(cfg: PixtralVisionConfig, n_side: int):
    """cos/sin [nP, head_dim] for a full n_side x n_side grid (HF
    PixtralRotaryEmbedding: h positions drive the even freq channels, w
    the odd ones; table duplicated for the rotate-half convention)."""
    import numpy as np

    dim = cfg.head_dim
    freqs = 1.0 / (cfg.rope_theta ** (np.arange(0, dim, 2) / dim))
    h = np.arange(n_side)
    fh = np.outer(h, freqs[::2])                       # [side, dim/4]
    fw = np.outer(h, freqs[1::2])
    inv = np.concatenate([
        np.repeat(fh[:, None, :], n_side, 1),
        np.repeat(fw[None, :, :], n_side, 0)], -1).reshape(-1, dim // 2)
    # apply_rope takes HALF-dim tables (rotate-half convention)
    return (jnp.asarray(np.cos(inv), jnp.float32),
            jnp.asarray(np.sin(inv), jnp.float32))


def pixtral_forward(vision: Dict[str, Any], pixel_values: jnp.ndarray,
                    cfg: PixtralVisionConfig) -> jnp.ndarray:
    """Pixtral ViT (HF PixtralVisionModel) over same-size square images
    [B, C, H, W]: biasless patch conv, RMSNorm pre-norm, 2-D rope,
    block-diagonal (per-image) non-causal attention, gated-GLU MLP.
    Returns [B, nP, hidden] per image (HF packs images into one sequence
    with a block mask — identical math for equal-size images)."""
    from ..ops.rope import apply_rope_qk

    b, c, hh, ww = pixel_values.shape
    n_side = hh // cfg.patch_size
    patches = extract_patches(pixel_values, cfg.patch_size)
    x = jnp.dot(patches, vision["patch_embed"]["kernel"])
    x = rms_norm(x, vision["ln_pre"], 1e-5)            # eps hardcoded
    cos, sin = _pixtral_rope(cfg, n_side)
    nh, dh = cfg.num_heads, cfg.head_dim

    def attn(h, layer):
        t = h.shape[1]
        q = jnp.dot(h, layer["q"]["kernel"]).reshape(b, t, nh, dh)
        k = jnp.dot(h, layer["k"]["kernel"]).reshape(b, t, nh, dh)
        v = jnp.dot(h, layer["v"]["kernel"]).reshape(b, t, nh, dh)
        q, k = apply_rope_qk(q, k, cos[None], sin[None])
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * (dh ** -0.5)
        probs = jax.nn.softmax(scores, -1).astype(h.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, -1)
        return jnp.dot(out, layer["out"]["kernel"])

    from ..ops.activations import act_for

    act = act_for(cfg.hidden_act)
    for layer in vision["layers"]:
        h = rms_norm(x, layer["attention_norm"], 1e-5)
        x = x + attn(h, layer)
        h = rms_norm(x, layer["ffn_norm"], 1e-5)
        gate = jnp.dot(h, layer["gate"]["kernel"])
        up = jnp.dot(h, layer["up"]["kernel"])
        x = x + jnp.dot(act(gate) * up, layer["down"]["kernel"])
    return x


def mistral3_project(projector: Dict[str, Any], vision_out: jnp.ndarray,
                     n_side: int, merge: int, rms_eps: float
                     ) -> jnp.ndarray:
    """[B, nP, H_vit] -> [B, nP/merge^2, D_text] (HF
    Mistral3MultiModalProjector: RMSNorm, 2x2 unfold concat + linear
    merger, then linear/gelu/linear)."""
    b, n_p, d = vision_out.shape
    x = rms_norm(vision_out, projector["norm"], rms_eps)
    x = x.reshape(b, n_side // merge, merge, n_side // merge, merge, d)
    # torch unfold channel-major order: [d, kh, kw] fastest-last
    x = x.transpose(0, 1, 3, 5, 2, 4).reshape(
        b, (n_side // merge) ** 2, d * merge * merge)
    x = jnp.dot(x, projector["merger"]["kernel"])
    x = jnp.dot(x, projector["linear_1"]["kernel"])
    if projector["linear_1"].get("bias") is not None:
        x = x + projector["linear_1"]["bias"]
    x = jax.nn.gelu(x, approximate=False)
    x = jnp.dot(x, projector["linear_2"]["kernel"])
    if projector["linear_2"].get("bias") is not None:
        x = x + projector["linear_2"]["bias"]
    return x


def clip_forward(vision: Dict[str, Any], pixel_values: jnp.ndarray,
                 cfg: VisionConfig, feature_layer: int = -2,
                 drop_cls: bool = True) -> jnp.ndarray:
    """CLIP ViT (llava-1.5 tower — HF CLIPVisionModel): CLS token +
    pre-layernorm + quick-gelu MLPs; returns hidden_states[feature_layer]
    (llava's vision_feature_layer=-2 stops BEFORE the last encoder layer
    and skips post_layernorm), optionally dropping the CLS position
    (vision_feature_select_strategy="default")."""
    b = pixel_values.shape[0]
    patches = extract_patches(pixel_values, cfg.patch_size)
    x = jnp.dot(patches, vision["patch_embed"]["kernel"])
    cls = jnp.broadcast_to(vision["class_embed"][None, None],
                           (b, 1, x.shape[-1])).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + vision["pos_embed"][None]
    eps = cfg.layer_norm_eps
    x = layer_norm_ref(x, vision["pre_ln"]["w"], vision["pre_ln"]["b"],
                       eps)

    n = len(vision["layers"])
    # hidden_states[i] = embeddings output after i layers; [-2] => n-1
    stop = n + 1 + feature_layer if feature_layer < 0 else feature_layer
    quick_gelu = lambda u: u * jax.nn.sigmoid(1.702 * u)  # noqa: E731
    for layer in vision["layers"][:stop]:
        h = layer_norm_ref(x, layer["ln1"]["w"], layer["ln1"]["b"], eps)
        x = x + _attn(h, layer, cfg.num_heads, eps)
        h = layer_norm_ref(x, layer["ln2"]["w"], layer["ln2"]["b"], eps)
        h = jnp.dot(h, layer["fc1"]["kernel"]) + layer["fc1"]["bias"]
        h = quick_gelu(h)
        h = jnp.dot(h, layer["fc2"]["kernel"]) + layer["fc2"]["bias"]
        x = x + h
    return x[:, 1:] if drop_cls else x


def llava_project(projector: Dict[str, Any], vision_out: jnp.ndarray
                  ) -> jnp.ndarray:
    """[B, nP, H_vit] -> [B, nP, H_text]: linear, gelu, linear (HF
    LlavaMultiModalProjector, projector_hidden_act="gelu")."""
    x = jnp.dot(vision_out, projector["linear_1"]["kernel"])
    if projector["linear_1"].get("bias") is not None:
        x = x + projector["linear_1"]["bias"]
    x = jax.nn.gelu(x, approximate=False)
    x = jnp.dot(x, projector["linear_2"]["kernel"])
    if projector["linear_2"].get("bias") is not None:
        x = x + projector["linear_2"]["bias"]
    return x


def gemma3_project(projector: Dict[str, Any], vision_out: jnp.ndarray,
                   cfg: VisionConfig, mm_tokens_per_image: int,
                   rms_eps: float = 1e-6) -> jnp.ndarray:
    """[B, nP, H_vit] -> [B, mm_tokens, H_text] — avg-pool the patch grid,
    Gemma-RMSNorm, then project (transformers Gemma3MultiModalProjector
    semantics)."""
    b, n_p, h = vision_out.shape
    side = cfg.patches_per_side
    tokens_side = int(round(mm_tokens_per_image ** 0.5))
    kernel = side // tokens_side
    x = vision_out.reshape(b, side, side, h)
    x = x.reshape(b, tokens_side, kernel, tokens_side, kernel, h)
    x = jnp.mean(x, axis=(2, 4))                      # [B, ts, ts, H]
    x = x.reshape(b, tokens_side * tokens_side, h)
    x = rms_norm(x, projector["mm_norm"], rms_eps, gemma=True)
    return jnp.dot(x, projector["mm_proj"])
