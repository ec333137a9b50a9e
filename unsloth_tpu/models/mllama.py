"""Llama-3.2-Vision (Mllama): gated two-stage ViT + cross-attention LM.

Parity target: the reference fine-tunes Llama-3.2-Vision through
FastVisionModel (reference: models/vision.py; "Llama-3.2-Vision
tiling/patchify" SURVEY §7 step 4). Semantics follow the public Mllama
architecture as implemented in HF transformers (parity-tested in
tests/test_mllama.py):

  * vision: per-tile patch conv + class token, gated positional embedding
    (pre/post tile embeddings selected by aspect-ratio id), 32-layer local
    transformer collecting intermediate states, 8-layer tanh-gated global
    transformer, output = concat(final, intermediates);
  * projector: linear to the text width; image features become
    cross-attention KV;
  * text: llama layers with interleaved cross-attention layers (q/k RMS
    norms, tanh-gated residuals).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import attention
from ..ops.lora import lora_matmul
from ..ops.rms_norm import layer_norm_ref, rms_norm
from ..ops.rope import apply_rope_qk, rope_inv_freq, rope_table
from .config import ModelConfig


@dataclasses.dataclass(frozen=True)
class MllamaVisionConfig:
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_global_layers: int = 8
    num_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    max_num_tiles: int = 4
    intermediate_layers_indices: Tuple[int, ...] = (3, 7, 15, 23, 30)
    norm_eps: float = 1e-5

    @property
    def patches_per_tile(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_patches(self) -> int:          # incl. class token
        return self.patches_per_tile + 1

    @property
    def output_dim(self) -> int:
        return self.hidden_size * (1 + len(self.intermediate_layers_indices))

    @classmethod
    def from_hf(cls, hf: Dict[str, Any]) -> "MllamaVisionConfig":
        return cls(
            hidden_size=int(hf.get("hidden_size", 1280)),
            intermediate_size=int(hf.get("intermediate_size", 5120)),
            num_layers=int(hf.get("num_hidden_layers", 32)),
            num_global_layers=int(hf.get("num_global_layers", 8)),
            num_heads=int(hf.get("attention_heads", 16)),
            image_size=int(hf.get("image_size", 448)),
            patch_size=int(hf.get("patch_size", 14)),
            max_num_tiles=int(hf.get("max_num_tiles", 4)),
            intermediate_layers_indices=tuple(
                hf.get("intermediate_layers_indices", (3, 7, 15, 23, 30))),
            norm_eps=float(hf.get("norm_eps", 1e-5)),
        )


def _attn_full(x, layer, heads, key_mask=None):
    """Bidirectional MHA, no bias (Mllama vision attention).
    x [B, T, D]; key_mask [B, T] bool (False = masked key)."""
    b, t, d = x.shape
    dh = d // heads
    q = jnp.dot(x, layer["q"]).reshape(b, t, heads, dh)
    k = jnp.dot(x, layer["k"]).reshape(b, t, heads, dh)
    v = jnp.dot(x, layer["v"]).reshape(b, t, heads, dh)
    scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32) \
        * (dh ** -0.5)
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :], scores, -1e9)
    probs = jax.nn.softmax(scores, -1).astype(x.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, d)
    return jnp.dot(out, layer["o"])


def _vision_layer(x, layer, cfg, key_mask, gated: bool):
    h = layer_norm_ref(x, layer["ln1"]["w"], layer["ln1"]["b"],
                       cfg.norm_eps)
    a = _attn_full(h, layer, cfg.num_heads, key_mask)
    if gated:
        a = a * jnp.tanh(layer["gate_attn"])
    x = x + a
    h = layer_norm_ref(x, layer["ln2"]["w"], layer["ln2"]["b"],
                       cfg.norm_eps)
    h = jnp.dot(h, layer["fc1"]["kernel"]) + layer["fc1"]["bias"]
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    h = jnp.dot(h, layer["fc2"]["kernel"]) + layer["fc2"]["bias"]
    if gated:
        h = h * jnp.tanh(layer["gate_ffn"])
    return x + h


def mllama_vision_forward(vision: Dict[str, Any], pixel_values,
                          aspect_ratio_ids, aspect_ratio_mask,
                          cfg: MllamaVisionConfig):
    """pixel_values [B, tiles, C, H, W]; aspect_ratio_ids [B] int;
    aspect_ratio_mask [B, tiles] -> features [B, tiles, num_patches,
    output_dim] (HF collapses num_concurrent_media=1)."""
    b, tiles, c, hh, ww = pixel_values.shape
    p = cfg.patch_size
    d = cfg.hidden_size
    gh, gw = hh // p, ww // p
    npatch = cfg.patches_per_tile

    # patch conv as unfold + matmul ([D, C, P, P] kernel)
    x = pixel_values.reshape(b * tiles, c, gh, p, gw, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b * tiles, npatch, c * p * p)
    x = jnp.dot(x, vision["patch_kernel"])             # [B*T, np, D]

    # pre-tile positional embedding (gated, selected by aspect ratio)
    x = x.reshape(b, tiles, npatch, d)
    pre = jnp.take(vision["pre_tile"]["embedding"], aspect_ratio_ids,
                   axis=0).reshape(b, cfg.max_num_tiles, 1, d)
    x = x + pre[:, :tiles] * jnp.tanh(vision["pre_tile"]["gate"])

    # class token
    cls = jnp.broadcast_to(vision["class_embedding"], (b, tiles, 1, d))
    x = jnp.concatenate([cls, x.reshape(b, tiles, npatch, d)], axis=2)
    npatch1 = npatch + 1

    # gated positional embedding: (1-tanh(g))*pos + tanh(g)*tile_pos[ar]
    g = jnp.tanh(vision["gated_pos"]["gate"])
    x = x + (1 - g) * vision["gated_pos"]["embedding"][None, None]
    tile_pos = jnp.take(vision["gated_pos"]["tile_embedding"],
                        aspect_ratio_ids, axis=0).reshape(
        b, cfg.max_num_tiles, npatch1, d)
    x = x + g * tile_pos[:, :tiles]

    x = layer_norm_ref(x, vision["ln_pre"]["w"], vision["ln_pre"]["b"],
                       cfg.norm_eps)

    # pad patches per tile to a multiple of 8; build the key mask
    pad = (-npatch1) % 8
    padded = npatch1 + pad
    x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    patch_valid = jnp.arange(padded) < npatch1          # [padded]
    key_mask = (aspect_ratio_mask[:, :tiles, None].astype(bool)
                & patch_valid[None, None, :])           # [B, T, padded]
    key_mask = key_mask.reshape(b, tiles * padded)

    x = x.reshape(b, tiles * padded, d)
    intermediates = []
    for i, layer in enumerate(vision["layers"]):
        if i in cfg.intermediate_layers_indices:
            intermediates.append(x)
        x = _vision_layer(x, layer, cfg, key_mask, gated=False)
    if len(vision["layers"]) in cfg.intermediate_layers_indices:
        intermediates.append(x)

    x = layer_norm_ref(x, vision["ln_post"]["w"], vision["ln_post"]["b"],
                       cfg.norm_eps)

    # post-tile positional embedding, then global (gated) transformer
    x = x.reshape(b, tiles, padded, d)
    post = jnp.take(vision["post_tile"]["embedding"], aspect_ratio_ids,
                    axis=0).reshape(b, cfg.max_num_tiles, 1, d)
    x = x + post[:, :tiles] * jnp.tanh(vision["post_tile"]["gate"])
    x = x.reshape(b, tiles * padded, d)
    for layer in vision["global_layers"]:
        x = _vision_layer(x, layer, cfg, key_mask, gated=True)

    # strip padding, concat intermediates (pre-ln_post states, HF order)
    def unpad(t_):
        return t_.reshape(b, tiles, padded, -1)[:, :, :npatch1]

    out = unpad(x)
    inter = jnp.stack([unpad(t_) for t_ in intermediates], axis=-1)
    inter = inter.reshape(b, tiles, npatch1, -1)
    return jnp.concatenate([out, inter], axis=-1)


# ---------------------------------------------------------------------------
# Text side: llama layers + interleaved cross-attention layers
# ---------------------------------------------------------------------------

def _proj(x, w):
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype)


def _cross_layer(x, layer, cfg: ModelConfig, cross_states, eps):
    """Mllama cross-attention decoder layer (tanh-gated residuals)."""
    b, t, d = x.shape
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    h = rms_norm(x, layer["input_norm"], eps)
    q = _proj(h, layer["q"]).reshape(b, t, hq, dh)
    q = rms_norm(q, layer["q_norm"], eps)
    s = cross_states.shape[1]
    k = _proj(cross_states, layer["k"]).reshape(b, s, hkv, dh)
    v = _proj(cross_states, layer["v"]).reshape(b, s, hkv, dh)
    k = rms_norm(k, layer["k_norm"], eps)
    if hq != hkv:
        k = jnp.repeat(k, hq // hkv, axis=2)
        v = jnp.repeat(v, hq // hkv, axis=2)
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (dh ** -0.5)
    probs = jax.nn.softmax(scores, -1).astype(x.dtype)
    attn = jnp.einsum("bhts,bshd->bthd", probs, v.astype(x.dtype))
    attn = _proj(attn.reshape(b, t, hq * dh), layer["o"])
    x = x + jnp.tanh(layer["attn_gate"]) * attn

    h = rms_norm(x, layer["post_attn_norm"], eps)
    from ..ops.activations import glu_for

    glu = glu_for(cfg.hidden_act)
    mlp = _proj(glu(_proj(h, layer["gate"]), _proj(h, layer["up"])),
                layer["down"])
    return x + jnp.tanh(layer["mlp_gate"]) * mlp


def mllama_text_forward(params, input_ids, cfg: ModelConfig,
                        cross_states=None):
    """llama self-attn layers + cross layers at params['layers'][i]
    marked by the presence of 'attn_gate'."""
    b, t = input_ids.shape
    eps = cfg.rms_norm_eps
    x = jnp.take(params["embed"], input_ids, axis=0)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None],
                                 (b, t))
    inv = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling)
    cos, sin = rope_table(positions, inv)

    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    for layer in params["layers"]:
        if "attn_gate" in layer:
            if cross_states is not None:
                x = _cross_layer(x, layer, cfg, cross_states, eps)
            continue  # no image: cross layers are skipped entirely
        h = rms_norm(x, layer["input_norm"], eps)
        q = _proj(h, layer["q"]).reshape(b, t, hq, dh)
        k = _proj(h, layer["k"]).reshape(b, t, hkv, dh)
        v = _proj(h, layer["v"]).reshape(b, t, hkv, dh)
        q, k = apply_rope_qk(q, k, cos, sin)
        attn = attention(q, k, v, causal=True).reshape(b, t, hq * dh)
        x = x + _proj(attn, layer["o"])
        h = rms_norm(x, layer["post_attn_norm"], eps)
        from ..ops.activations import glu_for

        glu = glu_for(cfg.hidden_act)
        x = x + _proj(glu(_proj(h, layer["gate"]), _proj(h, layer["up"])),
                      layer["down"])
    return rms_norm(x, params["final_norm"], eps)


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

def load_mllama(path: str, dtype=jnp.float32):
    from .config import load_hf_config
    from .hf_loader import CheckpointReader, _to_jnp

    hf = load_hf_config(path)
    text_hf = dict(hf["text_config"])
    vcfg = MllamaVisionConfig.from_hf(hf["vision_config"])
    cross_layers = set(text_hf.get("cross_attention_layers", ()))
    text_cfg = ModelConfig.from_hf_config(
        dict(text_hf, model_type="llama"), name="mllama-text")

    reader = CheckpointReader(path)
    names = set(reader.names())
    # two serialization layouts exist:
    #   new: model.language_model.layers / model.vision_model / model.mmp
    #   old: language_model.model.layers / vision_model / mmp
    if "model.language_model.embed_tokens.weight" in names:
        text_prefix = "model.language_model."
        other_prefix = "model."
        lm_head_name = "lm_head.weight"
    else:
        text_prefix = "language_model.model."
        other_prefix = ""
        lm_head_name = "language_model.lm_head.weight"

    def get(name):
        if name.startswith("language_model."):
            name = text_prefix + name[len("language_model."):]
        else:
            name = other_prefix + name
        return _to_jnp(reader.get(name), dtype)

    def ln(stem):
        return {"w": get(stem + ".weight"), "b": get(stem + ".bias")}

    def vis_layer(p, gated):
        out = {
            "q": get(p + "self_attn.q_proj.weight").T,
            "k": get(p + "self_attn.k_proj.weight").T,
            "v": get(p + "self_attn.v_proj.weight").T,
            "o": get(p + "self_attn.o_proj.weight").T,
            "ln1": ln(p + "input_layernorm"),
            "ln2": ln(p + "post_attention_layernorm"),
            "fc1": {"kernel": get(p + "mlp.fc1.weight").T,
                    "bias": get(p + "mlp.fc1.bias")},
            "fc2": {"kernel": get(p + "mlp.fc2.weight").T,
                    "bias": get(p + "mlp.fc2.bias")},
        }
        if gated:
            out["gate_attn"] = get(p + "gate_attn")
            out["gate_ffn"] = get(p + "gate_ffn")
        return out

    conv = get("vision_model.patch_embedding.weight")   # [D, C, P, P]
    vision = {
        "patch_kernel": conv.reshape(conv.shape[0], -1).T,
        "class_embedding": get("vision_model.class_embedding"),
        "gated_pos": {
            "gate": get("vision_model.gated_positional_embedding.gate"),
            "embedding": get(
                "vision_model.gated_positional_embedding.embedding"),
            "tile_embedding": get(
                "vision_model.gated_positional_embedding."
                "tile_embedding.weight"),
        },
        "pre_tile": {
            "gate": get("vision_model.pre_tile_positional_embedding.gate"),
            "embedding": get("vision_model.pre_tile_positional_embedding"
                             ".embedding.weight"),
        },
        "post_tile": {
            "gate": get("vision_model.post_tile_positional_embedding"
                        ".gate"),
            "embedding": get("vision_model.post_tile_positional_embedding"
                             ".embedding.weight"),
        },
        "ln_pre": ln("vision_model.layernorm_pre"),
        "ln_post": ln("vision_model.layernorm_post"),
        "layers": [vis_layer(f"vision_model.transformer.layers.{i}.",
                             False) for i in range(vcfg.num_layers)],
        "global_layers": [vis_layer(
            f"vision_model.global_transformer.layers.{i}.", True)
            for i in range(vcfg.num_global_layers)],
    }

    text = {"embed": get("language_model.embed_tokens.weight"),
            "final_norm": get("language_model.norm.weight"),
            "layers": []}
    if lm_head_name in names:
        text["lm_head"] = _to_jnp(reader.get(lm_head_name), dtype)
    for i in range(text_cfg.num_layers):
        p = f"language_model.layers.{i}."
        layer = {
            "input_norm": get(p + "input_layernorm.weight"),
            "post_attn_norm": get(p + "post_attention_layernorm.weight"),
            "gate": get(p + "mlp.gate_proj.weight"),
            "up": get(p + "mlp.up_proj.weight"),
            "down": get(p + "mlp.down_proj.weight"),
        }
        if i in cross_layers:
            layer.update({
                "q": get(p + "cross_attn.q_proj.weight"),
                "k": get(p + "cross_attn.k_proj.weight"),
                "v": get(p + "cross_attn.v_proj.weight"),
                "o": get(p + "cross_attn.o_proj.weight"),
                "q_norm": get(p + "cross_attn.q_norm.weight"),
                "k_norm": get(p + "cross_attn.k_norm.weight"),
                "attn_gate": get(p + "cross_attn_attn_gate"),
                "mlp_gate": get(p + "cross_attn_mlp_gate"),
            })
        else:
            layer.update({
                "q": get(p + "self_attn.q_proj.weight"),
                "k": get(p + "self_attn.k_proj.weight"),
                "v": get(p + "self_attn.v_proj.weight"),
                "o": get(p + "self_attn.o_proj.weight"),
            })
        text["layers"].append(layer)

    projector = {
        "kernel": get("multi_modal_projector.weight").T,
        "bias": get("multi_modal_projector.bias"),
    }
    reader.close()
    return {"vision": vision, "text": text, "projector": projector,
            "text_cfg": text_cfg, "vision_cfg": vcfg,
            "image_token_id": int(hf.get("image_token_index", 128256))}


def mllama_loss(bundle, batch):
    """SFT loss over multimodal batches (input_ids, labels, optional
    pixel_values/aspect_ratio_ids/aspect_ratio_mask) via fused linear+CE."""
    from ..ops.fused_ce_linear import fused_ce_loss_mean

    cross = None
    if batch.get("pixel_values") is not None:
        feats = mllama_vision_forward(
            bundle["vision"], batch["pixel_values"],
            batch["aspect_ratio_ids"], batch["aspect_ratio_mask"],
            bundle["vision_cfg"])
        cross = jnp.dot(feats, bundle["projector"]["kernel"]) \
            + bundle["projector"]["bias"]
        cross = cross.reshape(feats.shape[0], -1, cross.shape[-1])
    h = mllama_text_forward(bundle["text"], batch["input_ids"],
                            bundle["text_cfg"], cross)
    h = h[:, :-1, :]
    labels = batch["labels"][:, 1:].reshape(-1)
    w = bundle["text"].get("lm_head")
    if w is None:
        w = bundle["text"]["embed"]
    return fused_ce_loss_mean(h.reshape(-1, h.shape[-1]),
                              w.T.astype(h.dtype), labels)


def mllama_forward(bundle, input_ids, pixel_values=None,
                   aspect_ratio_ids=None, aspect_ratio_mask=None):
    """Full conditional-generation forward -> logits."""
    cross = None
    if pixel_values is not None:
        feats = mllama_vision_forward(
            bundle["vision"], pixel_values, aspect_ratio_ids,
            aspect_ratio_mask, bundle["vision_cfg"])
        b = feats.shape[0]
        cross = jnp.dot(feats, bundle["projector"]["kernel"]) \
            + bundle["projector"]["bias"]
        cross = cross.reshape(b, -1, cross.shape[-1])
    h = mllama_text_forward(bundle["text"], input_ids, bundle["text_cfg"],
                            cross)
    w = bundle["text"].get("lm_head")
    if w is None:
        w = bundle["text"]["embed"]
    return _proj(h, w)
