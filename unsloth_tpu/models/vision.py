"""FastVisionModel — vision-language fine-tuning.

Parity target: reference models/vision.py `FastVisionModel`/`FastBaseModel`
(from_pretrained :867 with VLM processor selection, get_peft_model with
finetune_{vision,language,attention,mlp}_layers selectors :1827) and the
`UnslothVisionDataCollator` flow.

First supported family: Gemma-3 multimodal (SigLIP tower + avg-pool
projector + Gemma3 text). The multimodal forward:

  text embeds (scaled) -> image features spliced at image-token positions
  -> decoder with bidirectional attention within each image span
  -> fused linear+CE loss on text labels.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fused_ce_linear import fused_ce_loss_mean
from .config import ModelConfig, load_hf_config
from .decoder import forward as text_forward
from .hf_loader import CheckpointReader, _to_jnp
from .loader import LanguageModel, _resolve_model_path, load_tokenizer
from .params import init_lora_tree, normalize_target_modules
from .vision_tower import (VisionConfig, gemma3_project, siglip_forward)


@dataclasses.dataclass
class VisionLanguageModel(LanguageModel):
    """Extends the text handle with a vision tower + projector."""

    vision_cfg: Optional[VisionConfig] = None
    vision: Optional[Dict[str, Any]] = None
    projector: Optional[Dict[str, Any]] = None
    image_token_id: int = 0
    mm_tokens_per_image: int = 256
    # vision family: "gemma3" (SigLIP + avg-pool projector, bidirectional
    # image spans) or "llava" (CLIP[-2] + MLP projector, fully causal)
    family: str = "gemma3"
    vision_cfg_extra: Dict[str, Any] = dataclasses.field(
        default_factory=dict)

    def embed_multimodal(self, input_ids, pixel_values):
        """Returns (inputs_embeds [B,T,D], image_spans [B,T] or None).
        pixel_values: [B_img, C, H, W] — one image per nonzero span, in
        order of appearance across the batch."""
        embed_w = (self.lora or {}).get("embed")
        if embed_w is None:
            embed_w = self.params["embed"]
        x = jnp.take(embed_w, input_ids, axis=0)
        # gemma's sqrt(D) scale lives INSIDE the embedding (image features
        # splice in unscaled); granite's embedding_multiplier applies to
        # the MERGED inputs_embeds (HF GraniteModel.forward) — scale after
        scale_after = self.cfg.model_type.startswith("granite")
        if self.cfg.embed_scale is not None and not scale_after:
            x = x * jnp.asarray(self.cfg.embed_scale, dtype=x.dtype)

        if self.family == "llava":
            from .vision_tower import (clip_forward, llava_project,
                                       pixtral_forward)

            if self.vision_cfg_extra.get("tower") == "pixtral":
                feats = pixtral_forward(self.vision, pixel_values,
                                        self.vision_cfg)
            else:
                feats = clip_forward(
                    self.vision, pixel_values, self.vision_cfg,
                    feature_layer=self.vision_cfg_extra.get(
                        "feature_layer", -2))
            feats = llava_project(self.projector, feats)
        elif self.family == "mistral3":
            from .vision_tower import mistral3_project, pixtral_forward

            feats = pixtral_forward(self.vision, pixel_values,
                                    self.vision_cfg)
            n_side = pixel_values.shape[-1] // self.vision_cfg.patch_size
            feats = mistral3_project(
                self.projector, feats, n_side,
                self.vision_cfg_extra.get("merge", 2),
                self.cfg.rms_norm_eps)
        elif self.family == "aya_vision":
            from .vision_tower import aya_project

            feats = siglip_forward(self.vision, pixel_values,
                                   self.vision_cfg, apply_post_ln=False)
            feats = aya_project(
                self.projector, feats,
                self.vision_cfg_extra.get("downsample", 2),
                self.vision_cfg_extra.get("ln_eps", 1e-6))
        else:
            feats = siglip_forward(self.vision, pixel_values,
                                   self.vision_cfg)
            feats = gemma3_project(self.projector, feats, self.vision_cfg,
                                   self.mm_tokens_per_image,
                                   rms_eps=self.cfg.rms_norm_eps)
        feats = feats.astype(x.dtype)       # [B_img, mm_tokens, D]

        is_image = input_ids == self.image_token_id          # [B, T]
        # Each image occupies exactly mm_tokens consecutive slots; map the
        # n-th image token (order of appearance, row-major) to the
        # flattened features.
        flat_feats = feats.reshape(-1, feats.shape[-1])
        order = jnp.cumsum(is_image.reshape(-1).astype(jnp.int32)) - 1
        order = jnp.clip(order, 0, flat_feats.shape[0] - 1)
        gathered = jnp.take(flat_feats, order, axis=0).reshape(x.shape)
        x = jnp.where(is_image.reshape(*is_image.shape, 1), gathered, x)

        if self.cfg.embed_scale is not None and scale_after:
            x = x * jnp.asarray(self.cfg.embed_scale, dtype=x.dtype)
        if self.family in ("llava", "mistral3", "aya_vision"):
            # these families stay fully causal — no bidirectional spans
            return x, None
        # image spans: id = image ordinal + 1 (0 = text)
        span = jnp.where(
            is_image,
            ((jnp.cumsum(is_image.reshape(-1).astype(jnp.int32)) - 1)
             // self.mm_tokens_per_image + 1).reshape(is_image.shape),
            0)
        return x, span

    def generate(self, prompts, *args, images=None, **kw):
        """Multimodal generate: `model.generate(prompts, images=[[img,
        ...], ...])` runs the cached VLM decode (prefill with spliced
        image embeddings — inference/generate.generate_vision); without
        images it is the plain text loop."""
        if images is None:
            return super().generate(prompts, *args, **kw)
        from ..inference.generate import generate_vision

        return generate_vision(self, prompts, images, *args, **kw)

    def vision_loss_fn(self, lora, batch, **kw):
        """SFT loss over multimodal batches: input_ids, labels,
        pixel_values."""
        lora_prev = self.lora
        self.lora = lora
        try:
            embeds, spans = self.embed_multimodal(
                batch["input_ids"], batch["pixel_values"])
        finally:
            self.lora = lora_prev
        h = text_forward(self.params, lora, batch["input_ids"], self.cfg,
                         inputs_embeds=embeds, image_spans=spans,
                         positions=batch.get("positions"),
                         segment_ids=batch.get("segment_ids"), **kw)
        h = h[:, :-1, :]
        labels = batch["labels"][:, 1:].reshape(-1)
        d = h.shape[-1]
        w = self.params.get("lm_head")
        if w is None:
            w = self.params["embed"]
        from ..ops.nf4 import NF4Tensor, dequantize_nf4

        if isinstance(w, NF4Tensor):
            wd = dequantize_nf4(w, h.dtype).T
        else:
            wd = w.T.astype(h.dtype)
        return fused_ce_loss_mean(
            h.reshape(-1, d), wd, labels,
            softcap=self.cfg.final_softcap,
            logit_scale=self.cfg.logit_scale)


@dataclasses.dataclass
class QwenVLModel(VisionLanguageModel):
    """Qwen2.5-VL handle: windowed ViT + M-RoPE text (causal attention —
    no bidirectional image spans in this family)."""

    spatial_merge_size: int = 2
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653

    def generate(self, prompts, *args, images=None, grids=None, **kw):
        """Qwen-VL generate: `model.generate(prompts, images=patches,
        grids=[(t,h,w), ...])` — patches are the HF processor's packed
        pixel rows, prompts already carry the vision token layout
        (inference/generate.generate_qwen_vl)."""
        if images is None:
            return LanguageModel.generate(self, prompts, *args, **kw)
        from ..inference.generate import generate_qwen_vl

        return generate_qwen_vl(self, prompts, images, grids, *args, **kw)

    def embed_multimodal(self, input_ids, pixel_values, grid_thw):
        """pixel_values [S, C*Tp*P*P] packed patches; grid_thw static."""
        from .qwen_vl import mrope_positions_for, qwen_vision_forward

        embed_w = (self.lora or {}).get("embed")
        if embed_w is None:
            embed_w = self.params["embed"]
        x = jnp.take(embed_w, input_ids, axis=0)

        feats = qwen_vision_forward(self.vision, pixel_values,
                                    grid_thw, self.vision_cfg)
        feats = feats.astype(x.dtype)

        is_image = input_ids == self.image_token_id
        flat = feats.reshape(-1, feats.shape[-1])
        order = jnp.cumsum(is_image.reshape(-1).astype(jnp.int32)) - 1
        order = jnp.clip(order, 0, flat.shape[0] - 1)
        gathered = jnp.take(flat, order, axis=0).reshape(
            *input_ids.shape, -1)
        x = jnp.where(is_image[..., None], gathered, x)

        ids_np = np.asarray(input_ids)
        mpos = np.stack([
            mrope_positions_for(ids_np[b], self.image_token_id, grid_thw,
                                self.spatial_merge_size)
            for b in range(ids_np.shape[0])])            # [B, 3, T]
        return x, jnp.asarray(mpos)

    def vision_loss_fn(self, lora, batch, **kw):
        lora_prev = self.lora
        self.lora = lora
        try:
            embeds, mpos = self.embed_multimodal(
                batch["input_ids"], batch["pixel_values"],
                batch["grid_thw"])
        finally:
            self.lora = lora_prev
        h = text_forward(self.params, lora, batch["input_ids"], self.cfg,
                         inputs_embeds=embeds, mrope_positions=mpos,
                         segment_ids=batch.get("segment_ids"), **kw)
        h = h[:, :-1, :]
        labels = batch["labels"][:, 1:].reshape(-1)
        d = h.shape[-1]
        w = self.params.get("lm_head")
        if w is None:
            w = self.params["embed"]
        wd = w.T.astype(h.dtype)
        return fused_ce_loss_mean(h.reshape(-1, d), wd, labels)


def _select_best_resolution(orig, pinpoints):
    """HF select_best_resolution: maximize effective, minimize waste."""
    oh, ow = orig
    best, best_eff, best_waste = None, 0, float("inf")
    for h, w in pinpoints:
        scale = min(w / ow, h / oh)
        eff = min(int(ow * scale) * int(oh * scale), ow * oh)
        waste = h * w - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (h, w), eff, waste
    return best


@dataclasses.dataclass
class LlavaNextModel(VisionLanguageModel):
    """llava-1.6 (llava-next) handle: anyres tiling — each image is a
    base crop + grid tiles; features are reassembled into the spatial
    grid, unpadded to the original aspect ratio, an image_newline column
    appended per row, and the base features prepended (HF
    LlavaNextModel.pack_image_features)."""

    image_grid_pinpoints: Tuple[Tuple[int, int], ...] = ()
    image_newline: Any = None

    def embed_multimodal(self, input_ids, pixel_values, image_sizes):
        """pixel_values [B_img, n_crops, C, H, W]; image_sizes
        [B_img, 2] original (h, w) — static (drives the pack layout)."""
        from .vision_tower import clip_forward, llava_project

        embed_w = (self.lora or {}).get("embed")
        if embed_w is None:
            embed_w = self.params["embed"]
        x = jnp.take(embed_w, input_ids, axis=0)

        vis = self.vision_cfg
        side = vis.image_size // vis.patch_size
        n_img, n_crops = pixel_values.shape[:2]
        flat_px = pixel_values.reshape((-1,) + tuple(pixel_values.shape[2:]))
        feats = clip_forward(self.vision, flat_px, vis,
                             feature_layer=self.vision_cfg_extra.get(
                                 "feature_layer", -2))
        feats = llava_project(self.projector, feats)
        feats = feats.reshape(n_img, n_crops, side * side, -1)

        packed = []
        for i in range(n_img):
            oh, ow = int(image_sizes[i][0]), int(image_sizes[i][1])
            base = feats[i, 0]                                # [hw, D]
            tiles = feats[i, 1:]
            bh, bw = _select_best_resolution(
                (oh, ow), self.image_grid_pinpoints)
            nph, npw = bh // vis.image_size, bw // vis.image_size
            f = tiles.reshape(nph, npw, side, side, -1)
            f = f.transpose(4, 0, 2, 1, 3).reshape(
                -1, nph * side, npw * side)                   # [D, H, W]
            # unpad to the original aspect ratio (HF unpad_image)
            ch, cw = f.shape[1], f.shape[2]
            if ow / oh > cw / ch:
                nh = int(round(oh * (cw / ow), 7))
                pad = (ch - nh) // 2
                f = f[:, pad:ch - pad, :]
            else:
                nw = int(round(ow * (ch / oh), 7))
                pad = (cw - nw) // 2
                f = f[:, :, pad:cw - pad]
            nl = jnp.broadcast_to(
                self.image_newline[:, None, None].astype(f.dtype),
                (f.shape[0], f.shape[1], 1))
            f = jnp.concatenate([f, nl], axis=2)
            f = f.reshape(f.shape[0], -1).T                   # [HW', D]
            packed.append(jnp.concatenate([base, f], axis=0))
        flat_feats = jnp.concatenate(packed, axis=0).astype(x.dtype)

        is_image = input_ids == self.image_token_id
        order = jnp.cumsum(is_image.reshape(-1).astype(jnp.int32)) - 1
        order = jnp.clip(order, 0, flat_feats.shape[0] - 1)
        gathered = jnp.take(flat_feats, order, axis=0).reshape(
            *input_ids.shape, -1)
        x = jnp.where(is_image[..., None], gathered, x)
        if self.cfg.embed_scale is not None:
            # granite-vision: embedding_multiplier applies to the MERGED
            # embeds (HF GraniteModel.forward scales passed inputs_embeds)
            x = x * jnp.asarray(self.cfg.embed_scale, dtype=x.dtype)
        return x, None  # fully causal

    def vision_loss_fn(self, lora, batch, **kw):
        lora_prev = self.lora
        self.lora = lora
        try:
            embeds, _ = self.embed_multimodal(
                batch["input_ids"], batch["pixel_values"],
                batch["image_sizes"])
        finally:
            self.lora = lora_prev
        h = text_forward(self.params, lora, batch["input_ids"], self.cfg,
                         inputs_embeds=embeds,
                         positions=batch.get("positions"),
                         segment_ids=batch.get("segment_ids"), **kw)
        h = h[:, :-1, :]
        labels = batch["labels"][:, 1:].reshape(-1)
        d = h.shape[-1]
        w = self.params.get("lm_head")
        if w is None:
            w = self.params["embed"]
        from ..ops.nf4 import NF4Tensor, dequantize_nf4

        if isinstance(w, NF4Tensor):
            wd = dequantize_nf4(w, h.dtype).T
        else:
            wd = w.T.astype(h.dtype)
        return fused_ce_loss_mean(
            h.reshape(-1, d), wd, labels,
            softcap=self.cfg.final_softcap,
            logit_scale=self.cfg.logit_scale)


class FastVisionModel:
    """Reference-compatible entry (reference: models/__init__.py exports
    FastVisionModel; models/vision.py implements it)."""

    @staticmethod
    def from_pretrained(
        model_name: str,
        load_in_4bit: bool = True,
        dtype: Optional[Any] = None,
        max_seq_length: int = 2048,
        **kwargs,
    ) -> Tuple[VisionLanguageModel, Any]:
        from ..utils.dtypes import canonical_dtype

        path = _resolve_model_path(model_name)
        hf = load_hf_config(path)
        if "vision_config" not in hf:
            raise ValueError(
                f"{model_name} has no vision tower; use FastLanguageModel")
        dtype = canonical_dtype(dtype) or jnp.bfloat16
        if hf.get("model_type") in ("qwen2_5_vl", "qwen2_vl"):
            return _load_qwen_vl(model_name, path, hf, dtype, load_in_4bit,
                                 max_seq_length)
        if hf.get("model_type") in ("qwen3_vl", "qwen3_vl_moe"):
            return _load_qwen3_vl(model_name, path, hf, dtype,
                                  load_in_4bit, max_seq_length)

        text_cfg = ModelConfig.from_hf_config(hf, name=model_name)
        vision_cfg = VisionConfig.from_hf(hf["vision_config"])
        reader = CheckpointReader(path)

        text_params = _load_text_params(reader, text_cfg, dtype,
                                        load_in_4bit)
        model_type = hf.get("model_type")
        family = {"llava": "llava", "mistral3": "mistral3",
                  "aya_vision": "aya_vision",
                  "llava_next": "llava_next"}.get(model_type, "gemma3")
        tower = (hf.get("vision_config") or {}).get("model_type",
                                                    "clip_vision_model")
        extra = {"tower": tower}
        if family != "gemma3" and text_cfg.logit_scale is not None:
            # quirk: the HF ...ForConditionalGeneration wrappers
            # (llava/llava_next/mistral3/aya_vision) use their OWN plain
            # lm_head — cohere's logit_scale / granite's logits_scaling
            # never applies (verified vs HF)
            text_cfg = dataclasses.replace(text_cfg, logit_scale=None)
        if family == "llava" and tower == "pixtral":
            from .vision_tower import PixtralVisionConfig

            vision_cfg = PixtralVisionConfig.from_hf(hf["vision_config"])
            vision = _load_pixtral_vision_params(reader, vision_cfg,
                                                 dtype)
            projector = _load_llava_projector(reader, dtype)
            mm_tokens = (vision_cfg.image_size
                         // vision_cfg.patch_size) ** 2
        elif family in ("llava", "llava_next"):
            vision, projector = _load_clip_vision_params(
                reader, vision_cfg, dtype)
            extra["feature_layer"] = int(hf.get("vision_feature_layer",
                                                -2))
            mm_tokens = vision_cfg.num_patches
            if family == "llava_next":
                for cand in ("model.image_newline", "image_newline"):
                    if cand in reader:
                        extra["image_newline"] = _to_jnp(
                            reader.get(cand), dtype)
                        break
        elif family == "mistral3":
            from .vision_tower import PixtralVisionConfig

            vision_cfg = PixtralVisionConfig.from_hf(hf["vision_config"])
            vision = _load_pixtral_vision_params(reader, vision_cfg,
                                                 dtype)
            projector = _load_mistral3_projector(reader, dtype)
            merge = int(hf.get("spatial_merge_size", 2))
            extra["merge"] = merge
            mm_tokens = (vision_cfg.image_size
                         // (vision_cfg.patch_size * merge)) ** 2
        elif family == "aya_vision":
            vision = _load_siglip_tower(reader, vision_cfg, dtype)
            projector = _load_aya_projector(reader, dtype)
            ds = int(hf.get("downsample_factor", 2))
            extra["downsample"] = ds
            extra["ln_eps"] = float(hf.get("adapter_layer_norm_eps",
                                           1e-6))
            mm_tokens = vision_cfg.num_patches // (ds * ds)
        else:
            vision, projector = _load_vision_params(reader, vision_cfg,
                                                    dtype)
            mm_tokens = int(hf.get("mm_tokens_per_image", 256))
        reader.close()

        tokenizer = load_tokenizer(path)
        common = dict(
            cfg=text_cfg, params=text_params, tokenizer=tokenizer,
            max_seq_length=max_seq_length, model_path=path, hf_config=hf,
            vision_cfg=vision_cfg, vision=vision, projector=projector,
            image_token_id=int(hf.get("image_token_index",
                                      hf.get("image_token_id", 0))),
            mm_tokens_per_image=mm_tokens, family=family,
            vision_cfg_extra=extra)
        if family == "llava_next":
            model = LlavaNextModel(
                image_grid_pinpoints=tuple(
                    tuple(p) for p in hf.get("image_grid_pinpoints", ())),
                image_newline=extra.pop("image_newline", None), **common)
        else:
            model = VisionLanguageModel(**common)
        return model, tokenizer

    @staticmethod
    def get_peft_model(
        model: VisionLanguageModel,
        r: int = 16,
        lora_alpha: float = 16.0,
        finetune_vision_layers: bool = False,
        finetune_language_layers: bool = True,
        finetune_attention_modules: bool = True,
        finetune_mlp_modules: bool = True,
        target_modules: Optional[Sequence[str]] = None,
        random_state: int = 3407,
        **kwargs,
    ) -> VisionLanguageModel:
        """LoRA with the reference's layer selectors (vision.py:1827).
        Vision-layer LoRA is accepted but currently trains language only
        (vision LoRA lands with the Qwen2.5-VL family)."""
        mods: List[str] = []
        if target_modules:
            mods = list(normalize_target_modules(target_modules))
        else:
            if finetune_attention_modules:
                mods += ["q", "k", "v", "o"]
            if finetune_mlp_modules:
                mods += ["gate", "up", "down"]
        if not finetune_language_layers:
            mods = []
        key = jax.random.PRNGKey(random_state)
        model.lora = init_lora_tree(model.cfg, key, r=r, alpha=lora_alpha,
                                    target_modules=tuple(mods))
        model.lora_config = {"r": r, "lora_alpha": lora_alpha,
                             "target_modules": mods}
        return model

    for_inference = staticmethod(lambda m: m.for_inference())
    for_training = staticmethod(lambda m: m.for_training())


@dataclasses.dataclass
class Qwen3VLModel(VisionLanguageModel):
    """Qwen3-VL handle: interpolated-pos-embed ViT + DeepStack features
    injected after the first N text layers; interleaved M-RoPE text."""

    spatial_merge_size: int = 2

    def generate(self, prompts, *args, images=None, grids=None, **kw):
        """Qwen3-VL generate: like QwenVLModel.generate, plus DeepStack
        feature injection during the prefill
        (inference/generate.generate_qwen3_vl)."""
        if images is None:
            return LanguageModel.generate(self, prompts, *args, **kw)
        from ..inference.generate import generate_qwen3_vl

        return generate_qwen3_vl(self, prompts, images, grids, *args,
                                 **kw)

    def embed_multimodal(self, input_ids, pixel_values, grid_thw):
        """pixel_values [S, C*Tp*P*P] packed patches; grid_thw static.
        Returns (embeds, mrope_positions, deepstack_embeds [n,B,T,D])."""
        from .qwen3_vl import qwen3_vision_forward
        from .qwen_vl import mrope_positions_for

        embed_w = (self.lora or {}).get("embed")
        if embed_w is None:
            embed_w = self.params["embed"]
        x = jnp.take(embed_w, input_ids, axis=0)

        feats, deepstack = qwen3_vision_forward(
            self.vision, pixel_values, grid_thw, self.vision_cfg)
        feats = feats.astype(x.dtype)

        is_image = input_ids == self.image_token_id
        order = jnp.cumsum(is_image.reshape(-1).astype(jnp.int32)) - 1
        order = jnp.clip(order, 0, feats.shape[0] - 1)
        gathered = jnp.take(feats, order, axis=0).reshape(
            *input_ids.shape, -1)
        x = jnp.where(is_image[..., None], gathered, x)

        ds_dense = None
        if deepstack is not None:
            # dense [n, B, T, D] injection tensors (zero at text tokens)
            g = jnp.take(deepstack, order, axis=1).reshape(
                deepstack.shape[0], *input_ids.shape, -1)
            ds_dense = jnp.where(is_image[None, ..., None], g, 0.0)

        ids_np = np.asarray(input_ids)
        mpos = np.stack([
            mrope_positions_for(ids_np[b], self.image_token_id, grid_thw,
                                self.spatial_merge_size)
            for b in range(ids_np.shape[0])])            # [B, 3, T]
        return x, jnp.asarray(mpos), ds_dense

    def vision_loss_fn(self, lora, batch, **kw):
        lora_prev = self.lora
        self.lora = lora
        try:
            embeds, mpos, ds = self.embed_multimodal(
                batch["input_ids"], batch["pixel_values"],
                batch["grid_thw"])
        finally:
            self.lora = lora_prev
        h = text_forward(self.params, lora, batch["input_ids"], self.cfg,
                         inputs_embeds=embeds, mrope_positions=mpos,
                         deepstack_embeds=ds,
                         segment_ids=batch.get("segment_ids"), **kw)
        h = h[:, :-1, :]
        labels = batch["labels"][:, 1:].reshape(-1)
        d = h.shape[-1]
        w = self.params.get("lm_head")
        if w is None:
            w = self.params["embed"]
        from ..ops.nf4 import NF4Tensor, dequantize_nf4

        if isinstance(w, NF4Tensor):
            wd = dequantize_nf4(w, h.dtype).T
        else:
            wd = w.T.astype(h.dtype)
        return fused_ce_loss_mean(
            h.reshape(-1, d), wd, labels,
            softcap=self.cfg.final_softcap,
            logit_scale=self.cfg.logit_scale)


def _load_qwen3_vl(model_name, path, hf, dtype, load_in_4bit,
                   max_seq_length):
    from .qwen3_vl import Qwen3VisionConfig, load_qwen3_vision_params

    text_cfg = ModelConfig.from_hf_config(hf, name=model_name)
    vision_cfg = Qwen3VisionConfig.from_hf(hf["vision_config"])
    reader = CheckpointReader(path)
    text_params = _load_text_params(reader, text_cfg, dtype, load_in_4bit)
    vision = load_qwen3_vision_params(reader, vision_cfg, dtype)
    reader.close()
    tokenizer = load_tokenizer(path)
    model = Qwen3VLModel(
        cfg=text_cfg, params=text_params, tokenizer=tokenizer,
        max_seq_length=max_seq_length, model_path=path, hf_config=hf,
        vision_cfg=vision_cfg, vision=vision, projector=None,
        image_token_id=int(hf.get("image_token_id",
                                  hf.get("image_token_index", 151655))),
        spatial_merge_size=vision_cfg.spatial_merge_size)
    return model, tokenizer


def _load_qwen_vl(model_name, path, hf, dtype, load_in_4bit,
                  max_seq_length):
    from .qwen_vl import QwenVisionConfig, load_qwen_vision_params

    text_cfg = ModelConfig.from_hf_config(hf, name=model_name)
    vision_cfg = QwenVisionConfig.from_hf(hf["vision_config"])
    reader = CheckpointReader(path)
    text_params = _load_text_params(reader, text_cfg, dtype, load_in_4bit)
    vision = load_qwen_vision_params(reader, vision_cfg, dtype)
    reader.close()
    tokenizer = load_tokenizer(path)
    model = QwenVLModel(
        cfg=text_cfg, params=text_params, tokenizer=tokenizer,
        max_seq_length=max_seq_length, model_path=path, hf_config=hf,
        vision_cfg=vision_cfg, vision=vision, projector=None,
        image_token_id=int(hf.get("image_token_id",
                                  hf.get("image_token_index", 151655))),
        spatial_merge_size=vision_cfg.spatial_merge_size,
        vision_start_token_id=int(hf.get("vision_start_token_id",
                                         151652)),
        vision_end_token_id=int(hf.get("vision_end_token_id", 151653)))
    return model, tokenizer


# ---------------------------------------------------------------------------
# Checkpoint loading (gemma3 multimodal layouts, old and new)
# ---------------------------------------------------------------------------

def _pick(reader, *names):
    for n in names:
        if n in reader:
            return n
    raise KeyError(f"none of {names} in checkpoint")


def _load_text_params(reader, cfg, dtype, load_in_4bit):
    """Text tower under 'model.language_model.' (new) or
    'language_model.model.' (old)."""
    from . import hf_names
    from ..ops.nf4 import quantize_nf4

    prefixes = ("model.language_model.", "language_model.model.", "model.")
    prefix = None
    for p in prefixes:
        if p + "embed_tokens.weight" in reader:
            prefix = p
            break
    assert prefix, "no language model found in checkpoint"

    def name_for(hf_name: str) -> str:
        # hf_names produces "model.layers.N..."-style names
        return hf_name.replace("model.", prefix, 1)

    params: Dict[str, Any] = {"layers": []}
    for ours, hf in hf_names.top_level_map(cfg).items():
        if ours == "lm_head":
            for cand in ("lm_head.weight", prefix + "lm_head.weight",
                         "language_model.lm_head.weight"):
                if cand in reader:
                    params[ours] = _to_jnp(reader.get(cand), dtype)
                    break
            continue
        params[ours] = _to_jnp(reader.get(name_for(hf)), dtype)
    for i in range(cfg.num_layers):
        layer = {}
        for ours, hf in hf_names.layer_name_map(cfg, i).items():
            name = name_for(hf)
            if name not in reader:
                continue
            arr = _to_jnp(reader.get(name), dtype)
            if load_in_4bit and ours in ("q", "k", "v", "o", "gate", "up",
                                         "down") and arr.ndim == 2:
                arr = quantize_nf4(arr, dtype=dtype)
            layer[ours] = arr
        if cfg.layer_is_moe(i):
            # MoE VLM text (qwen3-vl-moe): the reader aliases
            # model.language_model.* back to model.*, so the standard
            # expert loader applies
            from .hf_loader import _load_experts

            layer["experts"] = _load_experts(reader, cfg, i, dtype,
                                             lambda _, x: x)
        params["layers"].append(layer)
    return params


def _load_siglip_tower(reader, vcfg: VisionConfig, dtype):
    prefixes = ("model.vision_tower.vision_model.",
                "vision_tower.vision_model.")
    prefix = None
    for p in prefixes:
        if p + "embeddings.patch_embedding.weight" in reader:
            prefix = p
            break
    assert prefix, "no vision tower found in checkpoint"

    def get(name):
        return _to_jnp(reader.get(prefix + name), dtype)

    conv = get("embeddings.patch_embedding.weight")  # [H, C, P, P]
    h = conv.shape[0]
    kernel = conv.reshape(h, -1).T                   # [(C*P*P), H]
    vision = {
        "patch_embed": {"kernel": kernel,
                        "bias": get("embeddings.patch_embedding.bias")},
        "pos_embed": get("embeddings.position_embedding.weight"),
        "post_ln": {"w": get("post_layernorm.weight"),
                    "b": get("post_layernorm.bias")},
        "layers": [],
    }
    for i in range(vcfg.num_layers):
        p = f"encoder.layers.{i}."

        def lin(sub):
            return {"kernel": get(p + sub + ".weight").T,
                    "bias": get(p + sub + ".bias")}

        vision["layers"].append({
            "ln1": {"w": get(p + "layer_norm1.weight"),
                    "b": get(p + "layer_norm1.bias")},
            "ln2": {"w": get(p + "layer_norm2.weight"),
                    "b": get(p + "layer_norm2.bias")},
            "q": lin("self_attn.q_proj"),
            "k": lin("self_attn.k_proj"),
            "v": lin("self_attn.v_proj"),
            "out": lin("self_attn.out_proj"),
            "fc1": lin("mlp.fc1"),
            "fc2": lin("mlp.fc2"),
        })
    return vision


def _load_vision_params(reader, vcfg: VisionConfig, dtype):
    vision = _load_siglip_tower(reader, vcfg, dtype)
    proj_prefixes = ("model.multi_modal_projector.",
                     "multi_modal_projector.")
    pp = None
    for p in proj_prefixes:
        if p + "mm_input_projection_weight" in reader:
            pp = p
            break
    assert pp, "no multimodal projector in checkpoint"
    projector = {
        "mm_proj": _to_jnp(reader.get(pp + "mm_input_projection_weight"),
                           dtype),
        "mm_norm": _to_jnp(reader.get(pp + "mm_soft_emb_norm.weight"),
                           dtype),
    }
    return vision, projector


def _load_aya_projector(reader, dtype):
    """AyaVisionMultiModalProjector: layernorm + linear_1 (SwiGLU halves)
    + linear_2, all biased."""
    pp = None
    for p in ("model.multi_modal_projector.", "multi_modal_projector."):
        if p + "layernorm.weight" in reader:
            pp = p
            break
    assert pp, "no aya projector in checkpoint"

    def lin(name):
        return {"kernel": _to_jnp(reader.get(pp + name + ".weight"),
                                  dtype).T,
                "bias": _to_jnp(reader.get(pp + name + ".bias"), dtype)}

    return {
        "ln": {"w": _to_jnp(reader.get(pp + "layernorm.weight"), dtype),
               "b": _to_jnp(reader.get(pp + "layernorm.bias"), dtype)},
        "linear_1": lin("linear_1"),
        "linear_2": lin("linear_2"),
    }


def _load_pixtral_vision_params(reader, vcfg, dtype):
    """Pixtral ViT (HF PixtralVisionModel under `vision_tower.`):
    biasless patch conv, ln_pre, transformer.layers.N with
    attention_norm/ffn_norm + biasless q/k/v/o and gated MLP."""
    prefixes = ("model.vision_tower.", "vision_tower.")
    prefix = None
    for p in prefixes:
        if p + "patch_conv.weight" in reader:
            prefix = p
            break
    assert prefix, "no pixtral vision tower found in checkpoint"

    def get(name):
        return _to_jnp(reader.get(prefix + name), dtype)

    conv = get("patch_conv.weight")                  # [H, C, P, P]
    vision = {
        "patch_embed": {"kernel": conv.reshape(conv.shape[0], -1).T},
        "ln_pre": get("ln_pre.weight"),
        "layers": [],
    }
    for i in range(vcfg.num_layers):
        p = f"transformer.layers.{i}."

        def lin(sub):
            return {"kernel": get(p + sub + ".weight").T}

        vision["layers"].append({
            "attention_norm": get(p + "attention_norm.weight"),
            "ffn_norm": get(p + "ffn_norm.weight"),
            "q": lin("attention.q_proj"),
            "k": lin("attention.k_proj"),
            "v": lin("attention.v_proj"),
            "out": lin("attention.o_proj"),
            "gate": lin("feed_forward.gate_proj"),
            "up": lin("feed_forward.up_proj"),
            "down": lin("feed_forward.down_proj"),
        })
    return vision


def _load_llava_projector(reader, dtype):
    pp = None
    for p in ("model.multi_modal_projector.", "multi_modal_projector."):
        if p + "linear_1.weight" in reader:
            pp = p
            break
    assert pp, "no llava projector in checkpoint"

    def lin(name):
        out = {"kernel": _to_jnp(reader.get(pp + name + ".weight"),
                                 dtype).T}
        if pp + name + ".bias" in reader:
            out["bias"] = _to_jnp(reader.get(pp + name + ".bias"), dtype)
        else:
            out["bias"] = None
        return out

    return {"linear_1": lin("linear_1"), "linear_2": lin("linear_2")}


def _load_mistral3_projector(reader, dtype):
    pp = None
    for p in ("model.multi_modal_projector.", "multi_modal_projector."):
        if p + "patch_merger.merging_layer.weight" in reader:
            pp = p
            break
    assert pp, "no mistral3 projector in checkpoint"
    proj = _load_llava_projector(reader, dtype)
    proj["norm"] = _to_jnp(reader.get(pp + "norm.weight"), dtype)
    proj["merger"] = {"kernel": _to_jnp(
        reader.get(pp + "patch_merger.merging_layer.weight"), dtype).T}
    return proj


def _load_clip_vision_params(reader, vcfg: VisionConfig, dtype):
    """llava-1.5 CLIP tower (HF CLIPVisionModel under
    `vision_tower.vision_model.`): CLS token, biasless patch conv,
    pre-layernorm; MLP projector `multi_modal_projector.linear_1/2`."""
    prefixes = ("model.vision_tower.vision_model.",
                "vision_tower.vision_model.")
    prefix = None
    for p in prefixes:
        if p + "embeddings.patch_embedding.weight" in reader:
            prefix = p
            break
    assert prefix, "no CLIP vision tower found in checkpoint"

    def get(name):
        return _to_jnp(reader.get(prefix + name), dtype)

    conv = get("embeddings.patch_embedding.weight")  # [H, C, P, P]
    h = conv.shape[0]
    vision = {
        "patch_embed": {"kernel": conv.reshape(h, -1).T},
        "class_embed": get("embeddings.class_embedding"),
        "pos_embed": get("embeddings.position_embedding.weight"),
        "pre_ln": {"w": get("pre_layrnorm.weight"),   # HF's typo
                   "b": get("pre_layrnorm.bias")},
        "layers": [],
    }
    for i in range(vcfg.num_layers):
        p = f"encoder.layers.{i}."

        def lin(sub):
            return {"kernel": get(p + sub + ".weight").T,
                    "bias": get(p + sub + ".bias")}

        vision["layers"].append({
            "ln1": {"w": get(p + "layer_norm1.weight"),
                    "b": get(p + "layer_norm1.bias")},
            "ln2": {"w": get(p + "layer_norm2.weight"),
                    "b": get(p + "layer_norm2.bias")},
            "q": lin("self_attn.q_proj"),
            "k": lin("self_attn.k_proj"),
            "v": lin("self_attn.v_proj"),
            "out": lin("self_attn.out_proj"),
            "fc1": lin("mlp.fc1"),
            "fc2": lin("mlp.fc2"),
        })

    pp = None
    for p in ("model.multi_modal_projector.", "multi_modal_projector."):
        if p + "linear_1.weight" in reader:
            pp = p
            break
    assert pp, "no llava projector in checkpoint"
    projector = {
        "linear_1": {"kernel": _to_jnp(reader.get(pp + "linear_1.weight"),
                                       dtype).T,
                     "bias": _to_jnp(reader.get(pp + "linear_1.bias"),
                                     dtype)},
        "linear_2": {"kernel": _to_jnp(reader.get(pp + "linear_2.weight"),
                                       dtype).T,
                     "bias": _to_jnp(reader.get(pp + "linear_2.bias"),
                                     dtype)},
    }
    return vision, projector
