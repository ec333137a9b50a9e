"""FastDiffusionModel — text-diffusion (masked-diffusion) language models.

Parity target: the reference's FastDiffusionModel (reference:
models/diffusion.py:129-342 — a transformers-only slow path for
``diffusion_gemma``-style checkpoints exposing the (model, tokenizer) API,
get_peft_model, and for_inference/for_training).

TPU-native redesign: the underlying network is our functional decoder with
BIDIRECTIONAL attention (cfg.causal=False); training is the
masked-denoising objective (LLaDA-style: per-sequence mask ratio
t ~ U(0,1), cross entropy on masked positions weighted 1/t) and
generation is iterative confidence-based unmasking over a fixed canvas —
all jittable, no monkey-patching.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import ModelConfig, load_hf_config
from .loader import (LanguageModel, FastLanguageModel, load_tokenizer,
                     _resolve_model_path)

DIFFUSION_MODEL_TYPES = ("diffusion_gemma", "diffusion_gemma4", "llada",
                         "dream")


def is_diffusion_model_type(model_types) -> bool:
    if model_types is None:
        return False
    if isinstance(model_types, str):
        model_types = [model_types]
    return any(mt in DIFFUSION_MODEL_TYPES for mt in model_types)


class FastDiffusionModel:
    """Reference-parity entry point for text-diffusion checkpoints."""

    @staticmethod
    def from_pretrained(
        model_name: str,
        max_seq_length: int = 2048,
        dtype: Optional[Any] = None,
        load_in_4bit: bool = False,
        full_finetuning: bool = False,
        mask_token_id: Optional[int] = None,
        **kwargs,
    ) -> Tuple[LanguageModel, Any]:
        path = _resolve_model_path(model_name)
        hf = load_hf_config(path)
        if not is_diffusion_model_type(hf.get("model_type")):
            raise RuntimeError(
                f"FastDiffusionModel only supports diffusion model_types "
                f"{DIFFUSION_MODEL_TYPES}, got {hf.get('model_type')!r}. "
                f"Use FastLanguageModel for autoregressive models.")
        model, tok = FastLanguageModel.from_pretrained(
            path, max_seq_length=max_seq_length, dtype=dtype,
            load_in_4bit=load_in_4bit, full_finetuning=full_finetuning,
            **kwargs)
        mid = mask_token_id
        if mid is None:
            mid = hf.get("mask_token_id")
        if mid is None and tok is not None:
            mid = getattr(tok, "mask_token_id", None)
        if mid is None:
            mid = model.cfg.vocab_size - 1  # conventional fallback
        import dataclasses

        model.cfg = dataclasses.replace(model.cfg, causal=False,
                                        mask_token_id=int(mid))
        return model, tok

    get_peft_model = FastLanguageModel.get_peft_model
    for_inference = staticmethod(lambda m: m.for_inference())
    for_training = staticmethod(lambda m: m.for_training())


def diffusion_mask(key, input_ids, mask_token_id, *, prompt_mask=None,
                   min_t: float = 1e-3):
    """Sample the LLaDA forward process: per-sequence t ~ U(min_t, 1),
    each non-prompt token independently masked with probability t.
    Returns (noised_ids, masked [B,T] bool, t [B])."""
    b, s = input_ids.shape
    kt, km = jax.random.split(key)
    t = jax.random.uniform(kt, (b,), minval=min_t, maxval=1.0)
    u = jax.random.uniform(km, (b, s))
    masked = u < t[:, None]
    if prompt_mask is not None:
        masked = masked & ~prompt_mask
    noised = jnp.where(masked, mask_token_id, input_ids)
    return noised, masked, t


def diffusion_loss(params, lora, batch, cfg: ModelConfig, key,
                   remat=True, lm_head_trainable: Optional[bool] = None):
    """Masked-denoising loss: E_t [ (1/t) * sum_masked CE ] / total_tokens
    (LLaDA eq. 5). batch: input_ids [B, T]; optional prompt_mask [B, T]
    (1 = conditioning token, never masked, never scored)."""
    from .decoder import forward
    from ..ops.fused_ce_linear import selective_log_softmax
    from ..ops.nf4 import NF4Tensor, dequantize_nf4

    ids = batch["input_ids"]
    b, s = ids.shape
    noised, masked, t = diffusion_mask(
        key, ids, cfg.mask_token_id,
        prompt_mask=batch.get("prompt_mask"))
    h = forward(params, lora, noised, cfg,
                segment_ids=batch.get("segment_ids"),
                positions=batch.get("positions"), remat=remat)
    if lm_head_trainable is None:
        # full fine-tuning (no lora tree) trains the head too
        lm_head_trainable = lora is None
    w = (lora or {}).get("lm_head")
    trainable = lm_head_trainable or w is not None
    if w is None:
        w = params.get("lm_head")
    if w is None:
        w2 = (lora or {}).get("embed")
        trainable = trainable or w2 is not None
        w = w2 if w2 is not None else params["embed"]
    if isinstance(w, NF4Tensor):
        wd = dequantize_nf4(w, h.dtype).T
    else:
        wd = w.T.astype(h.dtype)
    targets = jnp.where(masked, ids, -100)
    logps = selective_log_softmax(
        h.reshape(-1, h.shape[-1]), wd, targets.reshape(-1),
        softcap=cfg.final_softcap, logit_scale=cfg.logit_scale,
        w_trainable=trainable)
    logps = logps.reshape(b, s)
    per_seq = -jnp.sum(jnp.where(masked, logps, 0.0), axis=-1) / t
    return jnp.sum(per_seq) / (b * s)


def diffusion_generate(model, prompt_ids, *, canvas_length: int = 128,
                       steps: int = 16, temperature: float = 0.0,
                       key=None):
    """Iterative unmasking: start from [prompt, MASK * rest]; each step
    predicts every masked slot and commits the top-confidence fraction
    (linear schedule). Runs as `steps` jitted forward passes."""
    import numpy as np

    cfg = model.cfg
    mid = cfg.mask_token_id
    if key is None:
        key = jax.random.PRNGKey(0)
    prompt = list(prompt_ids)
    canvas = np.full(canvas_length, mid, np.int32)
    canvas[:len(prompt)] = prompt
    canvas = jnp.asarray(canvas[None, :])
    prompt_mask = jnp.asarray(
        (np.arange(canvas_length) < len(prompt))[None, :])

    @jax.jit
    def predict(params, lora, ids):
        from .decoder import logits_fn

        logits = logits_fn(params, lora, ids, cfg, remat=False)
        return logits[0]

    n_masked0 = canvas_length - len(prompt)
    for step in range(steps):
        logits = predict(model.params, model.lora, canvas)
        if temperature > 0:
            key, sk = jax.random.split(key)
            choice = jax.random.categorical(sk, logits / temperature)
        else:
            choice = jnp.argmax(logits, axis=-1)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        conf = jnp.take_along_axis(probs, choice[:, None], -1)[:, 0]
        still_masked = (canvas[0] == mid) & ~prompt_mask[0]
        # linear schedule: by step k, keep (k+1)/steps of tokens unmasked
        target_unmasked = int(n_masked0 * (step + 1) / steps)
        already = int(jnp.sum(~still_masked & ~prompt_mask[0]))
        k = max(target_unmasked - already, 0)
        if k == 0:
            continue
        conf = jnp.where(still_masked, conf, -jnp.inf)
        thresh = jnp.sort(conf)[-k] if k > 0 else jnp.inf
        commit = still_masked & (conf >= thresh)
        canvas = jnp.where(commit[None, :], choice[None, :], canvas)
    return [int(x) for x in np.asarray(canvas[0])]
