"""On-device generation loop.

Parity target: `model.fast_generate` / `unsloth_fast_generate` (reference:
models/llama.py:2152 and the vLLM `fast_generate` binding _utils.py:3681).

TPU design: prefill is one jitted call; the decode loop is a
`lax.while_loop` inside a second jitted call, so the entire generation —
sampling included — runs on device with zero per-token host round-trips.
Static shapes: prompts are left-padded to a bucket length, output buffer is
[B, max_new_tokens]. Greedy / temperature / top-k / top-p sampling.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .decode import KVCache, forward_with_cache, init_cache, \
    logits_from_hidden


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """vLLM-compatible surface (reference: rl.py:89 vLLMSamplingParams)."""

    max_tokens: int = 128
    temperature: float = 0.0        # 0 => greedy
    top_p: float = 1.0
    top_k: int = 0                  # 0 => off
    seed: int = 0
    stop_token_ids: tuple = ()


def _sample(logits, key, p: SamplingParams):
    """logits [B, V] -> tokens [B]."""
    if p.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits.astype(jnp.float32) / p.temperature
    if p.top_k > 0:
        kth = jax.lax.top_k(logits, p.top_k)[0][:, -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if p.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p
        cutoff_idx = jnp.sum(cum < p.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


# Quantized KV cache for serving (the llama.cpp --cache-type-k/v q8_0
# and vLLM fp8-KV analog): halves decode-cache HBM; attention upcasts
# to f32 on read so only storage precision changes.
KV_CACHE_DTYPES = {
    "bf16": jnp.bfloat16,
    "fp8_e4m3": jnp.float8_e4m3fn,
    "fp8_e5m2": jnp.float8_e5m2,
}


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "sampling", "n_fanout",
                     "kv_dtype"))
def _generate_jit(params, lora, prompt_ids, prompt_mask, cfg, rng,
                  max_new_tokens, eos_ids, sampling: SamplingParams,
                  n_fanout: int = 1, kv_dtype: str = "bf16"):
    """n_fanout > 1: each prompt is prefilled ONCE and its KV cache tiled
    into n_fanout independent decode streams — the TPU formulation of the
    reference's PrefixGrouper / GRPO shared-prefix dedup (reference:
    utils/prefix_grouper.py — completions sharing a prompt attend the
    prefix once)."""
    b, t_prompt = prompt_ids.shape
    total = t_prompt + max_new_tokens
    cache = init_cache(cfg, b, total, dtype=KV_CACHE_DTYPES[kv_dtype])

    # positions: left-padded prompts start at 0 on their first real token
    first_real = jnp.argmax(prompt_mask.astype(jnp.int32), axis=1)   # [B]
    positions = jnp.arange(t_prompt, dtype=jnp.int32)[None] - first_real[:, None]
    positions = jnp.maximum(positions, 0)

    pad_slots = jnp.zeros((b, total), bool).at[:, :t_prompt].set(
        ~prompt_mask.astype(bool))
    kv_valid_extra = ~pad_slots

    h, cache = forward_with_cache(
        params, lora, prompt_ids, cfg, cache,
        positions=positions, kv_valid_extra=kv_valid_extra)
    last_h = h[:, -1, :]
    logits = logits_from_hidden(params, last_h, cfg, lora)

    next_positions = positions[:, -1] + 1                           # [B]

    if n_fanout > 1:
        # tile prefill results across fanout streams: [B] -> [B*G]
        def tile(x):
            return jnp.repeat(x, n_fanout, axis=0)

        cache = KVCache(k=[tile(k) for k in cache.k],
                        v=[tile(v) for v in cache.v],
                        length=cache.length,
                        conv=[tile(c) for c in cache.conv]
                        if cache.conv is not None else None,
                        ssm=[tile(s) for s in cache.ssm]
                        if cache.ssm is not None else None)
        logits = tile(logits)
        next_positions = tile(next_positions)
        kv_valid_extra = tile(kv_valid_extra)
        b = b * n_fanout

    key0 = jax.random.PRNGKey(sampling.seed) if rng is None else rng
    tok0 = _sample(logits, key0, sampling)

    out_buf = jnp.zeros((b, max_new_tokens), jnp.int32)
    out_buf = out_buf.at[:, 0].set(tok0)
    done0 = jnp.isin(tok0, eos_ids) if eos_ids.size else jnp.zeros((b,), bool)

    def cond(state):
        i, _, _, _, done, _, _ = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, cache, tok, pos, done, out_buf, key = state
        h, cache = forward_with_cache(
            params, lora, tok[:, None], cfg, cache,
            positions=pos[:, None], kv_valid_extra=kv_valid_extra)
        logits = logits_from_hidden(params, h, cfg, lora)[:, 0]
        key, sub = jax.random.split(key)
        nxt = _sample(logits, sub, sampling)
        nxt = jnp.where(done, 0, nxt)
        out_buf = jax.lax.dynamic_update_slice_in_dim(
            out_buf, nxt[:, None], i, axis=1)
        newly_done = jnp.isin(nxt, eos_ids) if eos_ids.size else \
            jnp.zeros((b,), bool)
        return (i + 1, cache, nxt, pos + 1, done | newly_done, out_buf, key)

    state = (jnp.int32(1), cache, tok0, next_positions, done0, out_buf, key0)
    _, _, _, _, done, out_buf, _ = jax.lax.while_loop(cond, body, state)
    return out_buf


def generate(
    model,
    prompts: Union[Sequence[str], np.ndarray, Sequence[Sequence[int]]],
    sampling_params: Optional[SamplingParams] = None,
    *,
    max_new_tokens: Optional[int] = None,
    temperature: Optional[float] = None,
    tokenizer=None,
    skip_special_tokens: bool = True,
    return_token_ids: bool = False,
    num_return_sequences: int = 1,
    speculative: bool = False,
    draft_len: int = 5,
    lora: Any = "__model__",
    kv_cache_dtype: str = "bf16",
):
    """High-level generate: strings or token-id lists in, strings (or ids)
    out. This is `model.fast_generate` in the reference API.

    num_return_sequences=G returns G completions per prompt (grouped
    consecutively) with the prompt prefilled once — shared-prefix
    dedup for GRPO rollouts.

    speculative=True enables n-gram (prompt-lookup) speculative decoding
    — exact greedy output in fewer weight passes (inference/
    speculative.py; the reference reaches this via vLLM's ngram
    speculative config). Requires temperature 0, plain-attention model,
    num_return_sequences 1; silently falls back otherwise.

    lora: adapter override for multi-LoRA serving — a LoRA pytree (or
    None for the bare base model); defaults to model.lora. Same shapes
    hit the same compiled program, so switching adapters per request is
    a data swap, not a recompile.

    kv_cache_dtype: "bf16" (default) | "fp8_e4m3" | "fp8_e5m2" — store
    the KV cache at reduced precision (the llama.cpp --cache-type-k/v /
    vLLM fp8-KV analog); attention math stays f32 on read."""
    sampling = sampling_params or SamplingParams()
    if max_new_tokens is not None:
        sampling = dataclasses.replace(sampling, max_tokens=max_new_tokens)
    if temperature is not None:
        sampling = dataclasses.replace(sampling, temperature=temperature)

    tok = tokenizer or model.tokenizer
    if isinstance(prompts, (str,)):
        prompts = [prompts]
    if prompts and isinstance(prompts[0], str):
        assert tok is not None, "string prompts require a tokenizer"
        encoded = [tok(p)["input_ids"] for p in prompts]
    else:
        encoded = [list(p) for p in prompts]

    b = len(encoded)
    t_prompt = max(len(e) for e in encoded)
    # bucket to multiple of 64 for compile-cache reuse
    t_prompt = ((t_prompt + 63) // 64) * 64
    pad_id = 0
    prompt_ids = np.full((b, t_prompt), pad_id, np.int32)
    prompt_mask = np.zeros((b, t_prompt), np.int32)
    for i, e in enumerate(encoded):
        prompt_ids[i, t_prompt - len(e):] = e       # left padding
        prompt_mask[i, t_prompt - len(e):] = 1

    eos = []
    if tok is not None and getattr(tok, "eos_token_id", None) is not None:
        eos.append(int(tok.eos_token_id))
    if model.cfg.eos_token_id is not None:
        eos.append(int(model.cfg.eos_token_id))
    eos.extend(sampling.stop_token_ids)
    eos_ids = jnp.asarray(sorted(set(eos)), jnp.int32)

    lora_tree = model.lora if isinstance(lora, str) \
        and lora == "__model__" else lora
    use_spec = False
    if speculative and sampling.temperature == 0.0 \
            and num_return_sequences == 1:
        from .speculative import supports_ngram_spec

        use_spec = supports_ngram_spec(model.cfg)
    if use_spec:
        from .speculative import _generate_ngram_spec_jit

        out, _ = _generate_ngram_spec_jit(
            model.params, lora_tree, jnp.asarray(prompt_ids),
            jnp.asarray(prompt_mask), model.cfg,
            sampling.max_tokens, eos_ids, draft_len=draft_len)
    else:
        out = _generate_jit(
            model.params, lora_tree, jnp.asarray(prompt_ids),
            jnp.asarray(prompt_mask), model.cfg,
            jax.random.PRNGKey(sampling.seed),
            sampling.max_tokens, eos_ids, sampling,
            n_fanout=num_return_sequences, kv_dtype=kv_cache_dtype)
    out = np.asarray(jax.device_get(out))

    n_out = b * num_return_sequences
    if return_token_ids or tok is None:
        results = []
        for i in range(n_out):
            ids = out[i].tolist()
            ids = _trim_eos(ids, set(int(e) for e in eos))
            results.append(ids)
        return results
    texts = []
    for i in range(n_out):
        ids = _trim_eos(out[i].tolist(), set(int(e) for e in eos))
        texts.append(tok.decode(ids, skip_special_tokens=skip_special_tokens))
    return texts


def _trim_eos(ids: List[int], eos: set) -> List[int]:
    result = []
    for t in ids:
        if t in eos:
            break
        result.append(t)
    return result


# ---------------------------------------------------------------------------
# VLM generation — prefill with spliced image embeddings, text decode
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("cfg", "max_new_tokens", "sampling"))
def _generate_vision_jit(params, lora, embeds, spans, prompt_ids,
                         prompt_mask, cfg, rng, max_new_tokens, eos_ids,
                         sampling: SamplingParams):
    """Cached VLM decode: the prefill consumes pre-built multimodal
    embeddings (image features spliced by embed_multimodal; gemma-3
    image spans attend bidirectionally via the span mask in
    decode._attend_cached); new tokens are text and run the standard
    decode loop. The reference reaches VLM inference through HF
    generate / llama.cpp mmproj sidecars (reference: models/vision.py
    unsloth_base_fast_generate :502)."""
    b, t_prompt = prompt_ids.shape
    total = t_prompt + max_new_tokens
    cache = init_cache(cfg, b, total, dtype=jnp.bfloat16)

    first_real = jnp.argmax(prompt_mask.astype(jnp.int32), axis=1)
    positions = jnp.arange(t_prompt, dtype=jnp.int32)[None] \
        - first_real[:, None]
    positions = jnp.maximum(positions, 0)
    pad_slots = jnp.zeros((b, total), bool).at[:, :t_prompt].set(
        ~prompt_mask.astype(bool))
    kv_valid_extra = ~pad_slots

    h, cache = forward_with_cache(
        params, lora, prompt_ids, cfg, cache,
        positions=positions, kv_valid_extra=kv_valid_extra,
        inputs_embeds=embeds, image_spans=spans)
    logits = logits_from_hidden(params, h[:, -1, :], cfg, lora)
    key0 = jax.random.PRNGKey(sampling.seed) if rng is None else rng
    tok0 = _sample(logits, key0, sampling)

    out_buf = jnp.zeros((b, max_new_tokens), jnp.int32)
    out_buf = out_buf.at[:, 0].set(tok0)
    done0 = jnp.isin(tok0, eos_ids) if eos_ids.size \
        else jnp.zeros((b,), bool)

    def cond(state):
        i, _, _, _, done, _, _ = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, cache, tok, pos, done, out_buf, key = state
        h, cache = forward_with_cache(
            params, lora, tok[:, None], cfg, cache,
            positions=pos[:, None], kv_valid_extra=kv_valid_extra)
        logits = logits_from_hidden(params, h, cfg, lora)[:, 0]
        key, sub = jax.random.split(key)
        nxt = _sample(logits, sub, sampling)
        nxt = jnp.where(done, 0, nxt)
        out_buf = jax.lax.dynamic_update_slice_in_dim(
            out_buf, nxt[:, None], i, axis=1)
        newly = jnp.isin(nxt, eos_ids) if eos_ids.size \
            else jnp.zeros((b,), bool)
        return (i + 1, cache, nxt, pos + 1, done | newly, out_buf, key)

    state = (jnp.int32(1), cache, tok0, positions[:, -1] + 1, done0,
             out_buf, key0)
    out = jax.lax.while_loop(cond, body, state)
    return out[5]


def generate_vision(model, prompts, images, sampling_params=None, *,
                    max_new_tokens: Optional[int] = None,
                    temperature: Optional[float] = None,
                    tokenizer=None, skip_special_tokens: bool = True,
                    return_token_ids: bool = False):
    """Multimodal generate: per-prompt image lists + text prompts.

    images: list (per prompt) of lists of preprocessed pixel arrays
    [C, H, W] (the model family's expected pixel_values rows). Prompts
    without the model's image placeholder get one span per image
    prepended (llava-style, mirroring trainer/dpo.py vision rows).
    """
    import dataclasses as _dc

    sampling = sampling_params or SamplingParams()
    if max_new_tokens is not None:
        sampling = _dc.replace(sampling, max_tokens=max_new_tokens)
    if temperature is not None:
        sampling = _dc.replace(sampling, temperature=temperature)
    tok = tokenizer or model.tokenizer
    if isinstance(prompts, str):
        prompts = [prompts]
        images = [images]

    img_id = model.image_token_id
    n_tok = model.mm_tokens_per_image
    rows, pixel_rows = [], []
    for p, imgs in zip(prompts, images):
        ids = tok(p)["input_ids"] if isinstance(p, str) else list(p)
        imgs = list(imgs or [])
        if imgs and img_id not in ids:
            ids = [img_id] * (n_tok * len(imgs)) + ids
        rows.append(ids)
        pixel_rows.extend(imgs)

    b = len(rows)
    t_prompt = ((max(len(r) for r in rows) + 63) // 64) * 64
    prompt_ids = np.zeros((b, t_prompt), np.int32)
    prompt_mask = np.zeros((b, t_prompt), np.int32)
    for i, r in enumerate(rows):
        prompt_ids[i, t_prompt - len(r):] = r
        prompt_mask[i, t_prompt - len(r):] = 1

    if not pixel_rows:
        # no images: plain text generate
        return generate(model, [list(r) for r in rows], sampling,
                        tokenizer=tok,
                        skip_special_tokens=skip_special_tokens,
                        return_token_ids=return_token_ids)
    pixels = jnp.asarray(np.stack(pixel_rows))
    ids_j = jnp.asarray(prompt_ids)
    embeds, spans = model.embed_multimodal(ids_j, pixels)

    eos = []
    if tok is not None and getattr(tok, "eos_token_id", None) is not None:
        eos.append(int(tok.eos_token_id))
    if model.cfg.eos_token_id is not None:
        eos.append(int(model.cfg.eos_token_id))
    eos_ids = jnp.asarray(sorted(set(eos)), jnp.int32)

    out = _generate_vision_jit(
        model.params, model.lora, embeds, spans, ids_j,
        jnp.asarray(prompt_mask), model.cfg,
        jax.random.PRNGKey(sampling.seed), sampling.max_tokens,
        eos_ids, sampling)
    out = np.asarray(jax.device_get(out))
    eos_set = set(int(e) for e in eos)
    results = []
    for i in range(b):
        ids = _trim_eos(out[i].tolist(), eos_set)
        if return_token_ids or tok is None:
            results.append(ids)
        else:
            results.append(tok.decode(
                ids, skip_special_tokens=skip_special_tokens))
    return results


@functools.partial(
    jax.jit, static_argnames=("cfg", "max_new_tokens", "sampling"))
def _generate_qwen_vl_jit(params, lora, embeds, mrope_pos, prompt_ids,
                          prompt_mask, cfg, rng, max_new_tokens, eos_ids,
                          sampling: SamplingParams,
                          deepstack_embeds=None):
    """Qwen-VL cached decode: prefill with spliced image embeddings and
    M-RoPE [B, 3, T] positions; generated text tokens advance all three
    streams uniformly (HF get_rope_index semantics), which reduces to
    standard 1-D rope at max(final position)+1 — so the decode loop is
    the plain text loop started at that position."""
    b, t_prompt = prompt_ids.shape
    total = t_prompt + max_new_tokens
    cache = init_cache(cfg, b, total, dtype=jnp.bfloat16)

    pad_slots = jnp.zeros((b, total), bool).at[:, :t_prompt].set(
        ~prompt_mask.astype(bool))
    kv_valid_extra = ~pad_slots
    # causal positions for the prefill mask bookkeeping come from the
    # T stream (monotone over text) — attention causality itself is
    # slot-order, so only rope uses mrope_pos
    positions = mrope_pos[:, 0, :]

    h, cache = forward_with_cache(
        params, lora, prompt_ids, cfg, cache,
        positions=positions, kv_valid_extra=kv_valid_extra,
        inputs_embeds=embeds, mrope_positions=mrope_pos,
        deepstack_embeds=deepstack_embeds)
    logits = logits_from_hidden(params, h[:, -1, :], cfg, lora)
    key0 = jax.random.PRNGKey(sampling.seed) if rng is None else rng
    tok0 = _sample(logits, key0, sampling)

    # next position value = max over the three streams' final entries + 1
    pos0 = jnp.max(mrope_pos[:, :, -1], axis=1) + 1           # [B]

    out_buf = jnp.zeros((b, max_new_tokens), jnp.int32)
    out_buf = out_buf.at[:, 0].set(tok0)
    done0 = jnp.isin(tok0, eos_ids) if eos_ids.size \
        else jnp.zeros((b,), bool)

    def cond(state):
        i = state[0]
        done = state[4]
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, cache, tok, pos, done, out_buf, key = state
        h, cache = forward_with_cache(
            params, lora, tok[:, None], cfg, cache,
            positions=pos[:, None], kv_valid_extra=kv_valid_extra)
        logits = logits_from_hidden(params, h, cfg, lora)[:, 0]
        key, sub = jax.random.split(key)
        nxt = _sample(logits, sub, sampling)
        nxt = jnp.where(done, 0, nxt)
        out_buf = jax.lax.dynamic_update_slice_in_dim(
            out_buf, nxt[:, None], i, axis=1)
        newly = jnp.isin(nxt, eos_ids) if eos_ids.size \
            else jnp.zeros((b,), bool)
        return (i + 1, cache, nxt, pos + 1, done | newly, out_buf, key)

    state = (jnp.int32(1), cache, tok0, pos0, done0, out_buf, key0)
    return jax.lax.while_loop(cond, body, state)[5]


def generate_qwen_vl(model, prompts, pixel_patches, grids,
                     sampling_params=None, *,
                     max_new_tokens: Optional[int] = None,
                     temperature: Optional[float] = None,
                     tokenizer=None, skip_special_tokens: bool = True,
                     return_token_ids: bool = False):
    """Qwen2/2.5-VL generation. prompts: token-id lists that ALREADY
    contain the vision_start/image-token/vision_end layout the HF
    processor emits (each image = t*(h/m)*(w/m) image tokens);
    pixel_patches: concatenated [N_patches_total, D] patch rows;
    grids: one (t, h, w) per image, order of appearance."""
    import dataclasses as _dc

    from ..models.qwen_vl import mrope_positions_for

    sampling = sampling_params or SamplingParams()
    if max_new_tokens is not None:
        sampling = _dc.replace(sampling, max_tokens=max_new_tokens)
    if temperature is not None:
        sampling = _dc.replace(sampling, temperature=temperature)
    tok = tokenizer or model.tokenizer

    rows = [tok(p)["input_ids"] if isinstance(p, str) else list(p)
            for p in prompts]
    b = len(rows)
    t_prompt = ((max(len(r) for r in rows) + 63) // 64) * 64
    prompt_ids = np.zeros((b, t_prompt), np.int32)
    prompt_mask = np.zeros((b, t_prompt), np.int32)
    mrope = np.zeros((b, 3, t_prompt), np.int32)
    img_cursor = 0
    merge = getattr(model, "spatial_merge_size", 2)
    for i, r in enumerate(rows):
        off = t_prompt - len(r)
        prompt_ids[i, off:] = r
        prompt_mask[i, off:] = 1
        row_grids = []
        n_img_tok = 0
        # count this row's images by walking its image tokens
        j = 0
        while j < len(r):
            if r[j] == model.image_token_id:
                g = grids[img_cursor + len(row_grids)]
                row_grids.append(g)
                j += g[0] * (g[1] // merge) * (g[2] // merge)
            else:
                j += 1
        img_cursor += len(row_grids)
        mrope[i, :, off:] = mrope_positions_for(
            np.asarray(r), model.image_token_id, row_grids, merge=merge)

    ids_j = jnp.asarray(prompt_ids)
    embeds, _ = model.embed_multimodal(ids_j, jnp.asarray(pixel_patches),
                                       list(map(tuple, grids)))

    eos = []
    if tok is not None and getattr(tok, "eos_token_id", None) is not None:
        eos.append(int(tok.eos_token_id))
    if model.cfg.eos_token_id is not None:
        eos.append(int(model.cfg.eos_token_id))
    eos_ids = jnp.asarray(sorted(set(eos)), jnp.int32)

    out = _generate_qwen_vl_jit(
        model.params, model.lora, embeds, jnp.asarray(mrope), ids_j,
        jnp.asarray(prompt_mask), model.cfg,
        jax.random.PRNGKey(sampling.seed), sampling.max_tokens, eos_ids,
        sampling)
    out = np.asarray(jax.device_get(out))
    eos_set = set(int(e) for e in eos)
    results = []
    for i in range(b):
        ids = _trim_eos(out[i].tolist(), eos_set)
        results.append(ids if return_token_ids or tok is None
                       else tok.decode(
                           ids, skip_special_tokens=skip_special_tokens))
    return results


def generate_qwen3_vl(model, prompts, pixel_patches, grids,
                      sampling_params=None, *,
                      max_new_tokens: Optional[int] = None,
                      temperature: Optional[float] = None,
                      tokenizer=None, skip_special_tokens: bool = True,
                      return_token_ids: bool = False):
    """Qwen3-VL generation: the qwen M-RoPE loop plus DeepStack
    injection (early-ViT merged features added after the first text
    layers during the prefill). embed_multimodal computes the
    (interleaved) M-RoPE positions itself; a uniform left-pad shift is
    harmless because rope attention depends only on position
    differences."""
    import dataclasses as _dc

    sampling = sampling_params or SamplingParams()
    if max_new_tokens is not None:
        sampling = _dc.replace(sampling, max_tokens=max_new_tokens)
    if temperature is not None:
        sampling = _dc.replace(sampling, temperature=temperature)
    tok = tokenizer or model.tokenizer

    rows = [tok(p)["input_ids"] if isinstance(p, str) else list(p)
            for p in prompts]
    b = len(rows)
    t_prompt = ((max(len(r) for r in rows) + 63) // 64) * 64
    prompt_ids = np.zeros((b, t_prompt), np.int32)
    prompt_mask = np.zeros((b, t_prompt), np.int32)
    for i, r in enumerate(rows):
        prompt_ids[i, t_prompt - len(r):] = r
        prompt_mask[i, t_prompt - len(r):] = 1

    ids_j = jnp.asarray(prompt_ids)
    embeds, mpos, ds = model.embed_multimodal(
        ids_j, jnp.asarray(pixel_patches), list(map(tuple, grids)))

    eos = []
    if tok is not None and getattr(tok, "eos_token_id", None) is not None:
        eos.append(int(tok.eos_token_id))
    if model.cfg.eos_token_id is not None:
        eos.append(int(model.cfg.eos_token_id))
    eos_ids = jnp.asarray(sorted(set(eos)), jnp.int32)

    out = _generate_qwen_vl_jit(
        model.params, model.lora, embeds, mpos, ids_j,
        jnp.asarray(prompt_mask), model.cfg,
        jax.random.PRNGKey(sampling.seed), sampling.max_tokens, eos_ids,
        sampling, deepstack_embeds=ds)
    out = np.asarray(jax.device_get(out))
    eos_set = set(int(e) for e in eos)
    results = []
    for i in range(b):
        ids = _trim_eos(out[i].tolist(), eos_set)
        results.append(ids if return_token_ids or tok is None
                       else tok.decode(
                           ids, skip_special_tokens=skip_special_tokens))
    return results
