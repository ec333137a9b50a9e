"""N-gram (prompt-lookup) speculative decoding — exact greedy decode in
fewer forward passes.

Decode on a v5e is weight-bound: every 1-token step streams the full
weight set from HBM (BASELINE_notes.md decode roofline). Speculation
amortizes that stream over several tokens per step: draft a continuation
by matching the last bigram against the existing context (prompt-lookup
decoding — no draft model), verify the whole block in ONE forward, and
accept the longest prefix that greedy decoding would have produced. The
output is exactly the plain greedy output; only the number of weight
passes changes. The reference reaches the same feature through vLLM's
ngram speculative config; here it is native to the jitted decode loop.

TPU-shaped design: no cache rewind. Each iteration writes its K-token
block into fresh cache slots (slot order = arrival order = causality in
`_attend_cached`), and rejected draft slots are masked off forever via
the persistent `kv_valid_extra` mask — a [B, S] bool update instead of
per-row dynamic cache truncation, which would not jit. Costs cache
slots (up to draft_len per emitted token in the worst case); decode
memory is small next to weights.

Gated to plain-KV models (no sliding window — the window mask measures
SLOT distance, which diverges from token distance once rejected slots
interleave; no recurrent/hybrid state — conv/SSM states cannot unwind
rejected tokens).

Exactness caveat: the verify forward evaluates the same tokens with a
multi-token query block, so its logits differ from the 1-token loop's
by floating-point reduction order. Verified bit-identical in f32 on the
TPU (4096-vocab mid model, zero mismatches); in bf16, argmax TIES can
break differently — visible on random-init models whose logits are
near-degenerate, immaterial for trained models with sharp argmax gaps
(the same caveat applies to vLLM's ngram speculative decoding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .decode import forward_with_cache, init_cache, logits_from_hidden


def supports_ngram_spec(cfg) -> bool:
    """Plain-attention causal models only (see module docstring)."""
    pattern_ok = all(p == "global" for p in (cfg.layer_pattern or ()))
    return (cfg.mla is None and cfg.mamba is None and cfg.gdn is None
            and cfg.lightning is None and cfg.zamba is None
            and getattr(cfg, "altup", None) is None
            and not cfg.short_conv_l
            and cfg.sliding_window is None and pattern_ok)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "draft_len"))
def _generate_ngram_spec_jit(params, lora, prompt_ids, prompt_mask, cfg,
                             max_new_tokens, eos_ids,
                             draft_len: int = 5):
    """Greedy decode with bigram-lookup drafts of draft_len-1 tokens.

    Returns (out_buf [B, max_new_tokens], n_forward_passes []) — the
    token output is bit-identical to `_generate_jit` at temperature 0.
    """
    k_blk = draft_len                       # tokens per verify forward
    b, t_prompt = prompt_ids.shape
    total_slots = t_prompt + k_blk * max_new_tokens + k_blk
    cache = init_cache(cfg, b, total_slots, dtype=jnp.bfloat16)

    first_real = jnp.argmax(prompt_mask.astype(jnp.int32), axis=1)  # [B]
    positions = jnp.arange(t_prompt, dtype=jnp.int32)[None] \
        - first_real[:, None]
    positions = jnp.maximum(positions, 0)

    valid = jnp.ones((b, total_slots), bool)
    valid = valid.at[:, :t_prompt].set(prompt_mask.astype(bool))

    h, cache = forward_with_cache(
        params, lora, prompt_ids, cfg, cache,
        positions=positions, kv_valid_extra=valid)
    logits = logits_from_hidden(params, h[:, -1, :], cfg, lora)
    tok0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    t_ctx = t_prompt + max_new_tokens + k_blk
    ctx = jnp.zeros((b, t_ctx), jnp.int32)
    ctx = ctx.at[:, :t_prompt].set(prompt_ids)
    ctx = ctx.at[:, t_prompt].set(tok0)

    out_buf = jnp.zeros((b, max_new_tokens + k_blk), jnp.int32)
    out_buf = out_buf.at[:, 0].set(tok0)
    done0 = jnp.isin(tok0, eos_ids) if eos_ids.size \
        else jnp.zeros((b,), bool)
    out_idx0 = jnp.ones((b,), jnp.int32)
    pos0 = positions[:, -1] + 1

    rows = jnp.arange(b)
    offs = jnp.arange(k_blk, dtype=jnp.int32)                    # [K]

    def cond(state):
        it, *_ = state
        done = state[5]
        return (it < max_new_tokens) & ~jnp.all(done)

    def body(state):
        it, cache, valid, cur, pos, done, out_idx, out_buf, ctx = state

        # ---- draft: last-bigram lookup in the context ----------------
        widx = t_prompt + out_idx                      # tokens in ctx [B]
        prev = ctx[rows, jnp.maximum(widx - 2, 0)]
        j_all = jnp.arange(t_ctx - 1, dtype=jnp.int32)[None]     # [1,C-1]
        eq = (ctx[:, :-1] == prev[:, None]) & (ctx[:, 1:] == cur[:, None])
        ok = (j_all >= first_real[:, None]) & (j_all < (widx - 2)[:, None])
        j_best = jnp.max(jnp.where(eq & ok, j_all, -1), axis=1)  # [B]
        found = j_best >= 0
        cont = j_best[:, None] + 2 + offs[None, :k_blk - 1]      # [B,K-1]
        cont = jnp.minimum(cont, t_ctx - 1)
        drafts = ctx[rows[:, None], cont]                        # [B,K-1]
        in_ctx = (j_best[:, None] + 2 + offs[None, :k_blk - 1]) \
            < widx[:, None]
        drafts = jnp.where(found[:, None] & in_ctx, drafts,
                           cur[:, None])                # fallback: repeat
        tokens_in = jnp.concatenate([cur[:, None], drafts], axis=1)

        # ---- verify the block in one forward --------------------------
        blk_pos = pos[:, None] + offs[None]
        h, cache = forward_with_cache(
            params, lora, tokens_in, cfg, cache,
            positions=blk_pos, kv_valid_extra=valid)
        logits = logits_from_hidden(params, h, cfg, lora)        # [B,K,V]
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)        # [B,K]

        match = tokens_in[:, 1:] == g[:, :-1]                    # [B,K-1]
        a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1),
                    axis=1)                                      # [B]
        eos_hit = jnp.isin(g, eos_ids) if eos_ids.size \
            else jnp.zeros_like(g, bool)
        allowed = offs[None] <= a[:, None]
        pos_eos = jnp.min(jnp.where(eos_hit & allowed, offs[None],
                                    k_blk), axis=1)              # [B]
        e = jnp.minimum(a + 1, pos_eos + 1)
        e = jnp.minimum(e, max_new_tokens - out_idx)
        e = jnp.where(done, 0, e)

        emit = offs[None] < e[:, None]                           # [B,K]
        cols = jnp.where(emit, out_idx[:, None] + offs[None],
                         max_new_tokens + k_blk - 1)
        out_buf = out_buf.at[rows[:, None], cols].set(
            jnp.where(emit, g, out_buf[rows[:, None], cols]))
        ccols = jnp.where(emit, widx[:, None] + offs[None], t_ctx - 1)
        ctx = ctx.at[rows[:, None], ccols].set(
            jnp.where(emit, g, ctx[rows[:, None], ccols]))

        # ---- mask rejected draft slots off forever --------------------
        # block slot i holds tokens_in[:, i]: slot 0 = cur (valid unless
        # the row was already done); slot i>=1 = draft i, a real context
        # token iff it matched AND its emitter g[i-1] was emitted
        blk_valid = jnp.where(
            offs[None] == 0, ~done[:, None],
            (offs[None] <= a[:, None]) & (offs[None] < e[:, None])
            & ~done[:, None])
        start = cache.length - k_blk          # slots this block wrote
        valid = jax.lax.dynamic_update_slice(
            valid, blk_valid, (jnp.int32(0), start))

        done = done | (pos_eos < e) | (out_idx + e >= max_new_tokens)
        cur = g[rows, jnp.maximum(e - 1, 0)]
        return (it + 1, cache, valid, cur, pos + e, done,
                out_idx + e, out_buf, ctx)

    state = (jnp.int32(1), cache, valid, tok0, pos0, done0, out_idx0,
             out_buf, ctx)
    out = jax.lax.while_loop(cond, body, state)
    n_iters = out[0]
    return out[7][:, :max_new_tokens], n_iters
