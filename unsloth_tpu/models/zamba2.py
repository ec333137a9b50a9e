"""Zamba2 — all-mamba2 stack with cycled SHARED transformer blocks.

Parity target: HF Zamba2ForCausalLM (Zyphra Zamba2-1.2B/2.7B/7B; a
shared-block hybrid beyond the reference's catalog — the reference loads
novel archs via FastModel's auto path, models/loader.py:820-897).

Architecture (fig. 2 of the Zamba papers, HF Zamba2Model):
  * every layer runs a mamba2 (SSD) mixer with a plain residual;
  * `hybrid` layers FIRST run one of `num_mem_blocks` shared transformer
    blocks over concat([hidden, original_embeddings]) (blocks cycle over
    hybrid layers), project the result with a per-layer linear and add it
    to the mamba input;
  * the shared blocks carry per-hybrid-layer rank-`adapter_rank` adapters
    ("LoRA in the base model") on q/k/v and gate_up.

TPU design: the shared blocks are stored ONCE in the pytree (the sharing
the torch module system expresses by object identity is just aliasing in
a functional tree), so each hybrid layer's einsums hit the same HBM
weights; the mamba mixer reuses `ops.ssm.mamba2_mixer` (MXU chunked SSD
scan). Zamba2's gated RMSNorm groups == n_groups; with the standard
n_groups=1 it equals the falcon-h1 full-width gated norm the mixer
implements.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.activations import act_for
from ..ops.attention import attention
from ..ops.lora import lora_matmul
from ..ops.rms_norm import rms_norm
from ..ops.rope import apply_rope_qk
from ..ops.ssm import mamba2_mixer


def _rms(x, w, eps):
    return rms_norm(x, w, eps, False)


def _shared_block(x, orig, blk, lora_blk, lp, cfg, cos, sin, segment_ids,
                  positions):
    """One shared transformer block + per-layer adapters + linear
    (HF Zamba2AttentionDecoderLayer + Zamba2HybridLayer.linear).
    `lora_blk` holds trainable LoRA for the SHARED projections — zamba2's
    natural fine-tuning target (the base adapters are frozen weights)."""
    z = cfg.zamba
    b, t, d = x.shape
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    lb = lora_blk or {}

    cat = jnp.concatenate([x, orig], axis=-1)              # [B, T, 2D]
    h = _rms(cat, blk["input_norm"], cfg.rms_norm_eps)

    def proj(name):
        y = lora_matmul(h, blk[name], lb.get(name))
        if z.use_attn_adapter:
            a = h @ lp[f"adapter_{name}_a"].T.astype(h.dtype)
            y = y + a @ lp[f"adapter_{name}_b"].T.astype(h.dtype)
        return y

    q = proj("q").reshape(b, t, hq, dh)
    k = proj("k").reshape(b, t, hkv, dh)
    v = proj("v").reshape(b, t, hkv, dh)
    if z.use_rope:
        q, k = apply_rope_qk(q, k, cos, sin)
    a = attention(q, k, v, causal=True, segment_ids=segment_ids,
                  scale=cfg.attn_logit_scale, positions=positions)
    a = lora_matmul(a.reshape(b, t, hq * dh), blk["o"], lb.get("o"))

    h2 = _rms(a, blk["pre_ff_norm"], cfg.rms_norm_eps)
    gu = lora_matmul(h2, blk["gate_up"], lb.get("gate_up"))
    ga = h2 @ lp["adapter_gu_a"].T.astype(h2.dtype)
    gu = gu + ga @ lp["adapter_gu_b"].T.astype(h2.dtype)
    gate, up = jnp.split(gu, 2, axis=-1)
    act = act_for(cfg.hidden_act)
    mlp = act(gate) * up
    out = lora_matmul(mlp, blk["down"], lb.get("down"))
    return out @ lp["linear"].T.astype(out.dtype)


def zamba2_forward_with_cache(params, lora, input_ids, cfg, cache, *,
                              positions, kv_valid_extra=None):
    """Zamba2 decode: mamba conv+SSM state rides cache.conv/ssm (the
    standard mamba2 allocation); hybrid layers also write the shared
    transformer's K/V (over the concat width) into cache.k/v. The
    original-embedding stream `orig` is just the CURRENT tokens' embeds —
    it needs no cache (each position only concatenates its own)."""
    from ..inference.decode import KVCache, _attend_cached
    from .decoder import _rope_tables, mamba_call_kwargs
    from ..ops.ssm import mamba2_mixer, mamba2_mixer_step

    z = cfg.zamba
    mc = cfg.mamba
    b, t = input_ids.shape
    embed_w = (lora or {}).get("embed")
    if embed_w is None:
        embed_w = params["embed"]
    x = jnp.take(embed_w, input_ids, axis=0)
    orig = x

    cos = sin = None
    if z.use_rope:
        cos, sin, _, _ = _rope_tables(cfg, positions)
    s_max = cache.k[0].shape[1]
    kv_slots = jnp.arange(s_max, dtype=jnp.int32)[None]
    kv_valid = jnp.broadcast_to(kv_slots < (cache.length + t), (b, s_max))
    if kv_valid_extra is not None:
        kv_valid = kv_valid & kv_valid_extra
    q_slots = cache.length + jnp.arange(t, dtype=jnp.int32)[None]
    q_slots = jnp.broadcast_to(q_slots, (b, t))
    if kv_valid_extra is not None and t > 1:
        pad_mask = jax.lax.dynamic_slice(
            kv_valid_extra.astype(jnp.float32), (0, cache.length), (b, t))
    else:
        pad_mask = None

    hybrid_of = {li: g for g, li in enumerate(z.hybrid_ids)}
    lora_blocks = (lora or {}).get("blocks")
    hq, dh = cfg.num_heads, cfg.head_dim
    new_k, new_v, new_conv, new_ssm = [], [], [], []
    for i, lp in enumerate(params["layers"]):
        g = hybrid_of.get(i)
        residual = x
        if g is not None:
            blk = params["blocks"][g % z.num_mem_blocks]
            lb = (lora_blocks[g % z.num_mem_blocks]
                  if lora_blocks else None) or {}
            cat = jnp.concatenate([x, orig], axis=-1)
            h = _rms(cat, blk["input_norm"], cfg.rms_norm_eps)

            def proj(name):
                y = lora_matmul(h, blk[name], lb.get(name))
                if z.use_attn_adapter:
                    a_ = h @ lp[f"adapter_{name}_a"].T.astype(h.dtype)
                    y = y + a_ @ lp[f"adapter_{name}_b"].T.astype(h.dtype)
                return y

            q = proj("q").reshape(b, t, hq, dh)
            k = proj("k").reshape(b, t, hq, dh)
            v = proj("v").reshape(b, t, hq, dh)
            if z.use_rope:
                q, k = apply_rope_qk(q, k, cos, sin)
            k_cache = jax.lax.dynamic_update_slice(
                cache.k[i], k.astype(cache.k[i].dtype),
                (0, cache.length, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                cache.v[i], v.astype(cache.v[i].dtype),
                (0, cache.length, 0, 0))
            new_k.append(k_cache)
            new_v.append(v_cache)
            a = _attend_cached(q, k_cache, v_cache, q_slots=q_slots,
                               kv_len_mask=kv_valid, window=None,
                               softcap=None, scale=cfg.attn_logit_scale)
            a = lora_matmul(a.reshape(b, t, hq * dh), blk["o"],
                            lb.get("o"))
            h2 = _rms(a, blk["pre_ff_norm"], cfg.rms_norm_eps)
            gu = lora_matmul(h2, blk["gate_up"], lb.get("gate_up"))
            ga = h2 @ lp["adapter_gu_a"].T.astype(h2.dtype)
            gu = gu + ga @ lp["adapter_gu_b"].T.astype(h2.dtype)
            gate, up = jnp.split(gu, 2, axis=-1)
            act = act_for(cfg.hidden_act)
            mlp = act(gate) * up
            out = lora_matmul(mlp, blk["down"], lb.get("down"))
            tr = out @ lp["linear"].T.astype(out.dtype)
            x = x + tr
        else:
            new_k.append(cache.k[i])
            new_v.append(cache.v[i])
        h = _rms(x, lp["input_norm"], cfg.rms_norm_eps)
        p, kw = mamba_call_kwargs(lp, cfg)
        if t == 1:
            y, (cs, ss) = mamba2_mixer_step(
                h, p, (cache.conv[i], cache.ssm[i]), **kw)
        else:
            y, (cs, ss) = mamba2_mixer(
                h, p, chunk_size=mc.chunk_size, padding_mask=pad_mask,
                return_state=True, **kw)
        new_conv.append(cs)
        new_ssm.append(ss)
        x = residual + y

    x = _rms(x, params["final_norm"], cfg.rms_norm_eps)
    return x, KVCache(k=new_k, v=new_v, length=cache.length + t,
                      conv=new_conv, ssm=new_ssm)


def zamba2_forward(
    params: Dict[str, Any],
    lora: Optional[Dict[str, Any]],
    input_ids: jnp.ndarray,
    cfg,
    *,
    positions: Optional[jnp.ndarray] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    remat: Any = True,
    remat_policy: Optional[Any] = None,
    **_ignored,
) -> jnp.ndarray:
    """Full Zamba2 stack; returns final hidden [B, T, D]."""
    from .decoder import _rope_tables, mamba_call_kwargs

    z = cfg.zamba
    mc = cfg.mamba
    b, t = input_ids.shape
    embed_w = (lora or {}).get("embed")
    if embed_w is None:
        embed_w = params["embed"]
    x = jnp.take(embed_w, input_ids, axis=0)
    orig = x

    if positions is None:
        positions = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    cos = sin = None
    if z.use_rope:
        cos, sin, _, _ = _rope_tables(cfg, positions)
    pad = None
    if segment_ids is not None:
        pad = (segment_ids != 0).astype(jnp.float32)

    hybrid_of = {li: g for g, li in enumerate(z.hybrid_ids)}
    lora_blocks = (lora or {}).get("blocks")

    def layer_fn(x, i, lp):
        g = hybrid_of.get(i)
        residual = x
        if g is not None:
            bi = g % z.num_mem_blocks
            blk = params["blocks"][bi]
            lora_blk = lora_blocks[bi] if lora_blocks else None
            tr = _shared_block(x, orig, blk, lora_blk, lp, cfg, cos, sin,
                               segment_ids, positions)
            x = x + tr
        h = _rms(x, lp["input_norm"], cfg.rms_norm_eps)
        p, kw = mamba_call_kwargs(lp, cfg)
        y = mamba2_mixer(h, p, chunk_size=mc.chunk_size,
                         padding_mask=pad, **kw)
        return residual + y

    for i, lp in enumerate(params["layers"]):
        fn = partial(layer_fn, i=i, lp=lp)
        if remat:
            fn = jax.checkpoint(fn, policy=remat_policy)
        x = fn(x)

    return _rms(x, params["final_norm"], cfg.rms_norm_eps)
