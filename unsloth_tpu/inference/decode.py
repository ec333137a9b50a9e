"""KV-cache decoding: prefill + single-token decode step.

Parity target: the reference's native fast generate
(reference: models/llama.py:2152 `unsloth_fast_generate` +
`LlamaModel_fast_forward_inference` :1243 — a hand-rolled decode loop with
preallocated paged buffers that bypasses HF generate overhead).

TPU design: the cache is a pytree of preallocated [L, B, S, Hkv, Dh] arrays
(static shapes); the decode step is one jitted function updating the cache
with `dynamic_update_slice` and attending with a position mask. The whole
sampling loop runs on-device inside `lax.while_loop` (see generate.py) —
zero host round-trips per token, the TPU-native replacement for both the
reference's Python decode loop and its vLLM colocation.

Numerics intentionally mirror models/decoder.py `forward`; the parity test
(tests/test_generate.py) asserts prefill+decode logits == training forward.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig
from ..models.decoder import _norm, _proj, _rope_tables
from ..ops.activations import glu_for
from ..ops.lora import base_matmul
from ..ops.rms_norm import rms_norm
from ..ops.rope import apply_rope_qk


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    k: Any   # list of [B, S, Hkv, Dh] per layer
    v: Any
    length: jnp.ndarray  # [] int32 — tokens already written
    # hybrid-mamba (falcon-h1) recurrent state, per layer; None otherwise
    conv: Any = None     # list of [B, K-1, convC] fp32
    ssm: Any = None      # list of [B, H, P, N] fp32

    def tree_flatten(self):
        return (self.k, self.v, self.length, self.conv, self.ssm), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def init_cache(cfg: ModelConfig, batch: int, max_length: int,
               dtype=jnp.bfloat16) -> KVCache:
    if cfg.mla is not None:
        # MLA caches the COMPRESSED kv per token (kv_lora + rope dims —
        # the whole point of multi-head latent attention): k holds
        # [rmsnorm'd latent, roped shared-rope head]; v is unused.
        m = cfg.mla
        shape = (batch, max_length, 1, m.kv_lora_rank + m.qk_rope_head_dim)
        return KVCache(
            k=[jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)],
            v=[jnp.zeros((batch, max_length, 1, 1), dtype)
               for _ in range(cfg.num_layers)],
            length=jnp.zeros((), jnp.int32),
        )
    shape = (batch, max_length, cfg.num_kv_heads, cfg.head_dim)
    conv = ssm = None
    if cfg.mamba is not None:
        # falcon-h1 (parallel, every layer) or bamba/granitemoehybrid
        # (serial, per-layer); allocate state uniformly — serial
        # attention layers just carry theirs through untouched
        mc = cfg.mamba
        conv_c = mc.d_ssm + 2 * mc.n_groups * mc.d_state
        conv = [jnp.zeros((batch, mc.d_conv - 1, conv_c), jnp.float32)
                for _ in range(cfg.num_layers)]
        ssm = [jnp.zeros((batch, mc.n_heads, mc.head_dim, mc.d_state),
                         jnp.float32) for _ in range(cfg.num_layers)]
    elif cfg.short_conv_l:
        # lfm2: rolling pre-conv window for the gated short-conv layers
        conv = [jnp.zeros((batch, cfg.short_conv_l - 1, cfg.hidden_size),
                          jnp.float32) for _ in range(cfg.num_layers)]
    elif cfg.lightning is not None:
        # minimax: decayed linear-attention state for the lightning layers
        ssm = [jnp.zeros((batch, cfg.num_heads, cfg.head_dim,
                          cfg.head_dim), jnp.float32)
               for _ in range(cfg.num_layers)]
    elif cfg.gdn is not None:
        # qwen3-next: pre-conv window + delta-rule state for GDN layers
        g = cfg.gdn
        conv_c = 2 * g.key_dim + g.num_v_heads * g.v_head_dim
        conv = [jnp.zeros((batch, g.conv_kernel - 1, conv_c), jnp.float32)
                for _ in range(cfg.num_layers)]
        ssm = [jnp.zeros((batch, g.num_v_heads, g.k_head_dim,
                          g.v_head_dim), jnp.float32)
               for _ in range(cfg.num_layers)]
    return KVCache(
        k=[jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)],
        v=[jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)],
        length=jnp.zeros((), jnp.int32),
        conv=conv, ssm=ssm,
    )


def _attend_cached(q, k_cache, v_cache, *, q_slots, kv_len_mask,
                   window: Optional[int], softcap, scale, sinks=None,
                   q_spans=None, kv_spans=None):
    """q: [B, Tq, Hq, Dh]; caches [B, S, Hkv, Dh]; kv_len_mask [B, S] bool
    marks valid cache slots; q_slots [B, Tq] are cache-slot indices of the
    query tokens (causality is slot-order, which equals arrival order).
    sinks [Hq]: gpt-oss per-head sink logit joining the denominator.
    q_spans [B, Tq] / kv_spans [B, S] (0 = text): tokens in the same
    nonzero image span attend bidirectionally (gemma-3 VLM semantics —
    the causal check is overridden, the window check is not, mirroring
    ops/attention.py:136-144)."""
    b, tq, hq, dh = q.shape
    s = k_cache.shape[1]
    hkv = k_cache.shape[2]
    if scale is None:
        scale = dh ** -0.5
    if hq != hkv:
        k_cache = jnp.repeat(k_cache, hq // hkv, axis=2)
        v_cache = jnp.repeat(v_cache, hq // hkv, axis=2)
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        k_cache.astype(jnp.float32)) * scale
    if softcap is not None:
        scores = softcap * jnp.tanh(scores / softcap)
    kv_pos = jnp.arange(s, dtype=jnp.int32)[None, None, :]     # [1,1,S]
    qp = q_slots[:, :, None]                                   # [B,Tq,1]
    causal_ok = kv_pos <= qp
    if q_spans is not None and kv_spans is not None:
        same_span = (q_spans[:, :, None] > 0) \
            & (kv_spans[:, None, :] == q_spans[:, :, None])
        causal_ok = causal_ok | same_span
    mask = causal_ok & kv_len_mask[:, None, :]
    if window is not None:
        mask &= (qp - kv_pos) < window
    scores = jnp.where(mask[:, None, :, :], scores, -jnp.inf)
    if sinks is not None:
        sink_col = jnp.broadcast_to(
            sinks.astype(jnp.float32)[None, :, None, None],
            (b, hq, tq, 1))
        aug = jnp.concatenate([scores, sink_col], axis=-1)
        probs = jax.nn.softmax(aug, axis=-1)[..., :-1]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
        probs = jnp.where(jnp.any(mask[:, None, :, :], -1, keepdims=True),
                          probs, 0.0)
    out = jnp.einsum("bhts,bshd->bthd", probs, v_cache.astype(jnp.float32))
    return out.astype(q.dtype)


def forward_with_cache(
    params, lora, input_ids, cfg: ModelConfig, cache: KVCache,
    *, positions: jnp.ndarray, kv_valid_extra: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    image_spans: Optional[jnp.ndarray] = None,
    mrope_positions: Optional[jnp.ndarray] = None,
    deepstack_embeds: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Run [B, T] tokens through the stack, writing k/v into cache slots
    [cache.length, cache.length+T) and attending to all valid slots.
    Works for both prefill (T = prompt length) and decode (T = 1).

    positions [B, T]: RoPE/causal position of each input token (generate
    owns this bookkeeping — left-padded prompts have shifted positions).
    kv_valid_extra [B, S]: optional mask of cache slots to exclude (False =
    invalid, e.g. slots holding left-pad tokens). Returns hidden [B, T, D].

    inputs_embeds [B, T, D]: pre-built embeddings (VLM prefill — image
    features spliced by embed_multimodal, already embed-scaled);
    image_spans [B, T] makes same-span tokens attend bidirectionally
    (gemma-3 VLM). Plain-attention path only.
    """
    b, t = input_ids.shape
    if cfg.altup is not None:
        return _gemma3n_forward_with_cache(params, lora, input_ids, cfg,
                                           cache, positions=positions,
                                           kv_valid_extra=kv_valid_extra)
    if cfg.hybrid_mamba:
        return _hybrid_forward_with_cache(params, lora, input_ids, cfg,
                                          cache, positions=positions,
                                          kv_valid_extra=kv_valid_extra)
    if cfg.mla is not None:
        return _mla_forward_with_cache(params, lora, input_ids, cfg,
                                       cache, positions=positions,
                                       kv_valid_extra=kv_valid_extra)
    if cfg.lightning is not None:
        return _minimax_forward_with_cache(params, lora, input_ids, cfg,
                                           cache, positions=positions,
                                           kv_valid_extra=kv_valid_extra)
    if cfg.gdn is not None:
        return _qwen3next_forward_with_cache(params, lora, input_ids,
                                             cfg, cache,
                                             positions=positions,
                                             kv_valid_extra=kv_valid_extra)
    if cfg.zamba is not None:
        from ..models.zamba2 import zamba2_forward_with_cache

        return zamba2_forward_with_cache(params, lora, input_ids, cfg,
                                         cache, positions=positions,
                                         kv_valid_extra=kv_valid_extra)
    if "layers_stacked" in params:
        # decode walks layers individually; slice the stacked leaves
        # (views under jit — no copies)
        from ..models.decoder import unstack_lora

        n = len(cache.k)
        stacked = params["layers_stacked"]
        params = dict(params, layers=[
            jax.tree_util.tree_map(lambda x_, i=i: x_[i], stacked)
            for i in range(n)])
        if lora is not None and "layers_stacked" in lora:
            lora = unstack_lora(lora, n)
    lora_layers = (lora or {}).get("layers")

    if inputs_embeds is not None:
        x = inputs_embeds                 # pre-scaled (embed_multimodal)
    else:
        embed_w = (lora or {}).get("embed")  # modules_to_save shadow
        if embed_w is None:
            embed_w = params["embed"]
        x = jnp.take(embed_w, input_ids, axis=0)
        if cfg.embed_scale is not None:
            x = x * jnp.asarray(cfg.embed_scale, dtype=x.dtype)

    cos, sin, cos_l, sin_l = _rope_tables(cfg, positions,
                                          mrope_positions)

    s_max = cache.k[0].shape[1]
    kv_slots = jnp.arange(s_max, dtype=jnp.int32)[None]          # [1,S]
    written = kv_slots < (cache.length + t)                      # [1,S]
    kv_valid = jnp.broadcast_to(written, (b, s_max))
    if kv_valid_extra is not None:
        kv_valid = kv_valid & kv_valid_extra
    kv_spans = None
    if image_spans is not None:
        # scatter this block's spans to its cache slots (image tokens
        # are all within the prefill block, so cached-slot spans = 0
        # elsewhere)
        kv_spans = jax.lax.dynamic_update_slice(
            jnp.zeros((b, s_max), jnp.int32), image_spans.astype(jnp.int32),
            (0, cache.length))

    rm = cfg.residual_multiplier
    new_k, new_v = [], []
    new_conv = [] if cache.conv is not None else None
    new_ssm = [] if cache.ssm is not None else None
    conv_pad_mask = None
    if cache.conv is not None and kv_valid_extra is not None and t > 1:
        conv_pad_mask = jax.lax.dynamic_slice(
            kv_valid_extra.astype(jnp.float32), (0, cache.length), (b, t))
    for i, layer_p in enumerate(params["layers"]):
        lora_p = lora_layers[i] if lora_layers else None
        h = _norm(x, layer_p["input_norm"], cfg)
        if cfg.layer_kind(i) == "mamba":
            # bamba / granitemoehybrid serial hybrid: the SSD mixer
            # replaces attention; conv window + state matrix ride the
            # cache (prefill: chunked scan; decode: O(1) recurrent step)
            from ..models.decoder import mamba_call_kwargs, mlp_block
            from ..ops.ssm import mamba2_mixer, mamba2_mixer_step

            mp, mkw = mamba_call_kwargs(layer_p, cfg)
            if t == 1:
                y, (cs, ss) = mamba2_mixer_step(
                    h, mp, (cache.conv[i], cache.ssm[i]), **mkw)
            else:
                y, (cs, ss) = mamba2_mixer(
                    h, mp, chunk_size=cfg.mamba.chunk_size,
                    padding_mask=conv_pad_mask, return_state=True, **mkw)
            new_conv.append(cs)
            new_ssm.append(ss)
            new_k.append(cache.k[i])
            new_v.append(cache.v[i])
            x = x + (y * rm if rm is not None else y)
            h2 = _norm(x, layer_p["post_attn_norm"], cfg)
            mlp = mlp_block(h2, layer_p, lora_p, cfg, i)
            x = x + (mlp * rm if rm is not None else mlp)
            continue
        if cfg.layer_kind(i) == "conv":
            # lfm2 gated short-conv layer: recurrent pre-conv window
            y, cs = _short_conv_with_state(h, layer_p, cfg, cache.conv[i],
                                           pad_mask=conv_pad_mask)
            new_conv.append(cs)
            new_k.append(cache.k[i])
            new_v.append(cache.v[i])
            x = x + y
            h2 = _norm(x, layer_p["post_attn_norm"], cfg)
            glu = glu_for(cfg.hidden_act)
            e = _proj(h2, layer_p, lora_p, "gate")
            g = _proj(h2, layer_p, lora_p, "up")
            x = x + _proj(glu(e, g), layer_p, lora_p, "down")
            continue
        if new_conv is not None:
            new_conv.append(cache.conv[i])
        if new_ssm is not None:
            new_ssm.append(cache.ssm[i])
        hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        q = _proj(h, layer_p, lora_p, "q").reshape(b, t, hq, dh)
        k = _proj(h, layer_p, lora_p, "k").reshape(b, t, hkv, dh)
        v = _proj(h, layer_p, lora_p, "v").reshape(b, t, hkv, dh)
        if cfg.qk_norm is True:
            q = rms_norm(q, layer_p["q_norm"], cfg.rms_norm_eps, cfg.gemma_norm)
            k = rms_norm(k, layer_p["k_norm"], cfg.rms_norm_eps, cfg.gemma_norm)
        kind = cfg.layer_kind(i)
        if cfg.layer_uses_rope(i):
            if cfg.rope_interleaved:
                # llama4: permuted-channel half rope (see decoder.py)
                q = jnp.concatenate([q[..., 0::2], q[..., 1::2]], axis=-1)
                k = jnp.concatenate([k[..., 0::2], k[..., 1::2]], axis=-1)
            if kind == "sliding" and cos_l is not None:
                q, k = apply_rope_qk(q, k, cos_l, sin_l)
            else:
                q, k = apply_rope_qk(q, k, cos, sin)
            if cfg.qk_norm == "l2":
                from ..models.decoder import _l2_norm

                q = _l2_norm(q, cfg.rms_norm_eps)
                k = _l2_norm(k, cfg.rms_norm_eps)
            elif cfg.qk_norm == "post_rope":  # hunyuan
                q = rms_norm(q, layer_p["q_norm"], cfg.rms_norm_eps,
                             False)
                k = rms_norm(k, layer_p["k_norm"], cfg.rms_norm_eps,
                             False)
        elif cfg.attn_temperature_tuning:
            scales = jnp.log1p(jnp.floor(
                (positions.astype(jnp.float32) + 1.0) / cfg.floor_scale)) \
                * cfg.attn_scale + 1.0
            q = (q.astype(jnp.float32)
                 * scales[..., None, None]).astype(q.dtype)

        k_cache = jax.lax.dynamic_update_slice(
            cache.k[i], k.astype(cache.k[i].dtype), (0, cache.length, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            cache.v[i], v.astype(cache.v[i].dtype), (0, cache.length, 0, 0))
        new_k.append(k_cache)
        new_v.append(v_cache)

        window = cfg.sliding_window if kind == "sliding" else None
        q_slots = cache.length + jnp.arange(t, dtype=jnp.int32)[None]
        q_slots = jnp.broadcast_to(q_slots, (b, t))
        attn = _attend_cached(
            q, k_cache, v_cache, q_slots=q_slots,
            kv_len_mask=kv_valid, window=window,
            q_spans=image_spans, kv_spans=kv_spans,
            softcap=cfg.attn_softcap, scale=cfg.attn_logit_scale,
            sinks=layer_p.get("sinks"))
        attn = attn.reshape(b, t, hq * dh)
        attn = _proj(attn, layer_p, lora_p, "o")
        if cfg.use_post_norms and "post_attn_out_norm" in layer_p:
            attn = _norm(attn, layer_p["post_attn_out_norm"], cfg)
        x = x + (attn * rm if rm is not None else attn)

        if cfg.use_post_norms and "pre_ffw_norm" in layer_p:
            h2 = _norm(x, layer_p["pre_ffw_norm"], cfg)
        else:
            h2 = _norm(x, layer_p["post_attn_norm"], cfg)
        from ..models.decoder import mlp_block

        mlp = mlp_block(h2, layer_p, lora_p, cfg, i)
        if cfg.use_post_norms and "post_ffw_norm" in layer_p:
            mlp = _norm(mlp, layer_p["post_ffw_norm"], cfg)
        x = x + (mlp * rm if rm is not None else mlp)
        if deepstack_embeds is not None \
                and i < deepstack_embeds.shape[0]:
            # qwen3-vl DeepStack (prefill only): early-ViT merged
            # features added after the first text layers, zero at text
            # positions (mirrors models/decoder.py run_stack)
            x = x + deepstack_embeds[i].astype(x.dtype)

    x = _norm(x, params["final_norm"], cfg)
    new_cache = KVCache(k=new_k, v=new_v, length=cache.length + t,
                        conv=new_conv, ssm=new_ssm)
    return x, new_cache


def _short_conv_with_state(h, layer_p, cfg: ModelConfig, conv_state,
                           *, pad_mask=None):
    """LFM2 short-conv with a rolling [B, L-1, D] window of the pre-conv
    gated input (B*x). Prefill (T>1) runs the full causal conv and
    returns the trailing window; decode (T=1) is the O(1) update."""
    from ..ops.ssm import causal_conv1d

    b, t, d = h.shape
    if pad_mask is not None:
        h = h * pad_mask[..., None].astype(h.dtype)
    bcx = h @ layer_p["conv_in"].T.astype(h.dtype)
    if "conv_in_bias" in layer_p:
        bcx = bcx + layer_p["conv_in_bias"].astype(bcx.dtype)
    bm, cm, xm = bcx[..., :d], bcx[..., d:2 * d], bcx[..., 2 * d:]
    bx = (bm * xm).astype(jnp.float32)
    w = layer_p["conv_w"]
    if w.ndim == 3:
        w = w[:, 0, :]
    w = w.astype(jnp.float32)
    l = w.shape[-1]
    if t == 1:
        window = jnp.concatenate([conv_state, bx], axis=1)   # [B, L, D]
        conv = jnp.einsum("bld,dl->bd", window, w)[:, None, :]
        if layer_p.get("conv_b") is not None:
            conv = conv + layer_p["conv_b"].astype(jnp.float32)
        new_state = window[:, 1:, :]
    else:
        conv = causal_conv1d(bx, w, layer_p.get("conv_b"))
        if t >= l - 1:
            new_state = bx[:, t - (l - 1):, :]
        else:
            new_state = jnp.pad(bx, ((0, 0), (l - 1 - t, 0), (0, 0)))
    y = (cm.astype(jnp.float32) * conv).astype(h.dtype)
    out = y @ layer_p["conv_out"].T.astype(h.dtype)
    if "conv_out_bias" in layer_p:
        out = out + layer_p["conv_out_bias"].astype(out.dtype)
    return out, new_state


def _hybrid_forward_with_cache(params, lora, input_ids, cfg: ModelConfig,
                               cache: KVCache, *, positions,
                               kv_valid_extra=None):
    """falcon-h1 decode: every layer runs attention (KV cache) AND a
    mamba2 SSD mixer (recurrent conv+ssm state) in parallel on the same
    normed input, with the full muP multiplier set (reference:
    models/falcon_h1.py:1-756; HF FalconH1Mixer cached path). Prefill
    (T>1) runs the chunked scan and captures the final state; decode
    (T=1) runs the O(1) recurrent step."""
    from ..models.decoder import mamba_call_kwargs
    from ..ops.ssm import mamba2_mixer, mamba2_mixer_step

    mc = cfg.mamba
    b, t = input_ids.shape
    lora_layers = (lora or {}).get("layers")
    embed_w = (lora or {}).get("embed")
    if embed_w is None:
        embed_w = params["embed"]
    x = jnp.take(embed_w, input_ids, axis=0)
    if cfg.embed_scale is not None:
        x = x * jnp.asarray(cfg.embed_scale, dtype=x.dtype)

    cos, sin, _, _ = _rope_tables(cfg, positions)

    s_max = cache.k[0].shape[1]
    kv_slots = jnp.arange(s_max, dtype=jnp.int32)[None]
    kv_valid = jnp.broadcast_to(kv_slots < (cache.length + t), (b, s_max))
    if kv_valid_extra is not None:
        kv_valid = kv_valid & kv_valid_extra
    q_slots = cache.length + jnp.arange(t, dtype=jnp.int32)[None]
    q_slots = jnp.broadcast_to(q_slots, (b, t))
    # mamba padding mask for the current window (left-padded prompts):
    # padded inputs must not enter the conv window or the SSM state
    if kv_valid_extra is not None and t > 1:
        pad_mask = jax.lax.dynamic_slice(
            kv_valid_extra.astype(jnp.float32), (0, cache.length), (b, t))
    else:
        pad_mask = None

    new_k, new_v, new_conv, new_ssm = [], [], [], []
    for i, layer_p in enumerate(params["layers"]):
        lora_p = lora_layers[i] if lora_layers else None
        h = _norm(x, layer_p["input_norm"], cfg)

        # --- SSD mixer with recurrent state ---
        mp, mkw = mamba_call_kwargs(layer_p, cfg)
        if t == 1:
            m_out, (cs, ss) = mamba2_mixer_step(
                h, mp, (cache.conv[i], cache.ssm[i]), **mkw)
        else:
            m_out, (cs, ss) = mamba2_mixer(
                h, mp, chunk_size=mc.chunk_size, padding_mask=pad_mask,
                return_state=True, **mkw)
        new_conv.append(cs)
        new_ssm.append(ss)
        m_out = m_out * mc.ssm_out_multiplier

        # --- attention on the same normed input ---
        ha = h * mc.attention_in_multiplier
        hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        q = _proj(ha, layer_p, lora_p, "q").reshape(b, t, hq, dh)
        k = _proj(ha, layer_p, lora_p, "k").reshape(b, t, hkv, dh)
        v = _proj(ha, layer_p, lora_p, "v").reshape(b, t, hkv, dh)
        if mc.key_multiplier != 1.0:
            k = k * mc.key_multiplier
        q, k = apply_rope_qk(q, k, cos, sin)

        k_cache = jax.lax.dynamic_update_slice(
            cache.k[i], k.astype(cache.k[i].dtype), (0, cache.length, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            cache.v[i], v.astype(cache.v[i].dtype), (0, cache.length, 0, 0))
        new_k.append(k_cache)
        new_v.append(v_cache)

        attn = _attend_cached(
            q, k_cache, v_cache, q_slots=q_slots, kv_len_mask=kv_valid,
            window=None, softcap=cfg.attn_softcap,
            scale=cfg.attn_logit_scale)
        attn = attn.reshape(b, t, hq * dh)
        attn = _proj(attn, layer_p, lora_p, "o")
        attn = attn * mc.attention_out_multiplier

        x = x + m_out + attn

        h2 = _norm(x, layer_p["post_attn_norm"], cfg)
        glu = glu_for(cfg.hidden_act)
        gm, dm = mc.mlp_multipliers
        e = _proj(h2, layer_p, lora_p, "gate")
        g = _proj(h2, layer_p, lora_p, "up")
        x = x + _proj(glu(e * gm, g), layer_p, lora_p, "down") * dm

    x = _norm(x, params["final_norm"], cfg)
    return x, KVCache(k=new_k, v=new_v, length=cache.length + t,
                      conv=new_conv, ssm=new_ssm)


def _qwen3next_forward_with_cache(params, lora, input_ids,
                                  cfg: ModelConfig, cache: KVCache, *,
                                  positions, kv_valid_extra=None):
    """Qwen3-Next decode: GDN (gated DeltaNet) layers carry a pre-conv
    window + [B, Hv, Dk, Dv] delta state in the cache (prefill: chunked
    rule; decode: O(1) recurrence); full layers use output-GATED
    attention over the KV cache (HF Qwen3NextAttention/GatedDeltaNet
    cached paths)."""
    from ..models.decoder import _gdn_block, mlp_block

    b, t = input_ids.shape
    lora_layers = (lora or {}).get("layers")
    embed_w = (lora or {}).get("embed")
    if embed_w is None:
        embed_w = params["embed"]
    x = jnp.take(embed_w, input_ids, axis=0)

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

    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    new_k, new_v, new_conv, new_ssm = [], [], [], []
    for i, layer_p in enumerate(params["layers"]):
        lora_p = lora_layers[i] if lora_layers else None
        h = _norm(x, layer_p["input_norm"], cfg)
        if cfg.layer_kind(i) == "linear":
            y, (cs, ss) = _gdn_block(
                h, layer_p, cfg, state=(cache.conv[i], cache.ssm[i]),
                pad_mask=pad_mask, return_state=True)
            new_conv.append(cs)
            new_ssm.append(ss)
            new_k.append(cache.k[i])
            new_v.append(cache.v[i])
            x = x + y
        else:
            qg = _proj(h, layer_p, lora_p, "q").reshape(b, t, hq, 2 * dh)
            q, out_gate = qg[..., :dh], qg[..., dh:].reshape(b, t,
                                                            hq * dh)
            k = _proj(h, layer_p, lora_p, "k").reshape(b, t, hkv, dh)
            v = _proj(h, layer_p, lora_p, "v").reshape(b, t, hkv, dh)
            q = rms_norm(q, layer_p["q_norm"], cfg.rms_norm_eps,
                         cfg.gemma_norm)
            k = rms_norm(k, layer_p["k_norm"], cfg.rms_norm_eps,
                         cfg.gemma_norm)
            q, k = apply_rope_qk(q, k, cos, sin)
            k_cache = jax.lax.dynamic_update_slice(
                cache.k[i], k.astype(cache.k[i].dtype),
                (0, cache.length, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                cache.v[i], v.astype(cache.v[i].dtype),
                (0, cache.length, 0, 0))
            new_k.append(k_cache)
            new_v.append(v_cache)
            new_conv.append(cache.conv[i])
            new_ssm.append(cache.ssm[i])
            attn = _attend_cached(
                q, k_cache, v_cache, q_slots=q_slots,
                kv_len_mask=kv_valid, window=None,
                softcap=cfg.attn_softcap, scale=cfg.attn_logit_scale)
            attn = attn.reshape(b, t, hq * dh)
            attn = (attn.astype(jnp.float32)
                    * jax.nn.sigmoid(out_gate.astype(jnp.float32))
                    ).astype(attn.dtype)
            x = x + _proj(attn, layer_p, lora_p, "o")

        h2 = _norm(x, layer_p["post_attn_norm"], cfg)
        x = x + mlp_block(h2, layer_p, lora_p, cfg, i)

    x = _norm(x, params["final_norm"], cfg)
    return x, KVCache(k=new_k, v=new_v, length=cache.length + t,
                      conv=new_conv, ssm=new_ssm)


def _minimax_forward_with_cache(params, lora, input_ids, cfg: ModelConfig,
                                cache: KVCache, *, positions,
                                kv_valid_extra=None):
    """MiniMax decode: lightning (decayed linear attention) layers carry a
    [B, H, Dh, Dh] recurrent state in cache.ssm; full-attention layers use
    the plain KV cache; residuals are the weighted NORMED stream (HF
    MiniMaxDecoderLayer; reference catalogs MiniMax via FastModel).
    Prefill and decode both route through `lightning_attention`, whose
    returned state is exact for any T."""
    from ..models.decoder import moe_block
    from ..ops.lightning_attention import (lightning_attention,
                                           lightning_slopes)

    lc = cfg.lightning
    b, t = input_ids.shape
    lora_layers = (lora or {}).get("layers")
    embed_w = (lora or {}).get("embed")
    if embed_w is None:
        embed_w = params["embed"]
    x = jnp.take(embed_w, input_ids, axis=0)
    if cfg.embed_scale is not None:
        x = x * jnp.asarray(cfg.embed_scale, dtype=x.dtype)

    cos, sin, _, _ = _rope_tables(cfg, positions)

    s_max = cache.k[0].shape[1]
    kv_slots = jnp.arange(s_max, dtype=jnp.int32)[None]
    kv_valid = jnp.broadcast_to(kv_slots < (cache.length + t), (b, s_max))
    if kv_valid_extra is not None:
        kv_valid = kv_valid & kv_valid_extra
    q_slots = cache.length + jnp.arange(t, dtype=jnp.int32)[None]
    q_slots = jnp.broadcast_to(q_slots, (b, t))
    # left-padded prompts: pad tokens must not enter the lightning state
    # (HF zeroes v under the attention mask; decay still advances, but the
    # pre-pad state is zero so outputs are exact)
    if kv_valid_extra is not None and t > 1:
        pad_mask = jax.lax.dynamic_slice(
            kv_valid_extra.astype(jnp.float32), (0, cache.length), (b, t))
    else:
        pad_mask = None

    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    new_k, new_v, new_ssm = [], [], []
    for i, layer_p in enumerate(params["layers"]):
        lora_p = lora_layers[i] if lora_layers else None
        h = _norm(x, layer_p["input_norm"], cfg)
        if cfg.layer_kind(i) == "linear":
            qkv = jax.nn.silu(
                (h @ layer_p["lightn_qkv"].T.astype(h.dtype))
                .astype(jnp.float32)).reshape(b, t, hq, 3 * dh)
            q = qkv[..., :dh]
            k = qkv[..., dh:2 * dh]
            v = qkv[..., 2 * dh:]
            if pad_mask is not None:
                v = v * pad_mask[..., None, None]
            y, state = lightning_attention(
                q, k, v, lightning_slopes(hq, i, cfg.num_layers),
                block_size=lc.block_size, initial_state=cache.ssm[i],
                return_state=True)
            new_ssm.append(state)
            new_k.append(cache.k[i])
            new_v.append(cache.v[i])
            y = y.reshape(b, t, hq * dh)
            # HF MiniMaxLightningAttention.norm uses the DEFAULT rms eps
            # (1e-6), not config.rms_norm_eps (see decoder._lightning_block)
            y = rms_norm(y, layer_p["lightn_norm"], 1e-6, False)
            gate = jax.nn.sigmoid(
                (h @ layer_p["lightn_gate"].T.astype(h.dtype))
                .astype(jnp.float32))
            y = (y.astype(jnp.float32) * gate).astype(h.dtype)
            attn = y @ layer_p["lightn_out"].T.astype(h.dtype)
            aa, bb = lc.linear_alpha, lc.linear_beta
        else:
            q = _proj(h, layer_p, lora_p, "q").reshape(b, t, hq, dh)
            k = _proj(h, layer_p, lora_p, "k").reshape(b, t, hkv, dh)
            v = _proj(h, layer_p, lora_p, "v").reshape(b, t, hkv, dh)
            q, k = apply_rope_qk(q, k, cos, sin)
            k_cache = jax.lax.dynamic_update_slice(
                cache.k[i], k.astype(cache.k[i].dtype),
                (0, cache.length, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                cache.v[i], v.astype(cache.v[i].dtype),
                (0, cache.length, 0, 0))
            new_k.append(k_cache)
            new_v.append(v_cache)
            new_ssm.append(cache.ssm[i])
            attn = _attend_cached(
                q, k_cache, v_cache, q_slots=q_slots, kv_len_mask=kv_valid,
                window=None, softcap=cfg.attn_softcap,
                scale=cfg.attn_logit_scale)
            attn = attn.reshape(b, t, hq * dh)
            attn = _proj(attn, layer_p, lora_p, "o")
            aa, bb = lc.full_alpha, lc.full_beta
        x = h * aa + attn * bb

        h2 = _norm(x, layer_p["post_attn_norm"], cfg)
        if cfg.layer_is_moe(i) and "experts" in layer_p:
            mlp = moe_block(h2, layer_p, cfg)
        else:
            glu = glu_for(cfg.hidden_act)
            e = _proj(h2, layer_p, lora_p, "gate")
            g = _proj(h2, layer_p, lora_p, "up")
            mlp = _proj(glu(e, g), layer_p, lora_p, "down")
        x = h2 * lc.mlp_alpha + mlp * lc.mlp_beta

    x = _norm(x, params["final_norm"], cfg)
    return x, KVCache(k=new_k, v=new_v, length=cache.length + t,
                      ssm=new_ssm)


def _gemma3n_forward_with_cache(params, lora, input_ids, cfg: ModelConfig,
                                cache: KVCache, *, positions,
                                kv_valid_extra=None):
    """gemma-3n decode: AltUp streams are per-token (no recurrent state
    besides attention), so the cache is a plain KV cache; each layer's
    attention reads/writes its own slots. Mirrors our no-cache training
    forward (HF's no-cache semantics — KV sharing only activates with
    HF's cache, see models/gemma3n.py docstring)."""
    from ..models.gemma3n import (_altup_correct, _altup_predict,
                                  _gaussian_topk, _gelu_tanh,
                                  _magnitude_match, _rms, _rms_noscale,
                                  _target_mag)

    a = cfg.altup
    eps = cfg.rms_norm_eps
    b, t = input_ids.shape
    lora_layers = (lora or {}).get("layers")
    embed_w = (lora or {}).get("embed")
    if embed_w is None:
        embed_w = params["embed"]
    x0 = jnp.take(embed_w, input_ids, axis=0)
    if cfg.embed_scale is not None:
        x0 = x0 * jnp.asarray(cfg.embed_scale, dtype=x0.dtype)

    p = a.hidden_per_layer
    n_layers = cfg.num_layers
    pl_ids = jnp.where(input_ids < a.vocab_per_layer, input_ids, 0)
    pl_emb = jnp.take(params["embed_per_layer"], pl_ids, axis=0)
    pl_emb = pl_emb * jnp.asarray(float(p) ** 0.5, pl_emb.dtype)
    pl_emb = pl_emb.reshape(b, t, n_layers, p)
    pl_proj = jnp.dot(x0, params["per_layer_model_proj"].T.astype(x0.dtype))
    pl_proj = pl_proj * jnp.asarray(cfg.hidden_size ** -0.5, x0.dtype)
    pl_proj = pl_proj.reshape(b, t, n_layers, p)
    pl_proj = _rms(pl_proj, params["per_layer_proj_norm"], eps)
    per_layer_inputs = (pl_proj + pl_emb) * jnp.asarray(2.0 ** -0.5,
                                                        x0.dtype)

    cos, sin, cos_l, sin_l = _rope_tables(cfg, positions)

    tm = _target_mag(x0)
    streams = [x0]
    for i in range(1, a.num_inputs):
        y = jnp.dot(x0, params[f"altup_proj_{i}"].T.astype(x0.dtype))
        streams.append(_magnitude_match(y, tm))
    h = jnp.stack(streams, axis=0)

    s_max = cache.k[0].shape[1]
    kv_slots = jnp.arange(s_max, dtype=jnp.int32)[None]
    kv_valid = jnp.broadcast_to(kv_slots < (cache.length + t), (b, s_max))
    if kv_valid_extra is not None:
        kv_valid = kv_valid & kv_valid_extra
    q_slots = cache.length + jnp.arange(t, dtype=jnp.int32)[None]
    q_slots = jnp.broadcast_to(q_slots, (b, t))

    new_k, new_v = [], []
    for i, layer_p in enumerate(params["layers"]):
        lora_p = lora_layers[i] if lora_layers else None
        predictions = _altup_predict(h, layer_p, cfg)
        active = predictions[a.active_idx]
        a_norm = _rms(active, layer_p["input_norm"], eps)

        lr = jnp.dot(a_norm, layer_p["laurel_left"].T.astype(a_norm.dtype))
        lr = jnp.dot(lr, layer_p["laurel_right"].T.astype(a_norm.dtype))
        laurel = a_norm + _rms(lr, layer_p["laurel_norm"], eps)

        hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        q = _proj(a_norm, layer_p, lora_p, "q").reshape(b, t, hq, dh)
        k = _proj(a_norm, layer_p, lora_p, "k").reshape(b, t, hkv, dh)
        v = _proj(a_norm, layer_p, lora_p, "v").reshape(b, t, hkv, dh)
        from ..ops.rms_norm import rms_norm as _rmsn

        q = _rmsn(q, layer_p["q_norm"], eps, False)
        k = _rmsn(k, layer_p["k_norm"], eps, False)
        v = _rms_noscale(v, eps)
        kind = cfg.layer_kind(i)
        if kind == "sliding" and cos_l is not None:
            q, k = apply_rope_qk(q, k, cos_l, sin_l)
        else:
            q, k = apply_rope_qk(q, k, cos, sin)

        k_cache = jax.lax.dynamic_update_slice(
            cache.k[i], k.astype(cache.k[i].dtype), (0, cache.length, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            cache.v[i], v.astype(cache.v[i].dtype), (0, cache.length, 0, 0))
        new_k.append(k_cache)
        new_v.append(v_cache)

        window = cfg.sliding_window if kind == "sliding" else None
        attn = _attend_cached(
            q, k_cache, v_cache, q_slots=q_slots, kv_len_mask=kv_valid,
            window=window, softcap=None, scale=cfg.attn_logit_scale)
        attn = _proj(attn.reshape(b, t, hq * dh), layer_p, lora_p, "o")
        attn = _rms(attn, layer_p["post_attn_out_norm"], eps)

        attn_gated = active + attn
        attn_laurel = (attn_gated + laurel) * (2.0 ** -0.5)

        h2 = _rms(attn_laurel, layer_p["pre_ffw_norm"], eps)
        gate = _proj(h2, layer_p, lora_p, "gate")
        sparsity = a.activation_sparsity[i] \
            if i < len(a.activation_sparsity) else 0.0
        if sparsity > 0.0:
            gate = _gaussian_topk(gate, sparsity)
        up = _proj(h2, layer_p, lora_p, "up")
        mlp = _proj(_gelu_tanh(gate) * up, layer_p, lora_p, "down")
        mlp = _rms(mlp, layer_p["post_ffw_norm"], eps)
        activated = attn_laurel + mlp

        corrected = _altup_correct(predictions, activated, layer_p, cfg)
        first = corrected[a.active_idx]
        if a.correct_scale:
            first = (first.astype(jnp.float32)
                     * layer_p["altup_correct_scale"].astype(jnp.float32)
                     ).astype(first.dtype)
        g = _gelu_tanh(jnp.dot(first,
                               layer_p["pli_gate"].T.astype(first.dtype)))
        g = g * per_layer_inputs[:, :, i, :]
        proj = jnp.dot(g, layer_p["pli_proj"].T.astype(g.dtype))
        proj = _rms(proj, layer_p["pli_norm"], eps)
        h = jnp.concatenate([corrected[:1], corrected[1:] + proj[None]],
                            axis=0)

    tm = _target_mag(h[0])
    outs = [h[0]]
    for i in range(1, a.num_inputs):
        y = jnp.dot(h[i], params[f"altup_unembed_{i}"].T.astype(h.dtype))
        outs.append(_magnitude_match(y, tm))
    x = jnp.mean(jnp.stack(outs, axis=0), axis=0)
    x = _rms(x, params["final_norm"], eps)
    return x, KVCache(k=new_k, v=new_v, length=cache.length + t)


def _materialize_weight(w, lora=None, dtype=jnp.float32):
    """Effective dense weight [out, in]: dequant-if-needed + LoRA delta."""
    from ..ops.nf4 import NF4Tensor, dequantize_nf4

    if isinstance(w, NF4Tensor):
        wd = dequantize_nf4(w, dtype=dtype)
    elif hasattr(w, "scales"):
        from ..ops.fp8 import dequantize_fp8

        wd = dequantize_fp8(w, dtype=dtype)
    else:
        wd = w.astype(dtype)
    if lora is not None:
        wd = wd + lora.scale * jnp.dot(
            lora.b.astype(dtype), lora.a.astype(dtype))
    return wd


def _mla_forward_with_cache(params, lora, input_ids, cfg: ModelConfig,
                            cache: KVCache, *, positions,
                            kv_valid_extra=None, absorb: bool = True):
    """DeepSeek-V3 decode: the cache holds each token's COMPRESSED kv
    (rmsnorm'd latent + already-roped shared rope head).

    absorb=True (default) is the matrix-absorbed MLA decode (DeepSeek-V2
    paper §2.1.2): kv_b's up-projections W_UK/W_UV are folded into the
    query and the attention output, so scores and context are computed
    directly against the [S, kv_lora_rank] latent cache — nothing of size
    [S, H, qk_dim] is ever materialized. absorb=False re-expands the
    cached latents through kv_b each step (the naive decode; kept as the
    parity oracle — the two are algebraically identical)."""
    from ..models.decoder import _l2_norm  # noqa: F401 (parity of deps)

    m = cfg.mla
    b, t = input_ids.shape
    lora_layers = (lora or {}).get("layers")
    embed_w = (lora or {}).get("embed")
    if embed_w is None:
        embed_w = params["embed"]
    x = jnp.take(embed_w, input_ids, axis=0)
    if cfg.embed_scale is not None:
        x = x * jnp.asarray(cfg.embed_scale, dtype=x.dtype)

    cos, sin, _, _ = _rope_tables(cfg, positions)
    h_heads = cfg.num_heads
    nope, rope = m.qk_nope_head_dim, m.qk_rope_head_dim
    qk_dim = m.qk_head_dim

    s_max = cache.k[0].shape[1]
    kv_slots = jnp.arange(s_max, dtype=jnp.int32)[None]
    kv_valid = jnp.broadcast_to(kv_slots < (cache.length + t), (b, s_max))
    if kv_valid_extra is not None:
        kv_valid = kv_valid & kv_valid_extra
    q_slots = cache.length + jnp.arange(t, dtype=jnp.int32)[None]
    q_slots = jnp.broadcast_to(q_slots, (b, t))

    new_k = []
    for i, layer_p in enumerate(params["layers"]):
        lora_p = lora_layers[i] if lora_layers else None
        h = _norm(x, layer_p["input_norm"], cfg)

        if "q_a" in layer_p:
            qa = _proj(h, layer_p, lora_p, "q_a")
            qa = rms_norm(qa, layer_p["q_a_norm"], cfg.rms_norm_eps,
                          False)
            q = _proj(qa, layer_p, lora_p, "q_b")
        else:
            q = _proj(h, layer_p, lora_p, "q")
        q = q.reshape(b, t, h_heads, qk_dim)
        q_pass, q_rot = q[..., :nope], q[..., nope:]

        ckv = _proj(h, layer_p, lora_p, "kv_a")
        k_c = rms_norm(ckv[..., :m.kv_lora_rank], layer_p["kv_a_norm"],
                       cfg.rms_norm_eps, False)
        k_rot = ckv[..., m.kv_lora_rank:].reshape(b, t, 1, rope)
        if cfg.rope_interleaved:
            q_rot = jnp.concatenate([q_rot[..., 0::2], q_rot[..., 1::2]],
                                    -1)
            k_rot = jnp.concatenate([k_rot[..., 0::2], k_rot[..., 1::2]],
                                    -1)
        q_rot, k_rot = apply_rope_qk(q_rot, k_rot, cos, sin)
        q = jnp.concatenate([q_pass, q_rot], axis=-1)

        entry = jnp.concatenate([k_c, k_rot[:, :, 0, :]], axis=-1)
        k_cache = jax.lax.dynamic_update_slice(
            cache.k[i], entry[:, :, None, :].astype(cache.k[i].dtype),
            (0, cache.length, 0, 0))
        new_k.append(k_cache)

        cached = k_cache[:, :, 0, :]                    # [B, S, lora+rope]
        lat = cached[..., :m.kv_lora_rank]
        rot_all = cached[..., m.kv_lora_rank:]          # already roped
        if absorb:
            # Matrix-absorbed decode: fold W_UK into q, W_UV into the
            # output — attend directly over the latent cache.
            wb = _materialize_weight(
                layer_p["kv_b"], lora_p.get("kv_b") if lora_p else None,
                dtype=jnp.float32).reshape(
                    h_heads, nope + m.v_head_dim, m.kv_lora_rank)
            w_uk, w_uv = wb[:, :nope, :], wb[:, nope:, :]
            q_pass, q_rot2 = q[..., :nope], q[..., nope:]
            q_lat = jnp.einsum("bthn,hnr->bthr",
                               q_pass.astype(jnp.float32), w_uk)
            scale = cfg.attn_logit_scale
            if scale is None:
                scale = qk_dim ** -0.5
            scores = (jnp.einsum("bthr,bsr->bhts", q_lat,
                                 lat.astype(jnp.float32))
                      + jnp.einsum("bthr,bsr->bhts",
                                   q_rot2.astype(jnp.float32),
                                   rot_all.astype(jnp.float32))) * scale
            kv_pos = jnp.arange(s_max, dtype=jnp.int32)[None, None, :]
            mask = (kv_pos <= q_slots[:, :, None]) & kv_valid[:, None, :]
            scores = jnp.where(mask[:, None, :, :], scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx_lat = jnp.einsum("bhts,bsr->bthr", probs,
                                 lat.astype(jnp.float32))
            attn = jnp.einsum("bthr,hvr->bthv", ctx_lat,
                              w_uv).astype(x.dtype)
        else:
            kv = _proj(lat, layer_p, lora_p, "kv_b").reshape(
                b, s_max, h_heads, nope + m.v_head_dim)
            k_pass_all, v_all = kv[..., :nope], kv[..., nope:]
            k_all = jnp.concatenate(
                [k_pass_all,
                 jnp.broadcast_to(rot_all[:, :, None, :],
                                  (b, s_max, h_heads, rope))], axis=-1)
            pad = qk_dim - m.v_head_dim
            v_p = jnp.pad(
                v_all, ((0, 0), (0, 0), (0, 0), (0, pad))) \
                if pad else v_all
            attn = _attend_cached(
                q, k_all, v_p, q_slots=q_slots, kv_len_mask=kv_valid,
                window=None, softcap=None, scale=cfg.attn_logit_scale)
            if pad:
                attn = attn[..., :m.v_head_dim]
        attn = _proj(attn.reshape(b, t, h_heads * m.v_head_dim), layer_p,
                     lora_p, "o")
        x = x + attn

        h2 = _norm(x, layer_p["post_attn_norm"], cfg)
        if cfg.layer_is_moe(i) and "experts" in layer_p:
            from ..models.decoder import moe_block

            mlp = moe_block(h2, layer_p, cfg)
            if cfg.moe_shared_expert and "gate" in layer_p:
                glu = glu_for(cfg.hidden_act)
                e = _proj(h2, layer_p, lora_p, "gate")
                g = _proj(h2, layer_p, lora_p, "up")
                mlp = mlp + _proj(glu(e, g), layer_p, lora_p, "down")
        else:
            glu = glu_for(cfg.hidden_act)
            e = _proj(h2, layer_p, lora_p, "gate")
            g = _proj(h2, layer_p, lora_p, "up")
            mlp = _proj(glu(e, g), layer_p, lora_p, "down")
        x = x + mlp

    x = _norm(x, params["final_norm"], cfg)
    return x, KVCache(k=new_k, v=cache.v, length=cache.length + t)


def logits_from_hidden(params, h, cfg: ModelConfig, lora=None):
    w = (lora or {}).get("lm_head")
    if w is None:
        w = params.get("lm_head")
    if w is None:
        w = (lora or {}).get("embed", params["embed"])
    logits = base_matmul(h, w)
    if cfg.logit_scale is not None:
        logits = logits * cfg.logit_scale
    if cfg.final_softcap is not None:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return logits
