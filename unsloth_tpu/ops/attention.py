"""Attention dispatch.

Parity target: the reference's backend table + ``run_attention``
(reference: unsloth/utils/attention_dispatch.py:91-94,138,178-437 — selects
flash-varlen for packed sequences, dense flash, xformers, or SDPA; handles
GQA expansion, sliding windows, and softcapping via a separate flex-attention
path in kernels/flex_attention.py).

TPU-native redesign: one logical op `attention(...)` with named semantics
(causal, segment_ids for packing, sliding window, softcap, GQA) and two
implementations:

  * `attention_ref` — pure-jnp masked SDPA; the parity oracle and CPU path.
    Packing is expressed with segment ids (the TPU idiom) instead of varlen
    cu_seqlens: tokens attend only within their segment.
  * TPU fast path — `jax.experimental.pallas.ops.tpu.flash_attention`
    (public JAX Pallas op) for the common causal/packed case. Softcap or
    sliding-window cases fall back to the reference path until the splash-
    attention integration lands (splash supports local windows natively).

Layout: q [B, T, Hq, Dh]; k, v [B, S, Hkv, Dh]; segment_ids [B, T] int32
(0 is a valid segment; padding should use a dedicated segment id with
label masking, or attention masks out pad via segment mismatch).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..utils import env


_PREFIX_LAYOUT = None
_SEGMENT_BOUND = None


class packed_segment_bound:
    """Context manager declaring the packer's max-segment-length cap for
    every `attention()` call traced inside it. A declared bound routes
    packed causal attention to the segment-block-sparse kernel
    (ops/packed_attention.py) — O(sum len_i^2) instead of O(T^2).

    TRACE-TIME constant, like `prefix_attention`: set it before building
    the jitted train step (SFTTrainer does this from its packing config).
    The bound must be >= the longest real segment the packer can emit —
    a violated bound silently truncates that segment's attention span."""

    def __init__(self, max_segment_len: Optional[int]):
        self.bound = None if max_segment_len is None \
            else int(max_segment_len)

    def __enter__(self):
        global _SEGMENT_BOUND
        self._prev = _SEGMENT_BOUND
        _SEGMENT_BOUND = self.bound
        return self

    def __exit__(self, *exc):
        global _SEGMENT_BOUND
        _SEGMENT_BOUND = self._prev
        return False


def current_segment_bound():
    if _SEGMENT_BOUND is not None:
        return _SEGMENT_BOUND
    return env.env_int("UNSLOTH_SEGMENT_BOUND", 0) or None


class prefix_attention:
    """Context manager activating the shared-prefix GRPO attention layout
    (P, G, L) for every `attention()` call traced inside it.

    The layout is a TRACE-TIME constant: a jitted function traced under
    this context bakes the layout in. Trainers use one fixed layout per
    run (GRPOTrainer derives it from max_prompt/completion lengths), so
    jit caches stay coherent; do not reuse one jitted fn across layouts."""

    def __init__(self, layout):
        self.layout = tuple(int(x) for x in layout)

    def __enter__(self):
        global _PREFIX_LAYOUT
        self._prev = _PREFIX_LAYOUT
        _PREFIX_LAYOUT = self.layout
        return self

    def __exit__(self, *exc):
        global _PREFIX_LAYOUT
        _PREFIX_LAYOUT = self._prev
        return False


def current_prefix_layout():
    return _PREFIX_LAYOUT


def _gqa_expand(k, hq):
    hkv = k.shape[2]
    if hq == hkv:
        return k
    assert hq % hkv == 0
    return jnp.repeat(k, hq // hkv, axis=2)


def attention_ref(
    q, k, v,
    *,
    causal: bool = True,
    segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    scale: Optional[float] = None,
    positions: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    image_spans: Optional[jnp.ndarray] = None,
    sinks: Optional[jnp.ndarray] = None,
    prefix_layout: Optional[tuple] = None,
):
    """Masked SDPA reference. fp32 softmax. Returns [B, T, Hq, Dh].

    prefix_layout (P, G, L): shared-prefix GRPO layout — replaces the
    causal/window/positions mask with the static slot mask from
    prefix_mask_array (segment_ids still apply, for padding).

    image_spans [B, T] int32 (0 = text): tokens in the same nonzero span
    attend bidirectionally (gemma-3 VLM semantics — image tokens see each
    other regardless of causal order).

    sinks [Hq] (gpt-oss): a learned per-head logit that joins the softmax
    denominator but contributes no value — softmax([scores, sink]) with the
    sink column dropped before the value matmul (HF
    GptOssAttention/eager_attention_forward semantics)."""
    b, t, hq, dh = q.shape
    s = k.shape[1]
    if scale is None:
        scale = dh ** -0.5

    k = _gqa_expand(k, hq)
    v = _gqa_expand(v, hq)

    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if softcap is not None:
        scores = softcap * jnp.tanh(scores / softcap)

    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    if kv_positions is None:
        if s == t:
            kv_positions = positions
        else:
            kv_positions = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32)[None], (b, s))

    qpos = positions[:, :, None]     # [B, T, 1]
    kpos = kv_positions[:, None, :]  # [B, 1, S]
    mask = jnp.ones((b, t, s), dtype=bool)
    if prefix_layout is not None:
        pm = jnp.asarray(prefix_mask_array(*prefix_layout))
        mask &= pm[None]
        causal = False
        window = None
    if causal:
        causal_ok = qpos >= kpos
        if image_spans is not None:
            same_image = (image_spans[:, :, None] == image_spans[:, None, :]) \
                & (image_spans[:, :, None] > 0)
            causal_ok |= same_image
        mask &= causal_ok
    if window is not None:
        mask &= (qpos - kpos) < window
    if segment_ids is not None:
        kv_seg = kv_segment_ids if kv_segment_ids is not None else segment_ids
        mask &= segment_ids[:, :, None] == kv_seg[:, None, :]

    scores = jnp.where(mask[:, None, :, :], scores, -jnp.inf)
    if sinks is not None:
        sink_col = jnp.broadcast_to(
            sinks.astype(jnp.float32)[None, :, None, None], (b, hq, t, 1))
        aug = jnp.concatenate([scores, sink_col], axis=-1)
        probs = jax.nn.softmax(aug, axis=-1)[..., :-1]  # drop the sink
    else:
        probs = jax.nn.softmax(scores, axis=-1)
        # Fully-masked rows (padding) produce NaN from softmax(-inf row);
        # zero them.
        probs = jnp.where(
            jnp.any(mask[:, None, :, :], axis=-1, keepdims=True), probs,
            0.0)
    out = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def prefix_mask_array(P: int, G: int, L: int):
    """Static [T, T] bool mask for the shared-prefix GRPO layout
    [P prompt slots | G completion regions of L slots], T = P + G*L.

    q attends kv iff slot-causal AND (kv in prefix OR same completion
    region) — each completion sees the shared prompt once plus itself;
    the prompt is causal within itself; completions never see each other.
    (Reference: unsloth/utils/prefix_grouper_kernel.py:384 builds this as
    a FlexAttention block mask; here it is a trace-time constant, so the
    splash kernel compiles ONCE for a fixed (P, G, L).)"""
    import numpy as np

    T = P + G * L
    q = np.arange(T)[:, None]
    k = np.arange(T)[None, :]
    in_prefix_k = k < P
    reg_q = np.where(q >= P, (q - P) // L, -1)
    reg_k = np.where(k >= P, (k - P) // L, -2)
    same_region = reg_q == reg_k
    return (q >= k) & (in_prefix_k | same_region)


def _prefix_positions(P: int, G: int, L: int):
    """Rope positions for the layout: prompt 0..P-1; each completion
    restarts at P (its tokens logically follow the prompt)."""
    import numpy as np

    return np.concatenate(
        [np.arange(P), np.tile(P + np.arange(L), G)]).astype(np.int32)


def _splash_kernel(t: int, s: int, heads_per_kv: int, causal: bool,
                   window, softcap, interpret: bool,
                   prefix_layout=None):
    """Build a splash-attention MQA kernel for one mask config. Built fresh
    per trace — caching the kernel object across jit traces leaks tracers
    (its mask-info arrays belong to the trace that created them).

    Splash (public JAX Pallas op) natively supports GQA (q heads share one
    KV head — no KV repeat materialization), local/sliding-window masks,
    logit softcap, and segment ids: exactly the semantics the reference
    assembles from flash-varlen + FlexAttention block masks
    (reference: utils/attention_dispatch.py + kernels/flex_attention.py)."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk, splash_attention_mask as sm)

    if prefix_layout is not None:
        base = sm.NumpyMask(prefix_mask_array(*prefix_layout))
    elif window is not None:
        base = sm.LocalMask((t, s), window_size=(window - 1, 0), offset=0)
    elif causal:
        base = sm.CausalMask((t, s))
    else:
        base = sm.FullMask((t, s))
    mask = sm.MultiHeadMask([base] * heads_per_kv)
    return sk.make_splash_mqa_single_device(
        mask=mask, attn_logits_soft_cap=softcap, interpret=interpret,
        head_shards=1, q_seq_shards=1)


def _tpu_splash(q, k, v, *, causal, segment_ids, window, softcap, scale,
                interpret=False, prefix_layout=None):
    """q [B,T,Hq,Dh]; k,v [B,S,Hkv,Dh] -> [B,T,Hq,Dh]."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk)

    b, t, hq, dh = q.shape
    s, hkv = k.shape[1], k.shape[2]
    g = hq // hkv
    kernel = _splash_kernel(t, s, g, causal, window, softcap, interpret,
                            prefix_layout=prefix_layout)

    qs = (q * scale).transpose(0, 2, 1, 3).reshape(b, hkv, g, t, dh)
    ks = k.transpose(0, 2, 1, 3)   # [B, Hkv, S, Dh]
    vs = v.transpose(0, 2, 1, 3)

    seg = None
    if segment_ids is not None:
        seg = sk.SegmentIds(q=segment_ids, kv=segment_ids)

    def per_batch(qb, kb, vb, seg_b):
        def per_kv_head(qh, kh, vh):
            return kernel(qh, kh, vh, segment_ids=seg_b)

        return jax.vmap(per_kv_head)(qb, kb, vb)

    if seg is not None:
        out = jax.vmap(per_batch)(qs, ks, vs, seg)
    else:
        out = jax.vmap(lambda a, b_, c: per_batch(a, b_, c, None))(
            qs, ks, vs)
    # out: [B, Hkv, G, T, Dh]
    return out.reshape(b, hq, t, dh).transpose(0, 2, 1, 3)


def _ring_dispatch(q, k, v, mesh, axis_name, n, *, segment_ids, scale,
                   softcap, window=None, sinks=None):
    """shard_map ring attention over the sp axis (inside the current jit)."""
    import functools as ft

    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    from ..parallel.ring_attention import ring_attention

    spec = P(None, axis_name, None, None)
    seg_spec = P(None, axis_name)
    body = ft.partial(ring_attention, axis_name=axis_name, axis_size=n,
                      causal=True, scale=scale, softcap=softcap,
                      window=window, sinks=sinks)
    if segment_ids is not None:
        fn = shard_map(
            lambda q_, k_, v_, s_: body(q_, k_, v_, segment_ids=s_),
            mesh=mesh, in_specs=(spec, spec, spec, seg_spec),
            out_specs=spec)
        return fn(q, k, v, segment_ids)
    fn = shard_map(lambda q_, k_, v_: body(q_, k_, v_), mesh=mesh,
                   in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def _chunked_lse(q, k, *, causal, segment_ids, window, softcap, scale,
                 q_chunk=512):
    """Differentiable logsumexp of the masked attention scores, [B, Hq, T].

    Computed in q-chunks under jax.checkpoint so the full [T, S] score
    matrix never materializes (forward or backward). Used to apply
    gpt-oss attention sinks on top of a fast kernel's output:
    out_with_sink = out * sigmoid(lse - sink) — exact, because the sink is
    an extra softmax logit with zero value.
    """
    b, t, hq, dh = q.shape
    s, hkv = k.shape[1], k.shape[2]
    g = hq // hkv
    q_chunk = min(q_chunk, t)
    while t % q_chunk:
        q_chunk //= 2
    nc = t // q_chunk
    qs = (q.astype(jnp.float32) * scale).reshape(b, nc, q_chunk, hkv, g, dh)
    qs = qs.transpose(1, 0, 3, 4, 2, 5)            # [nc, B, Hkv, G, C, Dh]
    kt = k.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B, Hkv, S, Dh]
    kpos = jnp.arange(s, dtype=jnp.int32)
    qpos = jnp.arange(t, dtype=jnp.int32).reshape(nc, q_chunk)
    if segment_ids is not None:
        seg_q = segment_ids.reshape(b, nc, q_chunk).transpose(1, 0, 2)
    else:
        seg_q = jnp.zeros((nc, b, q_chunk), jnp.int32)
    seg_kv = (segment_ids if segment_ids is not None
              else jnp.zeros((b, s), jnp.int32))

    @jax.checkpoint
    def one(args):
        qc, qp, sq = args                          # [B,Hkv,G,C,Dh],[C],[B,C]
        scores = jnp.einsum("bkgcd,bksd->bkgcs", qc, kt)
        if softcap is not None:
            scores = softcap * jnp.tanh(scores / softcap)
        m = sq[:, :, None] == seg_kv[:, None, :]   # [B, C, S]
        if causal:
            m &= qp[None, :, None] >= kpos[None, None, :]
        if window is not None:
            m &= (qp[None, :, None] - kpos[None, None, :]) < window
        scores = jnp.where(m[:, None, None, :, :], scores, -jnp.inf)
        return jax.scipy.special.logsumexp(scores, axis=-1)  # [B,Hkv,G,C]

    lse = jax.lax.map(one, (qs, qpos, seg_q))      # [nc, B, Hkv, G, C]
    return lse.transpose(1, 2, 3, 0, 4).reshape(b, hq, t)


def _apply_sinks(out, lse, sinks):
    """out [B,T,Hq,Dh] * sigmoid(lse - sink) with lse [B,Hq,T]."""
    c = jax.nn.sigmoid(lse - sinks.astype(jnp.float32)[None, :, None])
    return (out.astype(jnp.float32)
            * c.transpose(0, 2, 1)[..., None]).astype(out.dtype)


def _flash_block_sizes(t):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    # Block 1024 is ~7% faster fwd+bwd at 8K, but its backward buffers
    # add ~1 GB of HLO temp — enough to OOM the 8B/8K headline config on
    # a 16 GB chip. Default 512; opt into bigger blocks when memory
    # allows via UNSLOTH_FLASH_BLOCK. UNSLOTH_FLASH_BLOCK_BWD sets the
    # dkv/dq pass blocks independently (the bwd temps, not the fwd
    # schedule, are what OOM first).
    pref = int(os.environ.get("UNSLOTH_FLASH_BLOCK", "512"))
    pref_b = int(os.environ.get("UNSLOTH_FLASH_BLOCK_BWD", pref))
    block = next(b for b in (pref, 512, 256, 128) if b <= t and t % b == 0)
    bwd = next(b for b in (pref_b, 512, 256, 128) if b <= t and t % b == 0)
    return BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=bwd, block_k_major_dkv=bwd,
        block_k_dkv=bwd, block_q_dkv=bwd,
        block_k_major_dq=bwd, block_k_dq=bwd, block_q_dq=bwd,
    )


def _tpu_flash(q, k, v, *, causal, segment_ids, scale):
    """Pallas flash attention (public JAX op) — causal / packed, no softcap."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    b, t, hq, dh = q.shape
    k = _gqa_expand(k, hq)
    v = _gqa_expand(v, hq)
    # flash_attention expects [B, H, T, Dh]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    seg = None
    if segment_ids is not None:
        seg = SegmentIds(q=segment_ids, kv=segment_ids)
    out = flash_attention(qt, kt, vt, segment_ids=seg, causal=causal,
                          sm_scale=scale, block_sizes=_flash_block_sizes(t))
    return out.transpose(0, 2, 1, 3)


def _tpu_flash_sinks(q, k, v, sinks, *, causal, segment_ids, scale):
    """Flash attention with gpt-oss attention sinks in ONE score pass.

    The sink is an extra per-head softmax logit with zero value (HF
    GptOssAttention semantics). Instead of a second QK^T pass for the lse
    (the r2 `_chunked_lse` approach), fold the sink into the softmax
    normalizer of the stock Pallas flash kernel:

      fwd:  (o, l, m) from the kernel with save_residuals; the sink joins
            as m' = max(m, s), l' = l*exp(m-m') + exp(s-m'); the exact
            rescale is out = o * (l*exp(m-m'))/l' = o * sigmoid(lse - s).
      bwd:  the stock bwd kernels recompute p = exp(score - m)/l from
            (l, m); handing them (l', m') makes that exactly the
            sink-softmax probability p' = exp(score - lse'). With
            di = rowsum(G * out) (= the sink-softmax D term, since the
            sink contributes no value) the kernels' ds = p'(dp - di) is
            the exact gradient. dsink_h = -sum_t p'_sink * di.

    One attention-score pass forward, standard-cost backward — ~2x fewer
    score FLOPs than the chunked-lse construction it replaces
    (reference for sink semantics: gpt_oss modeling eager_attention_forward)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    b, t, hq, dh = q.shape
    k = _gqa_expand(k, hq)
    v = _gqa_expand(v, hq)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    sizes = _flash_block_sizes(t)

    def _seg(sq, skv):
        return (None if sq is None
                else _fa.SegmentIds(q=sq, kv=skv))

    def _fwd_impl(qt, kt, vt, sk, sq, skv):
        o, l, m = _fa._flash_attention_impl(
            qt, kt, vt, None, _seg(sq, skv), True, causal, scale,
            sizes.block_b, sizes.block_q, sizes.block_k_major,
            sizes.block_k, False)
        s = sk.astype(jnp.float32)[None, :, None]          # [1, H, 1]
        m2 = jnp.maximum(m, s)
        scaled_l = l * jnp.exp(m - m2)
        l2 = scaled_l + jnp.exp(s - m2)
        c = scaled_l / l2
        out = (o.astype(jnp.float32) * c[..., None]).astype(o.dtype)
        return out, (qt, kt, vt, sk, sq, skv, out, l2, m2)

    @jax.custom_vjp
    def f(qt, kt, vt, sk, sq, skv):
        return _fwd_impl(qt, kt, vt, sk, sq, skv)[0]

    def f_fwd(qt, kt, vt, sk, sq, skv):
        return _fwd_impl(qt, kt, vt, sk, sq, skv)

    def f_bwd(res, g):
        qt, kt, vt, sk, sq, skv, out, l2, m2 = res
        seg = _seg(sq, skv)
        di = jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32),
                     axis=-1)                              # [B, H, T]
        dk, dv = _fa._flash_attention_bwd_dkv(
            qt, kt, vt, None, seg, l2, m2, g, di,
            block_q_major=sizes.block_q_major_dkv,
            block_k_major=sizes.block_k_major_dkv,
            block_k=sizes.block_k_dkv, block_q=sizes.block_q_dkv,
            sm_scale=scale, causal=causal,
            mask_value=_fa.DEFAULT_MASK_VALUE, debug=False)
        dq, _ = _fa._flash_attention_bwd_dq(
            qt, kt, vt, None, seg, l2, m2, g, di,
            block_q_major=sizes.block_q_dq,
            block_k_major=sizes.block_k_major_dq,
            block_k=sizes.block_k_dq,
            sm_scale=scale, causal=causal,
            mask_value=_fa.DEFAULT_MASK_VALUE, debug=False)
        lse2 = m2 + jnp.log(l2)
        p_sink = jnp.exp(sk.astype(jnp.float32)[None, :, None] - lse2)
        dsk = -jnp.sum(p_sink * di, axis=(0, 2)).astype(sk.dtype)
        return (dq.astype(qt.dtype), dk.astype(kt.dtype),
                dv.astype(vt.dtype), dsk, None, None)

    f.defvjp(f_fwd, f_bwd)
    out = f(qt, kt, vt, sinks, segment_ids, segment_ids)
    return out.transpose(0, 2, 1, 3)


def banded_window_attention(q, k, v, *, window, segment_ids=None,
                            scale=None, sinks=None, softcap=None):
    """Exact sliding-window attention via block-banding — O(T * 2W).

    For window W << T (gpt-oss sliding layers: W=128), each query block of
    size B = roundup(W, 128) attends only kv blocks [i-1, i]; everything
    else is causally+window masked anyway. Scores are [nb, B, 2B] instead
    of [T, T]. Pure jnp (differentiable, fuses under XLA, runs on any
    backend); sinks and softcap handled inline and exactly. Wrapped in
    jax.checkpoint so the banded probs are recomputed, not saved.

    Requires: causal, T % B == 0, self-attention (S == T)."""
    b, t, hq, dh = q.shape
    s_len, hkv = k.shape[1], k.shape[2]
    assert s_len == t
    if scale is None:
        scale = dh ** -0.5
    B = -(-window // 128) * 128
    assert t % B == 0
    nb = t // B
    k = _gqa_expand(k, hq)
    v = _gqa_expand(v, hq)

    @functools.partial(jax.checkpoint, static_argnums=())
    def run(q, k, v, seg, sinks):
        qb = q.reshape(b, nb, B, hq, dh).astype(jnp.float32) * scale
        kb = k.reshape(b, nb, B, hq, dh).astype(jnp.float32)
        vb = v.reshape(b, nb, B, hq, dh).astype(jnp.float32)

        def band(x):
            prev = jnp.concatenate(
                [jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
            return jnp.concatenate([prev, x], axis=2)     # [b, nb, 2B, ...]

        kband, vband = band(kb), band(vb)
        scores = jnp.einsum("bnrhd,bnchd->bnhrc", qb, kband)
        if softcap is not None:
            scores = softcap * jnp.tanh(scores / softcap)
        qpos = (jax.lax.broadcasted_iota(jnp.int32, (nb, B), 0) * B
                + jax.lax.broadcasted_iota(jnp.int32, (nb, B), 1))
        kpos = qpos[:, :1] - B + jax.lax.broadcasted_iota(
            jnp.int32, (nb, 2 * B), 1)                    # [nb, 2B]
        delta = qpos[:, :, None] - kpos[:, None, :]       # [nb, B, 2B]
        mask = (delta >= 0) & (delta < window) & (kpos[:, None, :] >= 0)
        mask = jnp.broadcast_to(mask[None], (b, nb, B, 2 * B))
        if seg is not None:
            sq = seg.reshape(b, nb, B)
            skv = band(seg.reshape(b, nb, B, 1, 1))[..., 0, 0]
            mask = mask & (sq[:, :, :, None] == skv[:, :, None, :])
        scores = jnp.where(mask[:, :, None], scores, -jnp.inf)
        if sinks is not None:
            sink_col = jnp.broadcast_to(
                sinks.astype(jnp.float32)[None, None, :, None, None],
                (b, nb, hq, B, 1))
            aug = jnp.concatenate([scores, sink_col], axis=-1)
            probs = jax.nn.softmax(aug, axis=-1)[..., :-1]
        else:
            probs = jax.nn.softmax(scores, axis=-1)
            probs = jnp.where(
                jnp.any(mask[:, :, None], axis=-1, keepdims=True),
                probs, 0.0)
        out = jnp.einsum("bnhrc,bnchd->bnrhd", probs, vband)
        return out.reshape(b, t, hq, dh)

    return run(q, k, v, segment_ids, sinks).astype(q.dtype)


def attention(
    q, k, v,
    *,
    causal: bool = True,
    segment_ids: Optional[jnp.ndarray] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    scale: Optional[float] = None,
    positions: Optional[jnp.ndarray] = None,
    image_spans: Optional[jnp.ndarray] = None,
    sinks: Optional[jnp.ndarray] = None,
    prefix_layout: Optional[tuple] = None,
):
    """Dispatching attention op (training path, self-attention).

    Selection mirrors the reference's backend priority
    (attention_dispatch.py:138): fastest kernel that supports the requested
    semantics, else the reference implementation.

    sinks (gpt-oss): applied on top of the fast kernels as an exact
    rescale — out * sigmoid(lse - sink) — with lse from a differentiable
    chunked pass (_chunked_lse); the reference path handles them inline.
    """
    b, t, hq, dh = q.shape
    hkv = k.shape[2]
    if scale is None:
        scale = dh ** -0.5

    if prefix_layout is None and t == k.shape[1]:
        lay = current_prefix_layout()
        if lay is not None and lay[0] + lay[1] * lay[2] == t:
            prefix_layout = lay
    if prefix_layout is not None:
        # shared-prefix GRPO layout: static splash mask on TPU (compiled
        # once per (P, G, L)), masked-SDPA reference elsewhere.
        on_tpu_ = jax.default_backend() == "tpu" and not env.disable_pallas()
        if (on_tpu_ and dh % 64 == 0 and t % 128 == 0 and hq % hkv == 0
                and softcap is None and sinks is None):
            return _tpu_splash(q, k, v, causal=True,
                               segment_ids=segment_ids, window=None,
                               softcap=None, scale=scale,
                               prefix_layout=prefix_layout)
        return attention_ref(q, k, v, causal=True,
                             segment_ids=segment_ids, scale=scale,
                             softcap=softcap, sinks=sinks,
                             prefix_layout=prefix_layout)

    # Context parallelism: when a trainer activated an "sp" mesh axis
    # (parallel/context.py), route through ring attention — the sequence
    # dim is sharded and KV rotates over ICI instead of being gathered.
    from ..parallel.context import current_context_parallel

    cp = current_context_parallel()
    if cp is not None and causal and image_spans is None:
        mesh, axis_name = cp
        n = mesh.shape[axis_name]
        if t % n == 0 and t == k.shape[1]:
            return _ring_dispatch(q, k, v, mesh, axis_name, n,
                                  segment_ids=segment_ids, scale=scale,
                                  softcap=softcap, window=window,
                                  sinks=sinks)

    on_tpu = jax.default_backend() == "tpu" and not env.disable_pallas()
    # dh=64 (gpt-oss) works in the Pallas kernels — blocks pad the lane
    # dim; the seq-block tiling is what must stay 128-aligned.
    aligned = (dh % 64 == 0 and t % 128 == 0 and t == k.shape[1]
               and hq % hkv == 0)
    # positions are advisory: packing correctness comes from segment_ids
    # (slot order == position order within a segment), so kernels that
    # don't take positions are still exact.
    no_img = image_spans is None
    plain = softcap is None and window is None
    # A window narrow relative to T: banding beats any full-grid kernel.
    narrow = (window is not None and t % (-(-window // 128) * 128) == 0
              and (-(-window // 128) * 128) * 4 <= t)

    if sinks is not None:
        if plain and causal and on_tpu and aligned and no_img:
            return _tpu_flash_sinks(q, k, v, sinks, causal=causal,
                                    segment_ids=segment_ids, scale=scale)
        if narrow and causal and no_img and dh % 64 == 0:
            return banded_window_attention(
                q, k, v, window=window, segment_ids=segment_ids,
                scale=scale, sinks=sinks, softcap=softcap)
        if on_tpu and aligned and no_img:
            out = attention(q, k, v, causal=causal,
                            segment_ids=segment_ids, window=window,
                            softcap=softcap, scale=scale)
            lse = _chunked_lse(q, k, causal=causal,
                               segment_ids=segment_ids, window=window,
                               softcap=softcap, scale=scale)
            return _apply_sinks(out, lse, sinks)
        return attention_ref(
            q, k, v, causal=causal, segment_ids=segment_ids,
            window=window, softcap=softcap, scale=scale,
            positions=positions, image_spans=image_spans, sinks=sinks)
    # Packed rows with a declared max-segment-length: the segment-block-
    # sparse kernel skips kv blocks outside each query block's segment
    # span — O(sum len_i^2), the TPU-native form of FA2 varlen (reference
    # HF FA2 `flash_attn_varlen_func`); ~NxT/len_bar less attention work
    # on short-segment SFT data.
    # Mesh composition rule: under an active sp axis the ring dispatch
    # above returns FIRST, so the packed kernel never sees a sequence-
    # sharded T (its kv-block metadata assumes the full row). dp/fsdp/tp
    # shard batch/heads only and compose (tests/test_multichip.py
    # exercises it under a (2,2,2) mesh).
    seg_bound = current_segment_bound() if segment_ids is not None else None
    if (seg_bound is not None and causal and plain and no_img
            and on_tpu and aligned and dh % 128 == 0
            and not env.env_flag("UNSLOTH_DISABLE_SPARSE_PACKED")):
        from .packed_attention import packed_flash_attention

        return packed_flash_attention(
            q, k, v, segment_ids, max_segment_len=seg_bound, scale=scale)
    # Measured on v5e at 8K ctx: flash fwd+bwd 47 ms vs splash 183 ms for
    # the same causal+packed semantics — flash first; splash only where its
    # extra semantics (sliding window, softcap) are actually needed.
    if (on_tpu and aligned and no_img and plain
            and not env.env_flag("UNSLOTH_PREFER_SPLASH")):
        return _tpu_flash(q, k, v, causal=causal, segment_ids=segment_ids,
                          scale=scale)
    if on_tpu and aligned and no_img and not env.env_flag(
            "UNSLOTH_DISABLE_SPLASH"):
        return _tpu_splash(q, k, v, causal=causal, segment_ids=segment_ids,
                           window=window, softcap=softcap, scale=scale)
    if on_tpu and aligned and no_img and plain:
        return _tpu_flash(q, k, v, causal=causal, segment_ids=segment_ids,
                          scale=scale)
    return attention_ref(
        q, k, v, causal=causal, segment_ids=segment_ids, window=window,
        softcap=softcap, scale=scale, positions=positions,
        image_spans=image_spans)
