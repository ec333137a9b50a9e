"""Ring attention — context parallelism over a sequence-sharded mesh.

The reference has NO context parallelism (SURVEY §2j: "sequence/context
parallel: absent — long context is reached by memory engineering"); this is
the beyond-parity stretch goal (SURVEY §7 step 7). Sequence length is
sharded over a mesh axis; each device holds a Q/K/V shard and KV blocks
rotate around the ring (`jax.lax.ppermute` — XLA lowers it to ICI RDMA),
with flash-style online-softmax accumulation so the full [T, T] score
matrix never exists on any device.

Causality across shards is block-granular: with every device holding a
contiguous sequence shard, a KV block strictly in the future is skipped
entirely, the diagonal block masks within itself, and past blocks run
unmasked. Packed batches are supported: segment ids travel around the ring
with their KV shard and gate the scores exactly like the single-device
kernels.

Usage: inside `shard_map` over axis `axis_name` with q/k/v (and
segment_ids) sharded on the sequence dim; `ring_attention_sharded` builds
the whole jitted shard_map for convenience, and the decoder routes here
when `parallel.context.context_parallel(mesh, "sp")` is active.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attend(q, k, v, scale, mask, softcap=None):
    """q [B,Tq,Hq,D], k/v [B,Tk,Hq,D]; mask [B,Tq,Tk] bool or None.
    Returns (numerator [B,Tq,Hq,D] fp32, row max m [B,Tq,Hq] fp32,
    row sum l [B,Tq,Hq] fp32)."""
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if softcap is not None:
        scores = softcap * jnp.tanh(scores / softcap)
    if mask is not None:
        scores = jnp.where(mask[:, None], scores, -jnp.inf)
    m = jnp.max(scores, axis=-1)                      # [B,H,Tq]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(scores - m_safe[..., None])
    if mask is not None:
        p = jnp.where(mask[:, None], p, 0.0)
    l = jnp.sum(p, axis=-1)                           # [B,H,Tq]
    o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
    return o, m.transpose(0, 2, 1), l.transpose(0, 2, 1)


def ring_attention(q, k, v, *, axis_name: str, axis_size: int,
                   causal: bool = True, scale: Optional[float] = None,
                   segment_ids: Optional[jnp.ndarray] = None,
                   softcap: Optional[float] = None,
                   window: Optional[int] = None,
                   sinks: Optional[jnp.ndarray] = None):
    """Per-shard body (call inside shard_map). q/k/v: the local sequence
    shard [B, T_local, Hq, D] / [B, T_local, Hkv, D] (GQA expanded here);
    segment_ids: the local [B, T_local] shard. axis_size must be the
    static mesh-axis size. Returns the local output shard.

    window: sliding-window attention across the ring — masks with GLOBAL
    slot positions (qpos - kpos < window), so mistral/gemma-class
    windowed models can train under sp-axis context parallelism. A KV
    block entirely outside the window contributes nothing (its masked
    scores vanish in the -inf-safe online-softmax combine)."""
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    if hq != hkv:
        rep = hq // hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if scale is None:
        scale = d ** -0.5
    n = axis_size
    my = jax.lax.axis_index(axis_name)

    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)

    neg_inf = jnp.full((b, t, hq), -jnp.inf, jnp.float32)
    acc = jnp.zeros((b, t, hq, d), jnp.float32)
    m_run = neg_inf
    l_run = jnp.zeros((b, t, hq), jnp.float32)

    def step(i, carry):
        acc, m_run, l_run, k_cur, v_cur, seg_cur = carry
        src_block = (my - i) % n          # whose KV we hold this step

        mask = None
        if causal or window is not None:
            # global slot positions of this q shard vs the visiting KV
            # shard: causality and the sliding window are direct compares
            # (a future or out-of-window block yields an all-False mask
            # whose contribution vanishes in the combine).
            delta = (my - src_block) * t + rows - cols   # qpos - kpos
            mask = jnp.ones((t, t), bool)
            if causal:
                mask &= delta >= 0
            if window is not None:
                mask &= delta < window
            mask = jnp.broadcast_to(mask[None], (b, t, t))
        if seg_cur is not None and segment_ids is not None:
            seg_mask = segment_ids[:, :, None] == seg_cur[:, None, :]
            mask = seg_mask if mask is None else (mask & seg_mask)

        o_b, m_b, l_b = _block_attend(q, k_cur, v_cur, scale, mask,
                                      softcap)
        m_new = jnp.maximum(m_run, m_b)
        m_new_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        a1 = jnp.where(jnp.isfinite(m_run),
                       jnp.exp(m_run - m_new_safe), 0.0)
        a2 = jnp.where(jnp.isfinite(m_b),
                       jnp.exp(m_b - m_new_safe), 0.0)
        acc2 = acc * a1[..., None] + o_b * a2[..., None]
        l2 = l_run * a1 + l_b * a2
        m2 = m_new

        # rotate KV (+ its segment ids) to the next device (ring over ICI)
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        seg_next = (jax.lax.ppermute(seg_cur, axis_name, perm)
                    if seg_cur is not None else None)
        return acc2, m2, l2, k_next, v_next, seg_next

    carry = (acc, m_run, l_run, k, v, segment_ids)
    # unrolled python loop: n is static (mesh size)
    for i in range(n):
        carry = step(i, carry)
    acc, m_run, l_run = carry[:3]
    out = acc / jnp.maximum(l_run[..., None], 1e-30)
    if sinks is not None:
        # gpt-oss sinks: a per-head logit in the softmax denominator
        # only — out *= sigmoid(lse - sink). The running stats already
        # hold the GLOBAL lse = m + log(l) after the full ring, so the
        # sink is exact regardless of sharding (ops/attention.py
        # _apply_sinks is the single-device twin).
        lse = jnp.where(l_run > 0,
                        jnp.where(jnp.isfinite(m_run), m_run, 0.0)
                        + jnp.log(jnp.maximum(l_run, 1e-30)),
                        -jnp.inf)                     # [B, T, Hq]
        out = out * jax.nn.sigmoid(
            lse - sinks.astype(jnp.float32)[None, None, :])[..., None]
    return out.astype(q.dtype)


def ring_attention_sharded(mesh: Mesh, axis_name: str = "sp",
                           causal: bool = True,
                           scale: Optional[float] = None,
                           softcap: Optional[float] = None,
                           window: Optional[int] = None,
                           sinks: Optional[jnp.ndarray] = None,
                           with_segment_ids: bool = False):
    """Build a jitted, shard_mapped ring attention: takes global
    q/k/v [B, T, H, D] (sequence sharded over `axis_name`), and, when
    with_segment_ids, a global [B, T] segment-id array."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = P(None, axis_name, None, None)
    seg_spec = P(None, axis_name)

    n = mesh.shape[axis_name]

    if with_segment_ids:
        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh, in_specs=(spec, spec, spec, seg_spec),
            out_specs=spec)
        def fn(q, k, v, seg):
            return ring_attention(q, k, v, axis_name=axis_name,
                                  axis_size=n, causal=causal, scale=scale,
                                  segment_ids=seg, softcap=softcap,
                                  window=window, sinks=sinks)

        return fn

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=spec)
    def fn(q, k, v):
        return ring_attention(q, k, v, axis_name=axis_name, axis_size=n,
                              causal=causal, scale=scale, softcap=softcap,
                              window=window, sinks=sinks)

    return fn
