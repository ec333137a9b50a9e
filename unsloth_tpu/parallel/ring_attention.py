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
unmasked.

Usage: inside `shard_map` over axis `axis_name` with q/k/v sharded on the
sequence dim; `ring_attention_sharded` builds the whole jitted shard_map
for convenience.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attend(q, k, v, scale, mask):
    """q [B,Tq,H,D], k/v [B,Tk,H,D]; mask [Tq,Tk] bool or None.
    Returns (numerator [B,Tq,H,D] fp32, row max m [B,Tq,H] fp32,
    row sum l [B,Tq,H] fp32)."""
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if mask is not None:
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    m = jnp.max(scores, axis=-1)                      # [B,H,Tq]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(scores - m_safe[..., None])
    if mask is not None:
        p = jnp.where(mask[None, None], p, 0.0)
    l = jnp.sum(p, axis=-1)                           # [B,H,Tq]
    o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
    return o, m.transpose(0, 2, 1), l.transpose(0, 2, 1)


def ring_attention(q, k, v, *, axis_name: str, axis_size: int,
                   causal: bool = True, scale: Optional[float] = None):
    """Per-shard body (call inside shard_map). q/k/v: the local sequence
    shard [B, T_local, H, D] (same heads on all devices). axis_size must
    be the static mesh-axis size. Returns the local output shard."""
    b, t, h, d = q.shape
    if scale is None:
        scale = d ** -0.5
    n = axis_size
    my = jax.lax.axis_index(axis_name)

    diag_mask = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        diag_mask = rows >= cols

    neg_inf = jnp.full((b, t, h), -jnp.inf, jnp.float32)
    acc = jnp.zeros((b, t, h, d), jnp.float32)
    m_run = neg_inf
    l_run = jnp.zeros((b, t, h), jnp.float32)

    def step(i, carry):
        acc, m_run, l_run, k_cur, v_cur = carry
        src_block = (my - i) % n          # whose KV we hold this step

        if causal:
            # block-granular causality as a dynamically selected mask:
            # past block -> full, diagonal -> lower-triangular, future ->
            # empty (its contribution vanishes in the -inf-safe combine).
            is_diag = src_block == my
            is_past = src_block < my
            full = jnp.ones((t, t), bool)
            empty = jnp.zeros((t, t), bool)
            mask = jnp.where(is_past, full,
                             jnp.where(is_diag, diag_mask, empty))
        else:
            mask = None

        o_b, m_b, l_b = _block_attend(q, k_cur, v_cur, scale, mask)
        m_new = jnp.maximum(m_run, m_b)
        m_new_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        a1 = jnp.where(jnp.isfinite(m_run),
                       jnp.exp(m_run - m_new_safe), 0.0)
        a2 = jnp.where(jnp.isfinite(m_b),
                       jnp.exp(m_b - m_new_safe), 0.0)
        acc2 = acc * a1[..., None] + o_b * a2[..., None]
        l2 = l_run * a1 + l_b * a2
        m2 = m_new

        # rotate KV to the next device (ring over ICI)
        perm = [(j, (j + 1) % n) for j in range(n)]
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        return acc2, m2, l2, k_next, v_next

    carry = (acc, m_run, l_run, k, v)
    # unrolled python loop: n is static (mesh size)
    for i in range(n):
        carry = step(i, carry)
    acc, m_run, l_run, _, _ = carry
    out = acc / jnp.maximum(l_run[..., None], 1e-30)
    return out.astype(q.dtype)


def ring_attention_sharded(mesh: Mesh, axis_name: str = "sp",
                           causal: bool = True,
                           scale: Optional[float] = None):
    """Build a jitted, shard_mapped ring attention: takes global
    q/k/v [B, T, H, D] (sequence sharded over `axis_name`)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = P(None, axis_name, None, None)

    n = mesh.shape[axis_name]

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=spec)
    def fn(q, k, v):
        return ring_attention(q, k, v, axis_name=axis_name, axis_size=n,
                              causal=causal, scale=scale)

    return fn
