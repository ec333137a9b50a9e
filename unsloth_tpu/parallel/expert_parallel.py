"""Expert parallelism — MoE experts sharded over an "ep" mesh axis.

Beyond-reference capability (SURVEY §2j: the reference's MoE experts are
grouped-GEMM on ONE device; expert parallel is listed as the TPU-native
equivalent to build: "megablocks-style EP over mesh axis"). Each device
owns E/ep experts and a token shard; tokens travel to their experts and
back with `jax.lax.all_to_all` (XLA lowers it to ICI), compute stays the
grouped-GEMM path.

Dispatch is capacity-based (the standard EP formulation): each device
sends at most C tokens to each peer; overflow assignments are DROPPED
(their weight contribution becomes zero — the usual Switch/GShard
semantics). With capacity_factor large enough to cover the realized
routing, the result equals the single-device grouped path exactly; the
parity tests pin that.

Layout inside shard_map (per device, axis size S, local experts E_l):
  x            [N_l, D]      local token shard
  send buffer  [S, C, D]     slot (d, c): c-th token assignment routed to
                             device d
  all_to_all   -> recv [S, C, D]: slot (s, c) = what peer s sent me
  local gmm over the valid recv rows grouped by local expert
  all_to_all back -> outputs return to their source slots
  combine      y[i] = sum_k w_k * out(slot of assignment (i, k))
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _ep_body(x, router_logits, dense_experts, *, axis: str, ep: int,
             num_experts_per_tok: int, act: str, norm_topk_prob: bool,
             capacity: int, routing: str, routing_params):
    from ..ops.moe import _route, glu_for

    n_l, d = x.shape
    e_total = dense_experts["gate"].shape[0] * ep
    e_local = e_total // ep
    k = num_experts_per_tok
    me = jax.lax.axis_index(axis)

    weights, sel = _route(router_logits, k, norm_topk_prob,
                          routing, routing_params)          # [N_l, k]
    flat_sel = sel.reshape(-1)                              # [N_l*k]
    dest = flat_sel // e_local                              # target device
    local_eid = flat_sel % e_local

    # slot within the destination bucket: rank of this assignment among
    # those going to the same destination (order-stable)
    one_hot = jax.nn.one_hot(dest, ep, dtype=jnp.int32)     # [N*k, S]
    pos_in_dest = jnp.cumsum(one_hot, axis=0) * one_hot
    slot = jnp.sum(pos_in_dest, axis=-1) - 1                # [N*k]
    keep = slot < capacity

    token_idx = jnp.arange(n_l * k) // k
    send_x = jnp.zeros((ep, capacity, d), x.dtype)
    send_eid = jnp.full((ep, capacity), e_local, jnp.int32)  # dummy group
    # dropped assignments scatter OUT OF BOUNDS (discarded by mode="drop")
    # so they cannot clobber slot (0, 0)
    dest_c = jnp.where(keep, dest, ep)
    send_x = send_x.at[dest_c, slot].set(
        jnp.take(x, token_idx, axis=0), mode="drop")
    send_eid = send_eid.at[dest_c, slot].set(local_eid, mode="drop")

    recv_x = jax.lax.all_to_all(send_x, axis, 0, 0, tiled=False)
    recv_eid = jax.lax.all_to_all(send_eid, axis, 0, 0, tiled=False)

    # local expert compute over [S*C, D], grouped by local expert id
    # (dummy id e_local collects padding; its output is discarded)
    rx = recv_x.reshape(ep * capacity, d)
    reid = recv_eid.reshape(ep * capacity)
    order = jnp.argsort(reid, stable=True)
    rx_sorted = jnp.take(rx, order, axis=0)
    group_sizes = jnp.bincount(reid, length=e_local + 1).astype(jnp.int32)

    glu = glu_for(act)

    def _fit(v, cands):
        for t in cands:
            if v % t == 0:
                return t
        return v

    m_rows = ep * capacity

    def expert_mm(lhs, name):
        w = dense_experts[name]                            # [E_l, F, D]
        # pad a zero dummy expert for the padding group
        wz = jnp.concatenate(
            [w, jnp.zeros_like(w[:1])], axis=0)
        from jax.experimental.pallas.ops.tpu.megablox import gmm

        tiling = (_fit(m_rows, (512, 256, 128, 64, 32, 16, 8)),
                  _fit(wz.shape[2], (512, 256, 128)),
                  _fit(wz.shape[1], (512, 256, 128)))
        return gmm(lhs, wz, group_sizes=group_sizes,
                   preferred_element_type=jnp.float32,
                   transpose_rhs=True, tiling=tiling,
                   interpret=jax.default_backend() != "tpu")

    e = expert_mm(rx_sorted, "gate").astype(x.dtype)
    g = expert_mm(rx_sorted, "up").astype(x.dtype)
    h = glu(e, g)
    y_sorted = expert_mm(h, "down").astype(x.dtype)

    inv = jnp.argsort(order, stable=True)
    y_slots = jnp.take(y_sorted, inv, axis=0).reshape(ep, capacity, d)

    back = jax.lax.all_to_all(y_slots, axis, 0, 0, tiled=False)
    # gather each assignment's output from its (dest, slot) bucket;
    # dropped assignments (clipped indices) are masked to zero
    out_k = back[jnp.clip(dest_c, 0, ep - 1),
                 jnp.clip(slot, 0, capacity - 1)]           # [N_l*k, D]
    out_k = jnp.where(keep[:, None], out_k, 0.0)
    w_flat = weights.reshape(-1).astype(jnp.float32)
    y = jnp.zeros((n_l, d), jnp.float32)
    y = y.at[token_idx].add(out_k.astype(jnp.float32) * w_flat[:, None])
    return y.astype(x.dtype)


def expert_parallel_moe(mesh: Mesh, axis: str = "ep", *,
                        num_experts_per_tok: int, act: str = "silu",
                        norm_topk_prob: bool = False,
                        capacity_factor: float = 2.0,
                        routing: str = "softmax_topk",
                        routing_params=None):
    """Build a jitted shard_mapped EP MoE layer.

    Takes global x [N, D] (tokens sharded over `axis`), router_logits
    [N, E], and dense expert weights {"gate","up","down"} [E, F, D]
    (expert dim sharded over `axis`). Returns [N, D]."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    ep = mesh.shape[axis]

    def fn(x, router_logits, experts):
        n = x.shape[0]
        e = router_logits.shape[-1]
        assert e % ep == 0 and n % ep == 0
        n_l = n // ep
        capacity = max(
            int(n_l * num_experts_per_tok * capacity_factor / ep), 8)
        body = functools.partial(
            _ep_body, axis=axis, ep=ep,
            num_experts_per_tok=num_experts_per_tok, act=act,
            norm_topk_prob=norm_topk_prob, capacity=capacity,
            routing=routing, routing_params=routing_params)
        try:
            # Pallas calls (gmm) inside shard_map need replication
            # checking off
            mapped = shard_map(
                body, mesh=mesh,
                in_specs=(P(axis, None), P(axis, None),
                          {k: P(axis, None, None) for k in experts}),
                out_specs=P(axis, None), check_vma=False)
        except TypeError:  # older jax spells it check_rep
            mapped = shard_map(
                body, mesh=mesh,
                in_specs=(P(axis, None), P(axis, None),
                          {k: P(axis, None, None) for k in experts}),
                out_specs=P(axis, None), check_rep=False)
        return mapped(x, router_logits, experts)

    return jax.jit(fn)
