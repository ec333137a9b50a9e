"""Fused NF4 dequant-inside-grouped-matmul (MoE QLoRA hot path).

Replaces dequantize-then-``gmm`` for stacked per-expert NF4 weights
(reference: unsloth/kernels/moe/ fuses token permutation into its Triton
grouped GEMM; its 4-bit MoE path still dequantizes via bnb first — here
the packed uint8 expert weights stream HBM -> VMEM and are decoded in VMEM
right before the MXU, so expert weights cost ~0.56 B/param of HBM traffic
per use and the dense [E, N, K] stack never exists in HBM).

Structure follows megablox ``gmm`` (jax.experimental.pallas.ops.tpu.
megablox) — group metadata maps each m-tile to its expert, partial tiles
are revisited with store masks — with two changes:

  * The rhs block is packed uint8 + per-tile absmax slabs. Split-half
    packing pairs each byte tile with BOTH halves of the lhs: the hi
    nibbles of packed tile k are the weights for lhs[:, k*tk : (k+1)*tk]
    and the lo nibbles for lhs[:, half + k*tk : ...]. Each grid step
    therefore decodes the SAME byte tile twice and issues two MXU dots —
    every fetched byte is fully consumed, and all block shapes stay
    lane-legal even for non-128-divisible contraction dims (gpt-oss
    2880): the lhs is passed as two [m, half] arrays whose tiles are
    either 128-aligned or the full half.
  * A custom VJP: dx runs a mirrored grouped kernel contracting the
    OTHER (output) dim of the packed weight, producing the two dx halves
    as two outputs; dW is zero (QLoRA frozen base).

Shapes: lhs [m, K], weights NF4Stacked [E, N, K] (out-major, like our
dense expert layout with transpose_rhs=True), group_sizes [E] summing to
m. N and m are padded internally; K/2 must be divisible by the NF4 block
size (quantize_params picks block 32 for dims like 2880).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.pallas.ops.tpu.megablox.gmm import make_group_metadata

from ..utils import env
from .nf4 import NF4Stacked
from .qlora_matmul import (_dequant_tile, _expansion_matrix, _interpret,
                           _round_up)


def _pick_tile(half: int, cap: int, bs: int) -> int:
    """Largest divisor of `half` that is <= cap, a multiple of bs and
    128-divisible — or `half` itself (full-dim blocks are always legal)."""
    step = max(bs, 128)
    for t in range(min(cap, half) // step * step, step - 1, -step):
        if half % t == 0 and t % bs == 0 and t % 128 == 0:
            return t
    return half


def _absmax_tiles(q: NF4Stacked, n_pad: int, tk: int):
    """Two per-tile absmax slabs [E, n_hi, tk//bs, N_pad] (fp32), one per
    nibble half (quant blocks are row-major along the logical K dim).
    The tiny tk//bs axis sits in the SUBLANE dim: a trailing tk//bs
    layout pads 8-16x under (8,128) tiling (~0.5 GB per gpt-oss expert
    stack); this layout has zero padding (see qlora_matmul._fwd_pallas,
    where the same trailing-dim-8 slab OOMed the 8K headline bench)."""
    e, n, k = q.shape
    bs = q.block_size
    half = k // 2
    am = q.absmax.astype(jnp.float32).reshape(e, n, k // bs)
    if n_pad != n:
        am = jnp.pad(am, ((0, 0), (0, n_pad - n), (0, 0)))
    hb = half // bs
    n_hi = half // tk

    def arrange(a):
        return a.reshape(e, n_pad, n_hi, tk // bs).transpose(0, 2, 3, 1)

    return arrange(am[..., :hb]), arrange(am[..., hb:])


# ---------------------------------------------------------------------------
# Forward: out[m, N] = lhs[m, K] @ W_g[N, K]^T  (per group g)
# ---------------------------------------------------------------------------

def _fwd_kernel(group_metadata, group_offset, xh_ref, xl_ref, pk_ref,
                amh_ref, aml_ref, e_ref, b_ref, out_ref, acc_ref, *,
                block_size: int, tm: int, tn: int, out_dtype):
    group_offsets, group_ids, m_tile_ids = group_metadata
    del group_offset
    grid_id = pl.program_id(1)
    k_i = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k_i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pk = pk_ref[...]
    w_hi = _dequant_tile(pk, amh_ref[0], e_ref[...], use_hi=True,
                         am_transposed=True)           # [tn, tk] fp32
    w_lo = _dequant_tile(pk, aml_ref[0], e_ref[...], use_hi=False,
                         am_transposed=True)
    xh = xh_ref[...]
    xl = xl_ref[...]
    acc_ref[...] += jax.lax.dot_general(
        xh, w_hi.astype(xh.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot_general(
        xl, w_lo.astype(xl.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k_i == n_k - 1)
    def _():
        group_id = group_ids[grid_id]
        start = group_offsets[group_id]
        end = group_offsets[group_id + 1]
        row = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0) \
            + m_tile_ids[grid_id] * tm
        mask = (row >= start) & (row < end)
        # per-expert bias folded into the store (saves the [m, N]
        # row-gather + add the caller would otherwise do — at MoE batch
        # sizes those gathers cost as much as an expert matmul)
        out_ref[...] = jax.lax.select(
            mask, acc_ref[...] + b_ref[...],
            out_ref[...].astype(jnp.float32)).astype(out_dtype)


# ---------------------------------------------------------------------------
# Backward (dx): dx[m, K] = g[m, N] @ W_g[N, K]  (per group g)
# ---------------------------------------------------------------------------

def _bwd_kernel(group_metadata, group_offset, g_ref, pk_ref, amh_ref,
                aml_ref, e_ref, oh_ref, ol_ref, acch_ref, accl_ref, *,
                block_size: int, tm: int, tj: int, out_dtype):
    group_offsets, group_ids, m_tile_ids = group_metadata
    del group_offset
    grid_id = pl.program_id(1)
    k_i = pl.program_id(2)      # contraction tile over N
    n_k = pl.num_programs(2)

    @pl.when(k_i == 0)
    def _():
        acch_ref[...] = jnp.zeros_like(acch_ref)
        accl_ref[...] = jnp.zeros_like(accl_ref)

    pk = pk_ref[...]
    w_hi = _dequant_tile(pk, amh_ref[0], e_ref[...], use_hi=True,
                         am_transposed=True)           # [tkn, tj] fp32
    w_lo = _dequant_tile(pk, aml_ref[0], e_ref[...], use_hi=False,
                         am_transposed=True)
    g = g_ref[...]                                     # [tm, tkn]
    acch_ref[...] += jax.lax.dot_general(
        g, w_hi.astype(g.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    accl_ref[...] += jax.lax.dot_general(
        g, w_lo.astype(g.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k_i == n_k - 1)
    def _():
        group_id = group_ids[grid_id]
        start = group_offsets[group_id]
        end = group_offsets[group_id + 1]
        row = jax.lax.broadcasted_iota(jnp.int32, (tm, tj), 0) \
            + m_tile_ids[grid_id] * tm
        mask = (row >= start) & (row < end)
        oh_ref[...] = jax.lax.select(
            mask, acch_ref[...],
            oh_ref[...].astype(jnp.float32)).astype(out_dtype)
        ol_ref[...] = jax.lax.select(
            mask, accl_ref[...],
            ol_ref[...].astype(jnp.float32)).astype(out_dtype)


def _prep(lhs, q: NF4Stacked, group_sizes, tm_cap=512):
    e, n, k = q.shape
    m = lhs.shape[0]
    tm = min(tm_cap, _round_up(m, 8))
    m_pad = _round_up(m, tm)
    if m_pad != m:
        lhs = jnp.pad(lhs, ((0, m_pad - m), (0, 0)))
        group_sizes = group_sizes.at[e - 1].add(m_pad - m)
    n_pad = _round_up(n, 128)
    meta, num_tiles = make_group_metadata(
        group_sizes=group_sizes, m=m_pad, tm=tm,
        start_group=jnp.zeros((), jnp.int32), num_nonzero_groups=e,
        visit_empty_groups=False)
    return lhs, group_sizes, m, m_pad, tm, n_pad, meta, num_tiles


def _pad_n(arr, n, n_pad, axis):
    if n_pad == n:
        return arr
    pads = [(0, 0)] * arr.ndim
    pads[axis] = (0, n_pad - n)
    return jnp.pad(arr, pads)


def _nf4_gmm_fwd_impl(lhs, q: NF4Stacked, group_sizes, bias=None,
                      interpret=None):
    e, n, k = q.shape
    bs = q.block_size
    half = k // 2
    lhs, gs, m, m_pad, tm, n_pad, meta, num_tiles = _prep(lhs, q,
                                                          group_sizes)
    tk = _pick_tile(half, 512, bs)
    n_hi = half // tk
    tn = 128
    x_hi, x_lo = lhs[:, :half], lhs[:, half:]
    packed = _pad_n(q.packed, n, n_pad, axis=1)
    am_hi, am_lo = _absmax_tiles(q, n_pad, tk)
    if bias is None:
        b_pad = jnp.zeros((e, 1, n_pad), jnp.float32)
    else:
        b_pad = _pad_n(bias.astype(jnp.float32), n, n_pad,
                       axis=1)[:, None, :]

    def x_idx(n_i, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[2][grid_id], k_i

    def pk_idx(n_i, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[1][grid_id], n_i, k_i

    def am_idx(n_i, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[1][grid_id], k_i, 0, n_i

    def e_idx(n_i, grid_id, k_i, group_metadata, group_offset):
        return 0, 0

    def b_idx(n_i, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[1][grid_id], 0, n_i

    def out_idx(n_i, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[2][grid_id], n_i

    kernel = functools.partial(_fwd_kernel, block_size=bs, tm=tm, tn=tn,
                               out_dtype=lhs.dtype)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), lhs.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            in_specs=[
                pl.BlockSpec((tm, tk), x_idx),
                pl.BlockSpec((tm, tk), x_idx),
                pl.BlockSpec((None, tn, tk), pk_idx),
                pl.BlockSpec((None, 1, tk // bs, tn), am_idx),
                pl.BlockSpec((None, 1, tk // bs, tn), am_idx),
                pl.BlockSpec((tk // bs, tk), e_idx),
                pl.BlockSpec((None, 1, tn), b_idx),
            ],
            out_specs=pl.BlockSpec((tm, tn), out_idx),
            grid=(n_pad // tn, num_tiles, n_hi),
            scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k,
            bytes_accessed=m_pad * k * 2 + e * n * half
            + m_pad * n_pad * 2,
            transcendentals=0),
        interpret=_interpret() if interpret is None else interpret,
    )(meta, jnp.zeros((1,), jnp.int32), x_hi, x_lo, packed, am_hi, am_lo,
      _expansion_matrix(tk // bs, tk), b_pad)
    return out[:m, :n]


def _nf4_gmm_bwd_impl(g, q: NF4Stacked, group_sizes, interpret=None):
    e, n, k = q.shape
    bs = q.block_size
    half = k // 2
    # tm 256 (not 512): the bwd holds TWO [tm, tj] fp32 accumulators plus
    # two output blocks in VMEM — tm=512 with tj=1440 (gpt-oss) overflows
    # the 16 MB scoped VMEM by ~600 KB.
    g2, gs, m, m_pad, tm, n_pad, meta, num_tiles = _prep(g, q, group_sizes,
                                                         tm_cap=256)
    g2 = _pad_n(g2, n, n_pad, axis=1)
    tj = _pick_tile(half, 512, bs)      # output tiles over each K half
    n_j = half // tj
    tkn = 128                           # contraction tiles over N
    packed = _pad_n(q.packed, n, n_pad, axis=1)
    am_hi, am_lo = _absmax_tiles(q, n_pad, tj)

    def g_idx(j, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[2][grid_id], k_i

    def pk_idx(j, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[1][grid_id], k_i, j

    def am_idx(j, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[1][grid_id], j, 0, k_i

    def e_idx(j, grid_id, k_i, group_metadata, group_offset):
        return 0, 0

    def out_idx(j, grid_id, k_i, group_metadata, group_offset):
        return group_metadata[2][grid_id], j

    kernel = functools.partial(_bwd_kernel, block_size=bs, tm=tm, tj=tj,
                               out_dtype=g.dtype)
    out_hi, out_lo = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((m_pad, half), g.dtype),
                   jax.ShapeDtypeStruct((m_pad, half), g.dtype)],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            in_specs=[
                pl.BlockSpec((tm, tkn), g_idx),
                pl.BlockSpec((None, tkn, tj), pk_idx),
                pl.BlockSpec((None, 1, tj // bs, tkn), am_idx),
                pl.BlockSpec((None, 1, tj // bs, tkn), am_idx),
                pl.BlockSpec((tj // bs, tj), e_idx),
            ],
            out_specs=[pl.BlockSpec((tm, tj), out_idx),
                       pl.BlockSpec((tm, tj), out_idx)],
            grid=(n_j, num_tiles, n_pad // tkn),
            scratch_shapes=[pltpu.VMEM((tm, tj), jnp.float32),
                            pltpu.VMEM((tm, tj), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k,
            bytes_accessed=m_pad * n_pad * 2 + e * n * half
            + m_pad * k * 2,
            transcendentals=0),
        interpret=_interpret() if interpret is None else interpret,
    )(meta, jnp.zeros((1,), jnp.int32), g2, packed, am_hi, am_lo,
      _expansion_matrix(tj // bs, tj))
    return jnp.concatenate([out_hi, out_lo], axis=1)[:m]


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _nf4_gmm_p(lhs, q: NF4Stacked, group_sizes, bias):
    return _nf4_gmm_fwd_impl(lhs, q, group_sizes, bias)


def _vjp_fwd(lhs, q, group_sizes, bias):
    return _nf4_gmm_fwd_impl(lhs, q, group_sizes, bias), (q, group_sizes)


def _vjp_bwd(res, g):
    q, group_sizes = res
    dx = _nf4_gmm_bwd_impl(g, q, group_sizes)
    dq = jax.tree_util.tree_map(jnp.zeros_like, q)
    return (dx, dq, np.zeros(group_sizes.shape, jax.dtypes.float0),
            jnp.zeros((q.shape[0], q.shape[1]), jnp.float32))


_nf4_gmm_p.defvjp(_vjp_fwd, _vjp_bwd)


def nf4_gmm(lhs, q: NF4Stacked, group_sizes, bias=None):
    """Grouped lhs[rows of group g] @ W_g^T (+ bias[g]) with W
    NF4Stacked [E, N, K]; the dense expert stack never exists in HBM and
    the optional per-expert bias [E, N] is added in the kernel's store
    epilogue. Gradient flows to lhs only (frozen QLoRA base: dW = 0 and
    dbias = 0 by construction)."""
    if bias is None:
        e, n, _ = q.shape
        bias = jnp.zeros((e, n), jnp.float32)
    return _nf4_gmm_p(lhs, q, group_sizes, bias)


def nf4_gmm_ref(lhs, q: NF4Stacked, group_sizes):
    """Oracle: dequantize + per-group dense matmul."""
    from .nf4 import dequantize_nf4_stacked

    w = dequantize_nf4_stacked(q, jnp.float32)
    e, n, k = q.shape
    ends = jnp.cumsum(group_sizes)
    starts = ends - group_sizes
    row = jnp.arange(lhs.shape[0])
    out = jnp.zeros((lhs.shape[0], n), jnp.float32)
    for g in range(e):
        mask = (row >= starts[g]) & (row < ends[g])
        y = lhs.astype(jnp.float32) @ w[g].T
        out = jnp.where(mask[:, None], y, out)
    return out.astype(lhs.dtype)


def use_nf4_gmm(q) -> bool:
    """Quant blocks must align to the split-half boundary (in/2 % bs ==
    0 — quantize_params picks bs=32 for dims like gpt-oss's 2880)."""
    return (isinstance(q, NF4Stacked)
            and not env.disable_pallas()
            and not env.env_flag("UNSLOTH_DISABLE_FUSED_NF4")
            and jax.default_backend() == "tpu"
            and q.shape[2] % 2 == 0
            and (q.shape[2] // 2) % q.block_size == 0)
