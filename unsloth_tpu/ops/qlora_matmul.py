"""Fused NF4 dequant-inside-matmul Pallas kernels (the QLoRA hot path).

Replaces the reference's bitsandbytes CUDA bridge (reference:
kernels/utils.py:260-284 ctypes into libbitsandbytes's
``cdequantize_blockwise_*_nf4`` + ``matmul_lora`` :1128-1170, which
dequantizes W to a dense buffer and then matmuls). Here the packed uint8
weight streams HBM -> VMEM tile by tile and is decoded to bf16 *in VMEM*
immediately before hitting the MXU — the dense weight never exists in HBM,
so each use of a weight costs ~0.56 bytes/param of HBM traffic instead of
2 (the XLA fallback materializes the dequantized weight first).

Layout: split-half packing (see ops/nf4.py) — a logical column tile lives
entirely in hi or lo nibbles, so each grid step reads one byte tile and one
static nibble side. The NF4 code lookup is a 16-way select chain (VPU);
Mosaic has no small-table gather.

Two kernels, one per contraction side:
  * ``nf4_matmul(x, q)``      : y  = x @ W^T   (contract over  in) — forward
  * ``nf4_matmul_t(g, q)``    : dx = g @ W     (contract over out) — backward
``nf4_matmul`` carries a custom VJP wiring the two together (W is frozen —
no dW, matching QLoRA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import env
from .nf4 import NF4_CODE, NF4Tensor, _decode_absmax, dequantize_nf4


def _decode_nibbles(nib):
    """16-way select chain: nibble index [*, *] int -> NF4 value fp32."""
    val = jnp.full(nib.shape, NF4_CODE[0], jnp.float32)
    for i in range(1, 16):
        val = jnp.where(nib == i, NF4_CODE[i], val)
    return val


def _dequant_tile(pk, am, *, use_hi, block_size):
    """pk: [rows, cols] uint8 byte tile; am: [rows, cols//block] fp32.
    use_hi: traced bool — whether this tile sits in the hi-nibble half.
    Scale upsampling is a static select chain over the few scale columns:
    Mosaic can't reshape across the lane dimension and pltpu.repeat has
    tile (not np.repeat) semantics, so everything stays 2-D."""
    pk32 = pk.astype(jnp.int32)  # Mosaic has no 8-bit vector shifts
    nib = jnp.where(use_hi, pk32 >> 4, pk32 & 0xF)
    val = _decode_nibbles(nib)
    nb = pk.shape[1] // block_size
    col_block = jax.lax.broadcasted_iota(jnp.int32, pk.shape, 1) // block_size
    am_up = am[:, 0:1]
    for b in range(1, nb):
        am_up = jnp.where(col_block == b, am[:, b:b + 1], am_up)
    return val * am_up


# ---------------------------------------------------------------------------
# Kernel A: y[m, out] = x[m, in] @ W[out, in]^T
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, pk_ref, am_ref, o_ref, acc_ref,
                *, n_hi_tiles: int, block_size: int, out_dtype):
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # am_ref block: [1, bn, bk//bs] from the per-tile absmax layout
    # (pre-gathered outside the kernel — Mosaic supports neither tiny
    # trailing block tiles nor dynamic lane-dim slices).
    am = am_ref[0]
    w = _dequant_tile(pk_ref[:], am, use_hi=k < n_hi_tiles,
                      block_size=block_size)          # [bn, bk] fp32
    x = x_ref[:]                                      # [bm, bk]
    acc_ref[:] += jax.lax.dot_general(
        x, w.astype(x.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _fwd_pallas(x2d, q: NF4Tensor, *, bm=2048, bn=512, bk=512,
                interpret=None):
    m, in_f = x2d.shape
    out_f = q.shape[0]
    bs = q.block_size
    half = in_f // 2
    bk = min(bk, half)
    assert half % bk == 0 and bk % bs == 0
    bm = min(bm, _round_up(m, 8))
    bn = min(bn, out_f)
    assert out_f % bn == 0

    m_pad = _round_up(m, bm)
    x_p = jnp.pad(x2d, ((0, m_pad - m), (0, 0))) if m_pad != m else x2d

    n_hi = half // bk
    n_k = 2 * n_hi
    # Per-tile absmax layout [n_k, out, bk//bs]: tile k's scales are a
    # full trailing slab (legal TPU block: trailing dim == array dim).
    # Logical col0 of tile k is k*bk for hi AND lo tiles (halves are
    # contiguous in logical order), so this is a plain reshape+transpose.
    absmax = _decode_absmax(q).reshape(out_f, n_k, bk // bs)
    absmax = absmax.transpose(1, 0, 2)

    grid = (m_pad // bm, out_f // bn, n_k)

    def pk_index(i, j, k):
        return (j, jnp.where(k < n_hi, k, k - n_hi))

    kernel = functools.partial(
        _fwd_kernel, n_hi_tiles=n_hi, block_size=bs, out_dtype=x2d.dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk),
                         lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), pk_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, bk // bs), lambda i, j, k: (k, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, out_f), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * out_f * in_f,
            bytes_accessed=m_pad * in_f * 2 + out_f * in_f // 2
            + m_pad * out_f * 2,
            transcendentals=0),
        interpret=_interpret() if interpret is None else interpret,
    )(x_p, q.packed, absmax)
    return out[:m]


# ---------------------------------------------------------------------------
# Kernel B: dx[m, in] = g[m, out] @ W[out, in]
# ---------------------------------------------------------------------------

def _bwd_kernel(g_ref, pk_ref, am_ref, o_ref, acc_ref,
                *, n_hi_tiles: int, block_size: int, out_dtype):
    j = pl.program_id(1)   # in-dim tile (nibble side depends on this)
    k = pl.program_id(2)   # out-dim tile (contraction)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    am = am_ref[0]                                    # [bk_out, bn//bs]
    w = _dequant_tile(pk_ref[:], am, use_hi=j < n_hi_tiles,
                      block_size=block_size)          # [bk_out, bn_in]
    g = g_ref[:]                                      # [bm, bk_out]
    acc_ref[:] += jax.lax.dot_general(
        g, w.astype(g.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _bwd_pallas(g2d, q: NF4Tensor, *, bm=2048, bn=512, bk=512,
                interpret=None):
    m, out_f = g2d.shape
    in_f = q.shape[1]
    bs = q.block_size
    half = in_f // 2
    bn = min(bn, half)
    assert half % bn == 0 and bn % bs == 0
    bm = min(bm, _round_up(m, 8))
    bk = min(bk, out_f)
    assert out_f % bk == 0

    m_pad = _round_up(m, bm)
    g_p = jnp.pad(g2d, ((0, m_pad - m), (0, 0))) if m_pad != m else g2d

    n_hi = half // bn
    n_j = 2 * n_hi
    # Per-tile absmax layout [n_j, out, bn//bs] (see _fwd_pallas).
    absmax = _decode_absmax(q).reshape(out_f, n_j, bn // bs)
    absmax = absmax.transpose(1, 0, 2)

    grid = (m_pad // bm, n_j, out_f // bk)

    def pk_index(i, j, k):
        return (k, jnp.where(j < n_hi, j, j - n_hi))

    kernel = functools.partial(
        _bwd_kernel, n_hi_tiles=n_hi, block_size=bs, out_dtype=g2d.dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), pk_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, bn // bs), lambda i, j, k: (j, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, in_f), g2d.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * out_f * in_f,
            bytes_accessed=m_pad * out_f * 2 + out_f * in_f // 2
            + m_pad * in_f * 2,
            transcendentals=0),
        interpret=_interpret() if interpret is None else interpret,
    )(g_p, q.packed, absmax)
    return out[:m]


def _round_up(x, m):
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _shapes_ok(q: NF4Tensor, bk_min=128) -> bool:
    out_f, in_f = q.shape
    half = in_f // 2
    return (in_f % 2 == 0 and half % q.block_size == 0
            and half % bk_min == 0 and out_f % 256 == 0)


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------

@jax.custom_vjp
def nf4_matmul(x, q: NF4Tensor):
    """x @ W^T with W NF4-packed; dense W never materialized in HBM.
    x: [..., in]; returns [..., out]. Gradient flows to x only (W frozen)."""
    return _nf4_matmul_fwd_impl(x, q)


def _nf4_matmul_fwd_impl(x, q):
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    y = _fwd_pallas(x2d, q)
    return y.reshape(*lead, q.shape[0])


def _nf4_vjp_fwd(x, q):
    return _nf4_matmul_fwd_impl(x, q), (q, x.shape)


def _nf4_vjp_bwd(res, g):
    q, x_shape = res
    g2d = g.reshape(-1, q.shape[0])
    dx = _bwd_pallas(g2d, q)
    zeros = jax.tree_util.tree_map(
        lambda leaf: jnp.zeros_like(leaf) if leaf is not None else None, q)
    return dx.reshape(x_shape), zeros


nf4_matmul.defvjp(_nf4_vjp_fwd, _nf4_vjp_bwd)


def use_fused_nf4(q) -> bool:
    return (isinstance(q, NF4Tensor)
            and not env.disable_pallas()
            and not env.env_flag("UNSLOTH_DISABLE_FUSED_NF4")
            and jax.default_backend() == "tpu"
            and _shapes_ok(q))
