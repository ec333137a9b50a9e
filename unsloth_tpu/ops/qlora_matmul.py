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
static nibble side.

Performance design (the dequant must not stall the MXU — measured r2 at
53% of bf16 peak, r3 target >=75%):
  * Nibble decode is a shared-compare select tree (~24 VPU ops/elt): one
    split on bit3 plus SEVEN m>=i compares SHARED between the hi/lo
    half-codebook select chains (Mosaic has no small-table gather, so some
    select chain is unavoidable; sharing the compares beats the naive
    15-compare/15-select chain).
  * Per-block absmax is upsampled to per-column scales with a tiny 0/1
    expansion MATMUL ``am[bn, nb] @ E[nb, bk]`` on the MXU instead of a
    per-element select chain — MXU overhead is 128/bm (<2% at bm>=8192)
    and the VPU cost drops to the single final multiply.
  * The dequantized tile is reused across a LARGE m-tile (``bm``): the
    VPU decode cost per weight element is amortized over ``bm`` MXU MACs,
    so VPU/MXU time ratio ~= decode_ops / 40 / bm * 104e3. bm defaults
    high; ``bn`` is sized to bound re-streaming of x (x HBM traffic is
    m*in*2*ceil(out/bn) bytes).
Tiles are env-tunable (UNSLOTH_NF4_BM/BN/BK) for hardware sweeps.

Two kernels, one per contraction side:
  * ``nf4_matmul(x, q)``      : y  = x @ W^T   (contract over  in) — forward
  * ``nf4_matmul_t(g, q)``    : dx = g @ W     (contract over out) — backward
``nf4_matmul`` carries a custom VJP wiring the two together (W is frozen —
no dW, matching QLoRA).
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import env
from .nf4 import NF4_CODE, NF4Tensor, _decode_absmax, dequantize_nf4


def _env_tile(name, default):
    return int(os.environ.get(name, default))


def _decode_nibbles(nib):
    """Nibble index [*, *] int32 -> NF4 value fp32.

    Select tree with shared compares: split on bit3, then the two 8-entry
    half-codebook chains share one set of seven ``m >= i`` compares
    (1 + 1 + 7 compares + 15 selects ~= 24 VPU ops vs 30 for the naive
    16-way chain)."""
    is_hi = nib >= 8
    m = nib & 7
    hi_v = jnp.full(nib.shape, NF4_CODE[8], jnp.float32)
    lo_v = jnp.full(nib.shape, NF4_CODE[0], jnp.float32)
    for i in range(1, 8):
        c = m >= i
        hi_v = jnp.where(c, NF4_CODE[8 + i], hi_v)
        lo_v = jnp.where(c, NF4_CODE[i], lo_v)
    return jnp.where(is_hi, hi_v, lo_v)


def _scale_mode():
    return os.environ.get("UNSLOTH_NF4_SCALE", "matmul")


def _decode_mode():
    return os.environ.get("UNSLOTH_NF4_DECODE", "tree")


def _dequant_tile(pk, am, e_mat=None, *, use_hi, block_size=None,
                  am_transposed=False):
    """pk: [rows, cols] uint8 byte tile; am: [rows, cols//bs] fp32 scales
    (or [cols//bs, rows] when ``am_transposed`` — the HBM layout that
    keeps the scale slab's trailing dim 128-aligned, see _fwd_pallas);
    e_mat: [cols//bs, cols] fp32 0/1 block-expansion matrix (None -> the
    per-element select-chain upsample; callers like nf4_gmm that don't
    pre-build E use that path, passing block_size instead).
    use_hi: static or traced bool — which nibble half this tile is.

    The absmax upsample runs on the MXU (``am @ E``): exact (0/1 matrix in
    fp32) and removes the per-element scale select chain from the VPU."""
    pk32 = pk.astype(jnp.int32)  # Mosaic has no 8-bit vector shifts
    if isinstance(use_hi, bool):
        nib = (pk32 >> 4) if use_hi else (pk32 & 0xF)
    else:
        nib = jax.lax.cond(use_hi, lambda p: p >> 4, lambda p: p & 0xF,
                           pk32)
    dmode = _decode_mode()
    if dmode == "none":          # diagnostic: skip decode (wrong results)
        val = nib.astype(jnp.float32)
    else:
        val = _decode_nibbles(nib)
    mode = _scale_mode() if e_mat is not None else "chain"
    if mode == "none":           # diagnostic: skip scaling (wrong results)
        return val
    if mode == "chain" and not am_transposed:  # per-element select chain
        bs = block_size or (pk.shape[1] // am.shape[1])
        nb = pk.shape[1] // bs
        col_block = jax.lax.broadcasted_iota(
            jnp.int32, pk.shape, 1) // bs
        am_up = am[:, 0:1]
        for b in range(1, nb):
            am_up = jnp.where(col_block == b, am[:, b:b + 1], am_up)
        return val * am_up
    if am_transposed:
        # [nb, rows] x [nb, cols] contracted on dim 0 -> [rows, cols];
        # (the chain diagnostic has no lane-safe transposed form, so
        # transposed callers always upsample on the MXU)
        am_up = jax.lax.dot_general(
            am, e_mat, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        am_up = jax.lax.dot_general(
            am, e_mat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return val * am_up


def _expansion_matrix(nb, cols):
    """[nb, cols] fp32 with E[b, c] = 1 iff c // (cols//nb) == b."""
    bs = cols // nb
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, cols), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, cols), 1)
    return (col // bs == row).astype(jnp.float32)


def _compiler_params(*buf_bytes):
    total = sum(buf_bytes)
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=min(int(total * 2.2) + (4 << 20), 128 << 20),
    )


# ---------------------------------------------------------------------------
# Kernel A: y[m, out] = x[m, in] @ W[out, in]^T
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, pk_ref, am_ref, e_ref, o_ref, acc_ref,
                *, n_hi_tiles: int, out_dtype):
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # am_ref block: [1, bk//bs, bn] — tile k of the rank-3 absmax slab
    # [n_k, bk//bs, out] (pre-arranged outside the kernel — Mosaic
    # supports neither tiny trailing block tiles nor dynamic lane-dim
    # slices; the scale axis sits in the SUBLANE dim so the HBM slab has
    # minimal tile padding, and the block spans the full sublane axis).
    w = _dequant_tile(pk_ref[:], am_ref[0], e_ref[:],
                      use_hi=k < n_hi_tiles,
                      am_transposed=True)              # [bn, bk] fp32
    x = x_ref[:]                                       # [bm, bk]
    acc_ref[:] += jax.lax.dot_general(
        x, w.astype(x.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _pick_tile(dim, pref, mult):
    """Largest divisor of ``dim`` that is <= pref and a multiple of mult."""
    t = min(pref, dim)
    t -= t % mult
    while t > mult and dim % t:
        t -= mult
    return max(t, mult)


def _fwd_pallas(x2d, q: NF4Tensor, *, bm=None, bn=None, bk=None,
                interpret=None):
    m, in_f = x2d.shape
    out_f = q.shape[0]
    bs = q.block_size
    half = in_f // 2
    bm = bm or _env_tile("UNSLOTH_NF4_BM", 8192)
    bn = bn or _env_tile("UNSLOTH_NF4_BN", 1024)
    bk = bk or _env_tile("UNSLOTH_NF4_BK", 512)
    bk = _pick_tile(half, bk, max(bs, 128))
    bn = _pick_tile(out_f, bn, 256)
    assert half % bk == 0 and bk % bs == 0 and out_f % bn == 0
    bm = min(bm, _round_up(m, 8))

    m_pad = _round_up(m, bm)
    x_p = jnp.pad(x2d, ((0, m_pad - m), (0, 0))) if m_pad != m else x2d

    n_hi = half // bk
    n_k = 2 * n_hi
    # Per-tile absmax layout [n_k, bk//bs, out] (leading axis = k tile,
    # scales in the SUBLANE dim): the old [n_k, out, bk//bs]
    # trailing-dim-8 layout padded 16x under (8,128) tiling and cost
    # ~52 MB of HLO temp PER WEIGHT at 8B scale (measured: the 8K
    # full-depth bench OOMed on it). Rank-3 with the block spanning the
    # FULL bk//bs axis (not a folded 2-D row-block) because Mosaic
    # requires the block's sublane dim to be 8-divisible OR equal to the
    # array dim — small models hit bk//bs < 8 (the folded layout failed
    # the flagship-mini entry() compile with block (4, 512) on (8, 512)).
    # Logical col0 of tile k is k*bk for hi AND lo tiles (halves are
    # contiguous in logical order), so this is a plain reshape+transpose.
    absmax = _decode_absmax(q).reshape(out_f, n_k, bk // bs)
    absmax = absmax.transpose(1, 2, 0)          # [n_k, bk//bs, out]
    e_mat = _expansion_matrix(bk // bs, bk)

    grid = (m_pad // bm, out_f // bn, n_k)

    def pk_index(i, j, k):
        return (j, jnp.where(k < n_hi, k, k - n_hi))

    kernel = functools.partial(
        _fwd_kernel, n_hi_tiles=n_hi, out_dtype=x2d.dtype)
    bufs = (2 * bm * bk * x2d.dtype.itemsize, 2 * bn * bk,
            bm * bn * 4, 2 * bm * bn * x2d.dtype.itemsize,
            2 * bn * bk * 4)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk),
                         lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), pk_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk // bs, bn), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // bs, bk), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, out_f), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=_compiler_params(*bufs),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * out_f * in_f,
            bytes_accessed=m_pad * in_f * 2 + out_f * in_f // 2
            + m_pad * out_f * 2,
            transcendentals=0),
        interpret=_interpret() if interpret is None else interpret,
    )(x_p, q.packed, absmax, e_mat)
    return out[:m]


# ---------------------------------------------------------------------------
# Kernel B: dx[m, in] = g[m, out] @ W[out, in]
# ---------------------------------------------------------------------------

def _bwd_kernel(g_ref, pk_ref, am_ref, e_ref, o_ref, acc_ref,
                *, n_hi_tiles: int, out_dtype):
    j = pl.program_id(1)   # in-dim tile (nibble side depends on this)
    k = pl.program_id(2)   # out-dim tile (contraction)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _dequant_tile(pk_ref[:], am_ref[0], e_ref[:],
                      use_hi=j < n_hi_tiles,
                      am_transposed=True)              # [bk_out, bn_in]
    g = g_ref[:]                                       # [bm, bk_out]
    acc_ref[:] += jax.lax.dot_general(
        g, w.astype(g.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _bwd_pallas(g2d, q: NF4Tensor, *, bm=None, bn=None, bk=None,
                interpret=None):
    m, out_f = g2d.shape
    in_f = q.shape[1]
    bs = q.block_size
    half = in_f // 2
    bm = bm or _env_tile("UNSLOTH_NF4_BM", 8192)
    bn = bn or _env_tile("UNSLOTH_NF4_BN", 1024)
    bk = bk or _env_tile("UNSLOTH_NF4_BK", 512)
    bn = _pick_tile(half, bn, max(bs, 128))
    bk = _pick_tile(out_f, bk, 256)
    assert half % bn == 0 and bn % bs == 0 and out_f % bk == 0
    bm = min(bm, _round_up(m, 8))

    m_pad = _round_up(m, bm)
    g_p = jnp.pad(g2d, ((0, m_pad - m), (0, 0))) if m_pad != m else g2d

    n_hi = half // bn
    n_j = 2 * n_hi
    # Per-tile absmax layout [n_j, bn//bs, out] (see _fwd_pallas: scale
    # axis in the sublane dim, rank-3 so the block spans the full
    # sublane axis even when bn//bs < 8).
    absmax = _decode_absmax(q).reshape(out_f, n_j, bn // bs)
    absmax = absmax.transpose(1, 2, 0)          # [n_j, bn//bs, out]
    e_mat = _expansion_matrix(bn // bs, bn)

    grid = (m_pad // bm, n_j, out_f // bk)

    def pk_index(i, j, k):
        return (k, jnp.where(j < n_hi, j, j - n_hi))

    kernel = functools.partial(
        _bwd_kernel, n_hi_tiles=n_hi, out_dtype=g2d.dtype)
    bufs = (2 * bm * bk * g2d.dtype.itemsize, 2 * bk * bn,
            bm * bn * 4, 2 * bm * bn * g2d.dtype.itemsize,
            2 * bk * bn * 4)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), pk_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn // bs, bk), lambda i, j, k: (j, 0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn // bs, bn), lambda i, j, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, in_f), g2d.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=_compiler_params(*bufs),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * out_f * in_f,
            bytes_accessed=m_pad * out_f * 2 + out_f * in_f // 2
            + m_pad * in_f * 2,
            transcendentals=0),
        interpret=_interpret() if interpret is None else interpret,
    )(g_p, q.packed, absmax, e_mat)
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


#: trace-time dispatch override set by the model layer (decoder.py's
#: UNSLOTH_NF4_FUSED=auto resolution): None = env default, "fused" /
#: "unfused" force a path. Deterministic given (param avals, cfg,
#: token count), so jax.checkpoint's aval-keyed trace cache stays
#: correct — unlike a bare env flag (CLAUDE.md remat-cache gotcha).
_NF4_MODE = None


@contextlib.contextmanager
def nf4_dispatch_mode(mode):
    """Force NF4 matmul dispatch for ops traced inside: "fused" (Pallas
    dequant-inside-matmul, the memory lever) or "unfused" (XLA
    dequantize+dot, measured ~6% faster when its HLO temps fit —
    bench_artifacts/r4/dense_gap.jsonl). None = no-op."""
    global _NF4_MODE
    if mode not in (None, "fused", "unfused"):
        raise ValueError(f"nf4_dispatch_mode: bad mode {mode!r}")
    prev = _NF4_MODE
    _NF4_MODE = mode
    try:
        yield
    finally:
        _NF4_MODE = prev


def current_nf4_mode():
    """The active trace-time dispatch override (None when no
    nf4_dispatch_mode context is open)."""
    return _NF4_MODE


def use_fused_nf4(q) -> bool:
    if _NF4_MODE == "unfused":
        return False
    return (isinstance(q, NF4Tensor)
            and not env.disable_pallas()
            and not env.env_flag("UNSLOTH_DISABLE_FUSED_NF4")
            and jax.default_backend() == "tpu"
            and _shapes_ok(q))
