"""Segment-block-sparse flash attention for packed sequences.

Real SFT rows are short (Alpaca-class data: ~100 tokens) so an 8K packed
row holds ~80 segments. A full causal flash kernel computes every
lower-triangle block — O(T^2) work — even though tokens only attend
within their segment, i.e. the useful work is O(sum_i len_i^2), ~10-80x
less. The reference gets this on GPU from flash-attn's varlen entry
point (reference: unsloth/kernels/flex_attention.py + HF FA2
`flash_attn_varlen_func` dispatch); the TPU-native form here is a
Pallas flash kernel whose kv-block range per q-block comes from
scalar-prefetched segment metadata:

  * each q block iq only visits kv blocks [kv_lo[b, iq] .. iq], where
    kv_lo is the block of the segment start of the block's first token;
  * the grid's kv dimension is statically bounded by the packer's
    declared max segment length (`bound` blocks), not by T/blk;
  * iterations past the needed range clamp their index maps to the
    previous block — Mosaic elides the re-fetch (same-index revisiting)
    and `pl.when` skips the compute, so skipped blocks cost ~nothing.

The backward follows the same structure: dq iterates the q-block's kv
range; dk/dv iterate each kv-block's q range [j .. q_hi[b, j]] (q_hi
from the segment end of the block's last token), accumulating over the
GQA group via an inner grid dimension.

Contract: every *real* segment must fit in `max_segment_len` tokens
(the packer's per-document cap, so it is a dataset-level static). The
padding tail (segment id 0 after the last real segment) may be longer;
outputs at pad positions are then attention over a *subset* of the pad
tokens — finite but unspecified — and their gradients are exactly zero
because nothing downstream reads pad positions (attention masks them
out of real segments, the loss ignores their labels).

Layouts mirror jax's bundled TPU flash kernel: q/k/v [B, H, T, D],
segment ids lane-replicated ([B, T, 128] for q, [B, 8, T] for kv), lse
lane-replicated [B, Hq, T, 128] f32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import env

NEG_INF = -1e30
#: lse sentinel for rows with no valid key (cannot happen for real rows —
#: every token matches its own segment id — but keeps exp(s - lse) == 0
#: instead of inf if it ever does).
EMPTY_LSE = 1e30

DEFAULT_BLOCK = 512


def segment_block_metadata(segment_ids: jnp.ndarray, block: int):
    """Per-block sparsity bounds from packed segment ids.

    segment_ids [B, T] int32, equal ids contiguous (what pack_sequences
    emits). Returns (kv_lo [B, nq] int32, q_hi [B, nk] int32):
    kv_lo[b, i] = block of the segment start of token i*block;
    q_hi[b, j] = block of the segment end of token (j+1)*block - 1.
    """
    b, t = segment_ids.shape
    idx = jnp.arange(t, dtype=jnp.int32)[None]
    seg = segment_ids
    change = jnp.concatenate(
        [jnp.ones((b, 1), bool), seg[:, 1:] != seg[:, :-1]], axis=1)
    start = jax.lax.cummax(jnp.where(change, idx, 0), axis=1)
    change_next = jnp.concatenate(
        [seg[:, 1:] != seg[:, :-1], jnp.ones((b, 1), bool)], axis=1)
    end = jax.lax.cummin(
        jnp.where(change_next, idx, t)[:, ::-1], axis=1)[:, ::-1]
    kv_lo = (start[:, ::block] // block).astype(jnp.int32)
    q_hi = (end[:, block - 1::block] // block).astype(jnp.int32)
    return kv_lo, q_hi


def _replicate_segments(segment_ids):
    """Lane/sublane-replicated segment-id layouts (bundled-kernel idiom:
    jax/experimental/pallas/ops/tpu/flash_attention.py uses the same
    [B, T, 128] / [B, 8, T] expansion for its in-kernel masks)."""
    b, t = segment_ids.shape
    seg = segment_ids.astype(jnp.int32)
    q_seg = jax.lax.broadcast_in_dim(seg, (b, t, 128), (0, 1))
    kv_seg = jax.lax.broadcast_in_dim(seg, (b, 8, t), (0, 2))
    return q_seg, kv_seg


def _mask(qseg_col, kseg_row, iq, j, blk, causal_needed):
    """[blk, blk] validity mask: segment equality + causal on the
    diagonal block."""
    m = qseg_col == kseg_row
    if causal_needed:
        rows = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
        m = m & ((j * blk + cols) <= (iq * blk + rows))
    return m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(kv_lo_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
                out_ref, lse_ref, acc, m_s, l_s, *, blk, n_kv):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)

    lo = kv_lo_ref[b, iq]
    j = jnp.minimum(lo + ik, iq)
    active = lo + ik <= iq

    @pl.when(active)
    def _compute():
        q = q_ref[0, 0]                               # [blk, D] (pre-scaled)
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [blk, blk]
        qcol = qseg_ref[0][:, :1]                      # [blk, 1]
        krow = kseg_ref[0][:1, :]                      # [1, blk]
        # the diagonal block needs the causal triangle; earlier blocks are
        # fully below the diagonal. j == iq only on the last active step,
        # but the compare is cheap — apply it unconditionally for one
        # trace (j < iq rows are all-true).
        mask = _mask(qcol, krow, iq, j, blk, causal_needed=True)
        rowmax = jnp.max(jnp.where(mask, s, NEG_INF), axis=-1,
                         keepdims=True)                # [blk, 1]
        m_new = jnp.maximum(m_s[:], rowmax)            # [blk, 128]
        alpha = jnp.exp(m_s[:] - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new[:, :1]), 0.0)
        l_s[:] = alpha * l_s[:] + jnp.sum(p, axis=-1, keepdims=True)
        m_s[:] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [blk, D]
        acc[:] = acc[:] * alpha[:, :1] + pv

    @pl.when(ik == n_kv - 1)
    def _finalize():
        l = l_s[:][:, :1]
        out = jnp.where(l > 0, acc[:] / jnp.where(l > 0, l, 1.0), 0.0)
        out_ref[0, 0] = out.astype(out_ref.dtype)
        lse_ref[0, 0] = jnp.where(
            l_s[:] > 0, m_s[:] + jnp.log(jnp.where(l_s[:] > 0, l_s[:], 1.0)),
            EMPTY_LSE)


def _fwd(q, k, v, q_seg, kv_seg, kv_lo, *, blk, n_kv, interpret):
    b, hq, t, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    nq = t // blk

    grid = (b, hq, nq, n_kv)

    def q_map(bi, h, iq, ik, kv_lo_ref):
        return (bi, h, iq, 0)

    def kv_map(bi, h, iq, ik, kv_lo_ref):
        return (bi, h // g, jnp.minimum(kv_lo_ref[bi, iq] + ik, iq), 0)

    def qseg_map(bi, h, iq, ik, kv_lo_ref):
        return (bi, iq, 0)

    def kseg_map(bi, h, iq, ik, kv_lo_ref):
        return (bi, 0, jnp.minimum(kv_lo_ref[bi, iq] + ik, iq))

    def out_map(bi, h, iq, ik, kv_lo_ref):
        return (bi, h, iq, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk, d), q_map),
            pl.BlockSpec((1, 1, blk, d), kv_map),
            pl.BlockSpec((1, 1, blk, d), kv_map),
            pl.BlockSpec((1, blk, 128), qseg_map),
            pl.BlockSpec((1, 8, blk), kseg_map),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, blk, d), out_map),
            pl.BlockSpec((1, 1, blk, 128), out_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, d), jnp.float32),
            pltpu.VMEM((blk, 128), jnp.float32),
            pltpu.VMEM((blk, 128), jnp.float32),
        ],
    )
    kernel = functools.partial(_fwd_kernel, blk=blk, n_kv=n_kv)
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, t, d), q.dtype),
            jax.ShapeDtypeStruct((b, hq, t, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(kv_lo, q, k, v, q_seg, kv_seg)
    return out, lse


# ---------------------------------------------------------------------------
# backward: dq
# ---------------------------------------------------------------------------

def _dq_kernel(kv_lo_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
               dout_ref, lse_ref, di_ref, dq_ref, acc, *, blk, n_kv):
    b = pl.program_id(0)
    iq = pl.program_id(2)
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    lo = kv_lo_ref[b, iq]
    j = jnp.minimum(lo + ik, iq)
    active = lo + ik <= iq

    @pl.when(active)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        qcol = qseg_ref[0][:, :1]
        krow = kseg_ref[0][:1, :]
        mask = _mask(qcol, krow, iq, j, blk, causal_needed=True)
        lse = lse_ref[0, 0][:, :1]                     # [blk, 1]
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dout = dout_ref[0, 0]
        dp = jax.lax.dot_general(
            dout, v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [blk, blk]
        di = di_ref[0, 0][:, :1]
        ds = p * (dp - di)
        acc[:] = acc[:] + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ik == n_kv - 1)
    def _finalize():
        dq_ref[0, 0] = acc[:].astype(dq_ref.dtype)


def _dq(q, k, v, q_seg, kv_seg, dout, lse, di, kv_lo, *, blk, n_kv,
        interpret):
    b, hq, t, d = q.shape
    g = hq // k.shape[1]
    nq = t // blk
    grid = (b, hq, nq, n_kv)

    def q_map(bi, h, iq, ik, s):
        return (bi, h, iq, 0)

    def kv_map(bi, h, iq, ik, s):
        return (bi, h // g, jnp.minimum(s[bi, iq] + ik, iq), 0)

    def qseg_map(bi, h, iq, ik, s):
        return (bi, iq, 0)

    def kseg_map(bi, h, iq, ik, s):
        return (bi, 0, jnp.minimum(s[bi, iq] + ik, iq))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk, d), q_map),
            pl.BlockSpec((1, 1, blk, d), kv_map),
            pl.BlockSpec((1, 1, blk, d), kv_map),
            pl.BlockSpec((1, blk, 128), qseg_map),
            pl.BlockSpec((1, 8, blk), kseg_map),
            pl.BlockSpec((1, 1, blk, d), q_map),
            pl.BlockSpec((1, 1, blk, 128), q_map),
            pl.BlockSpec((1, 1, blk, 128), q_map),
        ],
        out_specs=pl.BlockSpec((1, 1, blk, d), q_map),
        scratch_shapes=[pltpu.VMEM((blk, d), jnp.float32)],
    )
    kernel = functools.partial(_dq_kernel, blk=blk, n_kv=n_kv)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, t, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(kv_lo, q, k, v, q_seg, kv_seg, dout, lse, di)


# ---------------------------------------------------------------------------
# backward: dk, dv
# ---------------------------------------------------------------------------

def _dkv_kernel(q_hi_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
                dout_ref, lse_ref, di_ref, dk_ref, dv_ref,
                acc_dk, acc_dv, *, blk, n_q, g):
    b = pl.program_id(0)
    j = pl.program_id(2)
    gi = pl.program_id(3)
    iqr = pl.program_id(4)

    @pl.when((gi == 0) & (iqr == 0))
    def _init():
        acc_dk[:] = jnp.zeros_like(acc_dk)
        acc_dv[:] = jnp.zeros_like(acc_dv)

    hi = q_hi_ref[b, j]
    iq = jnp.minimum(j + iqr, hi)
    active = j + iqr <= hi

    @pl.when(active)
    def _compute():
        q = q_ref[0, 0]                                # [blk, D]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [blk_q, blk_k]
        qcol = qseg_ref[0][:, :1]
        krow = kseg_ref[0][:1, :]
        mask = _mask(qcol, krow, iq, j, blk, causal_needed=True)
        lse = lse_ref[0, 0][:, :1]
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dout = dout_ref[0, 0]
        # dv += p^T @ dout  (contract the q dim)
        acc_dv[:] = acc_dv[:] + jax.lax.dot_general(
            p.astype(dout.dtype), dout, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            dout, v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        di = di_ref[0, 0][:, :1]
        ds = p * (dp - di)
        # dk += ds^T @ q
        acc_dk[:] = acc_dk[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when((gi == g - 1) & (iqr == n_q - 1))
    def _finalize():
        dk_ref[0, 0] = acc_dk[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = acc_dv[:].astype(dv_ref.dtype)


def _dkv(q, k, v, q_seg, kv_seg, dout, lse, di, q_hi, *, blk, n_q,
         interpret):
    b, hq, t, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    nk = t // blk
    grid = (b, hkv, nk, g, n_q)

    def q_map(bi, hk, j, gi, iqr, s):
        return (bi, hk * g + gi, jnp.minimum(j + iqr, s[bi, j]), 0)

    def kv_map(bi, hk, j, gi, iqr, s):
        return (bi, hk, j, 0)

    def qseg_map(bi, hk, j, gi, iqr, s):
        return (bi, jnp.minimum(j + iqr, s[bi, j]), 0)

    def kseg_map(bi, hk, j, gi, iqr, s):
        return (bi, 0, j)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk, d), q_map),
            pl.BlockSpec((1, 1, blk, d), kv_map),
            pl.BlockSpec((1, 1, blk, d), kv_map),
            pl.BlockSpec((1, blk, 128), qseg_map),
            pl.BlockSpec((1, 8, blk), kseg_map),
            pl.BlockSpec((1, 1, blk, d), q_map),
            pl.BlockSpec((1, 1, blk, 128), q_map),
            pl.BlockSpec((1, 1, blk, 128), q_map),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, blk, d), kv_map),
            pl.BlockSpec((1, 1, blk, d), kv_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, d), jnp.float32),
            pltpu.VMEM((blk, d), jnp.float32),
        ],
    )
    kernel = functools.partial(_dkv_kernel, blk=blk, n_q=n_q, g=g)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, t, d), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, t, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary", "arbitrary")),
        interpret=interpret,
    )(q_hi, q, k, v, q_seg, kv_seg, dout, lse, di)


# ---------------------------------------------------------------------------
# public entry (custom_vjp), model layout [B, T, H, D]
# ---------------------------------------------------------------------------

def _bound_blocks(max_segment_len: int, blk: int) -> int:
    """kv blocks a q block can need: the segment of its first token
    starts at most max_segment_len-1 tokens earlier, plus the diagonal."""
    return min(-(-max_segment_len // blk) + 1, 1 << 30)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _packed_attn(q, k, v, segment_ids, scale, blk, n_kv, interpret):
    out, _ = _packed_attn_fwd(q, k, v, segment_ids, scale, blk, n_kv,
                              interpret)
    return out


def _packed_attn_fwd(q, k, v, segment_ids, scale, blk, n_kv, interpret):
    # model layout [B, T, H, D] -> kernel layout [B, H, T, D]
    qt = jnp.transpose(q, (0, 2, 1, 3)) * jnp.asarray(scale, q.dtype)
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    q_seg, kv_seg = _replicate_segments(segment_ids)
    kv_lo, q_hi = segment_block_metadata(segment_ids, blk)
    out, lse = _fwd(qt, kt, vt, q_seg, kv_seg, kv_lo,
                    blk=blk, n_kv=n_kv, interpret=interpret)
    res = (qt, kt, vt, q_seg, kv_seg, kv_lo, q_hi, out, lse)
    return jnp.transpose(out, (0, 2, 1, 3)), res


def _packed_attn_bwd(scale, blk, n_kv, interpret, res, g):
    qt, kt, vt, q_seg, kv_seg, kv_lo, q_hi, out, lse = res
    dout = jnp.transpose(g, (0, 2, 1, 3))
    di = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32),
                 axis=-1)                              # [B, Hq, T]
    di = jax.lax.broadcast_in_dim(
        di, (*di.shape, 128), (0, 1, 2))               # [B, Hq, T, 128]
    dq = _dq(qt, kt, vt, q_seg, kv_seg, dout, lse, di, kv_lo,
             blk=blk, n_kv=n_kv, interpret=interpret)
    dk, dv = _dkv(qt, kt, vt, q_seg, kv_seg, dout, lse, di, q_hi,
                  blk=blk, n_q=n_kv, interpret=interpret)
    dq = (dq * scale).astype(qt.dtype)
    # q was pre-scaled: s = (q*scale) @ k^T, so dk computed against the
    # scaled q is already exact; dq above is w.r.t. the scaled q and
    # needs the chain factor.
    dqm = jnp.transpose(dq, (0, 2, 1, 3))
    dkm = jnp.transpose(dk.astype(kt.dtype), (0, 2, 1, 3))
    dvm = jnp.transpose(dv.astype(vt.dtype), (0, 2, 1, 3))
    return dqm, dkm, dvm, None


_packed_attn.defvjp(_packed_attn_fwd, _packed_attn_bwd)


def packed_flash_attention(
    q, k, v,
    segment_ids: jnp.ndarray,
    *,
    max_segment_len: int,
    scale: Optional[float] = None,
    block: Optional[int] = None,
    interpret: bool = False,
):
    """Causal packed attention, O(sum len_i^2) instead of O(T^2).

    q [B, T, Hq, D]; k, v [B, T, Hkv, D]; segment_ids [B, T] int32 with
    equal ids contiguous (pack_sequences layout; pad tail = id 0).
    max_segment_len: static per-document token cap the packer enforced —
    sets the kernel's kv-range bound. Wrong-side violations produce
    silently truncated attention for the offending segment, so callers
    must pass the packer's real cap.
    """
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    import jax

    if not isinstance(segment_ids, jax.core.Tracer):
        # eager call with concrete data: validate the contract instead of
        # silently truncating (under jit the packer/trainer validates —
        # data/packing.py:validate_segment_bound)
        import numpy as np

        from ..data.packing import max_segment_length

        got = max_segment_length(np.asarray(segment_ids))
        if got > int(max_segment_len):
            raise ValueError(
                f"segment of {got} tokens exceeds max_segment_len="
                f"{int(max_segment_len)}; attention would be silently "
                "truncated for it")
    if scale is None:
        scale = d ** -0.5
    blk = block or int(env.env_int("UNSLOTH_PACKED_BLOCK", DEFAULT_BLOCK))
    blk = min(blk, t)
    if t % blk or d % 128 or hq % hkv:
        raise ValueError(
            f"packed_flash_attention needs T%block==0, D%128==0, "
            f"Hq%Hkv==0; got T={t} blk={blk} D={d} Hq={hq} Hkv={hkv}")
    n_kv = min(_bound_blocks(int(max_segment_len), blk), t // blk)
    return _packed_attn(q, k, v, segment_ids, float(scale), blk, n_kv,
                        interpret)
