"""Fused cross-entropy loss — Pallas TPU kernel + jnp reference.

Behavior parity with the reference Triton kernels
(reference: unsloth/kernels/cross_entropy_loss.py):
  * forward computes per-row loss + logsumexp in one pass (:35)
  * chunked logsumexp for large vocabularies (:114, math :128-151) — here the
    vocab chunking is the Pallas grid's inner dimension with an online
    (max, sumexp) update, the TPU-native formulation of
    "logsumexp of chunk logsumexps"
  * Gemma-2 softcapping ``t * tanh(x / t)`` and Cohere logit scaling as
    compile-time branches (:81-97)
  * backward materializes dlogits directly from the saved logsumexp (:202-276)
  * ``fast_cross_entropy_loss`` divides by n_items (:421-449)

Labels use ignore_index = -100 (HF convention). All accumulation in fp32.
Mosaic notes: per-row scalars are kept as [R, 1] 2-D buffers (TPU vectors
want a lane dimension) and the target logit is extracted with a where/sum
instead of a gather (Mosaic does not lower 2-D gathers).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import env

IGNORE_INDEX = -100
_BLOCK_ROWS = 256
_BLOCK_VOCAB = 2048


def _transform_logits(x, softcap, logit_scale):
    if logit_scale is not None:
        x = x * logit_scale
    if softcap is not None:
        x = softcap * jnp.tanh(x / softcap)
    return x


# ---------------------------------------------------------------------------
# jnp reference
# ---------------------------------------------------------------------------

def cross_entropy_ref(logits, labels, softcap: Optional[float] = None,
                      logit_scale: Optional[float] = None):
    """Per-row CE loss. logits: [N, V]; labels: [N] int32.
    Rows with label == -100 contribute 0. Returns fp32 [N]."""
    x = _transform_logits(logits.astype(jnp.float32), softcap, logit_scale)
    lse = jax.scipy.special.logsumexp(x, axis=-1)
    valid = labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, labels, 0)
    target = jnp.take_along_axis(x, safe_labels[:, None], axis=-1)[:, 0]
    return jnp.where(valid, lse - target, 0.0)


# ---------------------------------------------------------------------------
# Pallas forward: per-row (loss, logsumexp) with online vocab chunking
# ---------------------------------------------------------------------------

def _ce_fwd_kernel(labels_ref, logits_ref, loss_ref, lse_ref,
                   m_scr, s_scr, t_scr,
                   *, block_vocab: int, vocab_size: int,
                   softcap, logit_scale):
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        s_scr[:] = jnp.zeros_like(s_scr)
        t_scr[:] = jnp.zeros_like(t_scr)

    x = logits_ref[:].astype(jnp.float32)
    x = _transform_logits(x, softcap, logit_scale)

    # Mask vocab padding in the last chunk.
    col0 = j * block_vocab
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    x = jnp.where(cols < vocab_size, x, -jnp.inf)

    m_prev = m_scr[:]                                   # [R, 1]
    m_chunk = jnp.max(x, axis=-1, keepdims=True)        # [R, 1]
    m_new = jnp.maximum(m_prev, m_chunk)
    m_safe = jnp.where(m_new == -jnp.inf, 0.0, m_new)
    alpha = jnp.where(m_prev == -jnp.inf, 0.0, jnp.exp(m_prev - m_safe))
    s_new = s_scr[:] * alpha + jnp.sum(
        jnp.exp(x - m_safe), axis=-1, keepdims=True)
    m_scr[:] = m_new
    s_scr[:] = s_new

    # Target logit via where/sum (exactly one hit across all chunks).
    labels = labels_ref[:]                              # [R, 1]
    is_target = cols == labels
    picked = jnp.sum(jnp.where(is_target, x, 0.0), axis=-1, keepdims=True)
    t_scr[:] = t_scr[:] + picked

    @pl.when(j == n_j - 1)
    def _():
        lse = m_safe + jnp.log(s_new)
        valid = labels != IGNORE_INDEX
        lse_ref[:] = lse
        loss_ref[:] = jnp.where(valid, lse - t_scr[:], 0.0)


def _ce_bwd_kernel(labels_ref, g_ref, lse_ref, logits_ref, dx_ref,
                   *, block_vocab: int, vocab_size: int,
                   softcap, logit_scale):
    j = pl.program_id(1)
    x = logits_ref[:].astype(jnp.float32)
    z = x
    if logit_scale is not None:
        z = z * logit_scale
    if softcap is not None:
        th = jnp.tanh(z / softcap)
        zc = softcap * th
    else:
        th = None
        zc = z

    labels = labels_ref[:]   # [R, 1]
    lse = lse_ref[:]         # [R, 1]
    g = g_ref[:]             # [R, 1]

    p = jnp.exp(zc - lse)
    col0 = j * block_vocab
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    onehot = (cols == labels).astype(jnp.float32)
    valid = labels != IGNORE_INDEX
    dzc = jnp.where(valid, p - onehot, 0.0) * g
    if softcap is not None:
        dz = dzc * (1.0 - th * th)
    else:
        dz = dzc
    if logit_scale is not None:
        dz = dz * logit_scale
    dz = jnp.where(cols < vocab_size, dz, 0.0)
    dx_ref[:] = dz.astype(dx_ref.dtype)


def _pad_to(x, n, axis, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _ce_fwd_pallas(logits, labels, softcap, logit_scale,
                   block_rows=_BLOCK_ROWS, block_vocab=_BLOCK_VOCAB):
    n, v = logits.shape
    np_ = pl.cdiv(n, block_rows) * block_rows
    vp = pl.cdiv(v, block_vocab) * block_vocab
    logits_p = _pad_to(_pad_to(logits, np_, 0), vp, 1)
    labels_p = _pad_to(labels, np_, 0, value=IGNORE_INDEX).reshape(np_, 1)
    grid = (np_ // block_rows, vp // block_vocab)
    kernel = functools.partial(
        _ce_fwd_kernel, block_vocab=block_vocab, vocab_size=v,
        softcap=softcap, logit_scale=logit_scale)
    loss, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, block_vocab), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_rows, 1), jnp.float32),
            pltpu.VMEM((block_rows, 1), jnp.float32),
            pltpu.VMEM((block_rows, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(labels_p, logits_p)
    return loss[:n, 0], lse[:n, 0]


def _ce_bwd_pallas(logits, labels, lse, g, softcap, logit_scale,
                   block_rows=_BLOCK_ROWS, block_vocab=_BLOCK_VOCAB):
    n, v = logits.shape
    np_ = pl.cdiv(n, block_rows) * block_rows
    vp = pl.cdiv(v, block_vocab) * block_vocab
    logits_p = _pad_to(_pad_to(logits, np_, 0), vp, 1)
    labels_p = _pad_to(labels, np_, 0, value=IGNORE_INDEX).reshape(np_, 1)
    lse_p = _pad_to(lse, np_, 0).reshape(np_, 1)
    g_p = _pad_to(g, np_, 0).reshape(np_, 1)
    grid = (np_ // block_rows, vp // block_vocab)
    kernel = functools.partial(
        _ce_bwd_kernel, block_vocab=block_vocab, vocab_size=v,
        softcap=softcap, logit_scale=logit_scale)
    row_spec = pl.BlockSpec((block_rows, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            row_spec, row_spec, row_spec,
            pl.BlockSpec((block_rows, block_vocab), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, block_vocab), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, vp), logits.dtype),
        interpret=_interpret(),
    )(labels_p, g_p, lse_p, logits_p)
    return dx[:n, :v]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _use_pallas() -> bool:
    return not env.disable_pallas() and jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def cross_entropy_per_row(logits, labels, softcap=None, logit_scale=None):
    """Per-row CE loss [N] fp32 from logits [N, V]."""
    if _use_pallas():
        loss, _ = _ce_fwd_pallas(logits, labels, softcap, logit_scale)
        return loss
    return cross_entropy_ref(logits, labels, softcap, logit_scale)


def _cvjp_fwd(logits, labels, softcap, logit_scale):
    if _use_pallas():
        loss, lse = _ce_fwd_pallas(logits, labels, softcap, logit_scale)
    else:
        x = _transform_logits(logits.astype(jnp.float32), softcap, logit_scale)
        lse = jax.scipy.special.logsumexp(x, axis=-1)
        valid = labels != IGNORE_INDEX
        safe = jnp.where(valid, labels, 0)
        target = jnp.take_along_axis(x, safe[:, None], axis=-1)[:, 0]
        loss = jnp.where(valid, lse - target, 0.0)
    return loss, (logits, labels, lse)


def _cvjp_bwd(softcap, logit_scale, res, g):
    logits, labels, lse = res
    g = g.astype(jnp.float32)
    if _use_pallas():
        dx = _ce_bwd_pallas(logits, labels, lse, g, softcap, logit_scale)
        return dx, None
    x = logits.astype(jnp.float32)
    z = x * logit_scale if logit_scale is not None else x
    if softcap is not None:
        th = jnp.tanh(z / softcap)
        zc = softcap * th
    else:
        zc = z
    p = jnp.exp(zc - lse[:, None])
    v = logits.shape[-1]
    onehot = jax.nn.one_hot(jnp.where(labels == IGNORE_INDEX, -1, labels), v,
                            dtype=jnp.float32)
    valid = (labels != IGNORE_INDEX)[:, None]
    dzc = jnp.where(valid, p - onehot, 0.0) * g[:, None]
    if softcap is not None:
        dzc = dzc * (1.0 - th * th)
    if logit_scale is not None:
        dzc = dzc * logit_scale
    return dzc.astype(logits.dtype), None


cross_entropy_per_row.defvjp(_cvjp_fwd, _cvjp_bwd)


def fast_cross_entropy_loss(logits, labels, n_items: Optional[jnp.ndarray] = None,
                            softcap: Optional[float] = None,
                            logit_scale: Optional[float] = None):
    """Mean CE over valid tokens; divides by ``n_items`` when given
    (gradient-accumulation-correct scaling; reference
    kernels/cross_entropy_loss.py:421-449). logits may be [B, T, V] or
    [N, V]; labels [B, T] / [N]. Labels are used as-is (caller shifts)."""
    v = logits.shape[-1]
    logits2d = logits.reshape(-1, v)
    labels1d = labels.reshape(-1)
    per_row = cross_entropy_per_row(logits2d, labels1d, softcap, logit_scale)
    if n_items is None:
        n_items = jnp.maximum(jnp.sum(labels1d != IGNORE_INDEX), 1)
    return jnp.sum(per_row) / n_items
