"""Fused lm_head + cross-entropy that never materializes [N, V] logits.

Parity target: the reference's ``unsloth_fused_ce_loss`` (unsloth_zoo
loss_utils, used at reference models/llama.py:1454-1509 — "skips lm_head
logits entirely when bsz*q_len large & labels present") and cut-cross-entropy.

TPU design: instead of a monolithic kernel we chunk the token dimension with
`lax.scan`; each chunk computes its [C, V] logits on the MXU, reduces them to
per-row (loss, logsumexp) immediately, and the backward recomputes the chunk
logits to form dhidden (and optionally dW). Peak memory is O(C·V) instead of
O(N·V); XLA fuses the softmax epilogue into the matmul. This is the
compiler-friendly formulation of the same math — full control stays with the
scheduler, and the matmuls stay large and MXU-shaped.

The gradient-accumulation-correct scaling (divide by a global ``n_items``
rather than per-batch token counts — the grad-accum bug class the reference
fixed, reference trainer.py:324-346) is supported via the ``n_items`` arg.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .cross_entropy import IGNORE_INDEX, _transform_logits

_DEFAULT_CHUNK = 1024


def _num_chunks(n: int, chunk: int) -> int:
    return -(-n // chunk)


def _pad_rows(x, n_pad, value=0):
    if n_pad == 0:
        return x
    widths = [(0, n_pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=value)


def _chunk_loss(h_chunk, w, b, labels_chunk, softcap, logit_scale):
    """Returns (per-row loss, per-row lse) for one chunk, fp32."""
    z = jnp.dot(h_chunk, w, preferred_element_type=jnp.float32)
    if b is not None:
        z = z + b.astype(jnp.float32)
    z = _transform_logits(z, softcap, logit_scale)
    lse = jax.scipy.special.logsumexp(z, axis=-1)
    valid = labels_chunk != IGNORE_INDEX
    safe = jnp.where(valid, labels_chunk, 0)
    target = jnp.take_along_axis(z, safe[:, None], axis=-1)[:, 0]
    loss = jnp.where(valid, lse - target, 0.0)
    return loss, lse


def _chunk_dz(h_chunk, w, b, labels_chunk, lse_chunk, softcap, logit_scale):
    """Recompute chunk logits and form dz (pre-transform gradient), fp32."""
    z0 = jnp.dot(h_chunk, w, preferred_element_type=jnp.float32)
    if b is not None:
        z0 = z0 + b.astype(jnp.float32)
    z = z0 * logit_scale if logit_scale is not None else z0
    if softcap is not None:
        th = jnp.tanh(z / softcap)
        zc = softcap * th
    else:
        th = None
        zc = z
    p = jnp.exp(zc - lse_chunk[:, None])
    v = w.shape[-1]
    cols = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    onehot = (cols == labels_chunk[:, None]).astype(jnp.float32)
    valid = (labels_chunk != IGNORE_INDEX)[:, None]
    dzc = jnp.where(valid, p - onehot, 0.0)
    if softcap is not None:
        dzc = dzc * (1.0 - th * th)
    if logit_scale is not None:
        dzc = dzc * logit_scale
    return dzc


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_linear_cross_entropy(
    hidden,                      # [N, D]
    w,                           # [D, V]
    bias,                        # [V] or None
    labels,                      # [N] int32 (already shifted by caller)
    softcap: Optional[float] = None,
    logit_scale: Optional[float] = None,
    chunk_size: int = _DEFAULT_CHUNK,
    w_trainable: bool = True,
):
    """Sum of per-token CE over valid tokens, fp32 scalar, plus valid count.

    Returns (loss_sum, n_valid). Caller divides (mean or n_items scaling).
    Set ``w_trainable=False`` for LoRA (frozen lm_head) to skip the [D, V]
    weight-gradient accumulator entirely.
    """
    loss_sum, _ = _fwd_impl(hidden, w, bias, labels, softcap, logit_scale,
                            chunk_size)
    n_valid = jnp.sum(labels != IGNORE_INDEX)
    return loss_sum, n_valid


def _fwd_impl(hidden, w, bias, labels, softcap, logit_scale, chunk_size):
    n, d = hidden.shape
    nc = _num_chunks(n, chunk_size)
    n_pad = nc * chunk_size - n
    h = _pad_rows(hidden, n_pad).reshape(nc, chunk_size, d)
    lb = _pad_rows(labels, n_pad, value=IGNORE_INDEX).reshape(nc, chunk_size)

    def body(acc, xs):
        h_c, lb_c = xs
        loss, lse = _chunk_loss(h_c, w, bias, lb_c, softcap, logit_scale)
        return acc + jnp.sum(loss), lse

    loss_sum, lse_all = jax.lax.scan(body, jnp.float32(0.0), (h, lb))
    return loss_sum, lse_all.reshape(-1)[:n]


def _flce_fwd(hidden, w, bias, labels, softcap, logit_scale, chunk_size,
              w_trainable):
    loss_sum, lse = _fwd_impl(hidden, w, bias, labels, softcap, logit_scale,
                              chunk_size)
    n_valid = jnp.sum(labels != IGNORE_INDEX)
    return (loss_sum, n_valid), (hidden, w, bias, labels, lse)


def _flce_bwd(softcap, logit_scale, chunk_size, w_trainable, res, g):
    hidden, w, bias, labels, lse = res
    g_loss = g[0].astype(jnp.float32)  # d(out)/d(loss_sum); n_valid is int

    n, d = hidden.shape
    v = w.shape[-1]
    nc = _num_chunks(n, chunk_size)
    n_pad = nc * chunk_size - n
    h = _pad_rows(hidden, n_pad).reshape(nc, chunk_size, d)
    lb = _pad_rows(labels, n_pad, value=IGNORE_INDEX).reshape(nc, chunk_size)
    ls = _pad_rows(lse, n_pad).reshape(nc, chunk_size)

    if w_trainable:
        init = (jnp.zeros((d, v), jnp.float32),
                jnp.zeros((v,), jnp.float32) if bias is not None else None)

        def body(carry, xs):
            dw_acc, db_acc = carry
            h_c, lb_c, lse_c = xs
            dz = _chunk_dz(h_c, w, bias, lb_c, lse_c, softcap, logit_scale)
            dz = dz * g_loss
            dh_c = jnp.dot(dz, w.T.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
            dw_acc = dw_acc + jnp.dot(h_c.astype(jnp.float32).T, dz,
                                      preferred_element_type=jnp.float32)
            if db_acc is not None:
                db_acc = db_acc + jnp.sum(dz, axis=0)
            return (dw_acc, db_acc), dh_c

        (dw, db), dh = jax.lax.scan(body, init, (h, lb, ls))
        dw = dw.astype(w.dtype)
        db = db.astype(bias.dtype) if bias is not None else None
    else:
        def body(_, xs):
            h_c, lb_c, lse_c = xs
            dz = _chunk_dz(h_c, w, bias, lb_c, lse_c, softcap, logit_scale)
            dz = dz * g_loss
            dh_c = jnp.dot(dz, w.T.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
            return None, dh_c

        _, dh = jax.lax.scan(body, None, (h, lb, ls))
        dw = jnp.zeros_like(w)
        db = jnp.zeros_like(bias) if bias is not None else None

    dh = dh.reshape(nc * chunk_size, d)[:n].astype(hidden.dtype)
    return dh, dw, db, None


fused_linear_cross_entropy.defvjp(_flce_fwd, _flce_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_linear_ce_per_row(
    hidden, w, bias, labels,
    softcap: Optional[float] = None,
    logit_scale: Optional[float] = None,
    chunk_size: int = _DEFAULT_CHUNK,
    w_trainable: bool = False,
):
    """Per-row CE loss [N] (fp32) without materializing [N, V] logits.

    ``-fused_linear_ce_per_row(...)`` is the chunked *selective log-softmax*
    the reference uses for GRPO logprobs (reference:
    rl_replacements.py:1355-1410 `_get_per_token_logps` via hidden states +
    chunked selective log-softmax). Rows with label == -100 return 0.
    """
    _, lse, loss = _fwd_rows(hidden, w, bias, labels, softcap, logit_scale,
                             chunk_size)
    return loss


def _fwd_rows(hidden, w, bias, labels, softcap, logit_scale, chunk_size):
    n, d = hidden.shape
    nc = _num_chunks(n, chunk_size)
    n_pad = nc * chunk_size - n
    h = _pad_rows(hidden, n_pad).reshape(nc, chunk_size, d)
    lb = _pad_rows(labels, n_pad, value=IGNORE_INDEX).reshape(nc, chunk_size)

    def body(_, xs):
        h_c, lb_c = xs
        loss, lse = _chunk_loss(h_c, w, bias, lb_c, softcap, logit_scale)
        return None, (loss, lse)

    _, (loss, lse) = jax.lax.scan(body, None, (h, lb))
    return None, lse.reshape(-1)[:n], loss.reshape(-1)[:n]


def _rows_fwd(hidden, w, bias, labels, softcap, logit_scale, chunk_size,
              w_trainable):
    _, lse, loss = _fwd_rows(hidden, w, bias, labels, softcap, logit_scale,
                             chunk_size)
    return loss, (hidden, w, bias, labels, lse)


def _rows_bwd(softcap, logit_scale, chunk_size, w_trainable, res, g):
    hidden, w, bias, labels, lse = res
    g = g.astype(jnp.float32)                       # [N] per-row cotangent
    n, d = hidden.shape
    v = w.shape[-1]
    nc = _num_chunks(n, chunk_size)
    n_pad = nc * chunk_size - n
    h = _pad_rows(hidden, n_pad).reshape(nc, chunk_size, d)
    lb = _pad_rows(labels, n_pad, value=IGNORE_INDEX).reshape(nc, chunk_size)
    ls = _pad_rows(lse, n_pad).reshape(nc, chunk_size)
    gr = _pad_rows(g, n_pad).reshape(nc, chunk_size)

    if w_trainable:
        init = (jnp.zeros((d, v), jnp.float32),
                jnp.zeros((v,), jnp.float32) if bias is not None else None)
    else:
        init = None

    def body(carry, xs):
        h_c, lb_c, lse_c, g_c = xs
        dz = _chunk_dz(h_c, w, bias, lb_c, lse_c, softcap, logit_scale)
        dz = dz * g_c[:, None]
        dh_c = jnp.dot(dz, w.T.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        if carry is not None:
            dw_acc, db_acc = carry
            dw_acc = dw_acc + jnp.dot(h_c.astype(jnp.float32).T, dz,
                                      preferred_element_type=jnp.float32)
            if db_acc is not None:
                db_acc = db_acc + jnp.sum(dz, axis=0)
            carry = (dw_acc, db_acc)
        return carry, dh_c

    carry, dh = jax.lax.scan(body, init, (h, lb, ls, gr))
    dh = dh.reshape(nc * chunk_size, d)[:n].astype(hidden.dtype)
    if w_trainable:
        dw, db = carry
        dw = dw.astype(w.dtype)
        db = db.astype(bias.dtype) if bias is not None else None
    else:
        dw = jnp.zeros_like(w)
        db = jnp.zeros_like(bias) if bias is not None else None
    return dh, dw, db, None


fused_linear_ce_per_row.defvjp(_rows_fwd, _rows_bwd)


def selective_log_softmax(hidden, w, token_ids, bias=None,
                          softcap: Optional[float] = None,
                          logit_scale: Optional[float] = None,
                          chunk_size: int = _DEFAULT_CHUNK,
                          w_trainable: bool = False):
    """log p(token_ids) per row, chunked, logits never materialized.
    Rows with token_id == -100 return 0."""
    return -fused_linear_ce_per_row(hidden, w, bias, token_ids, softcap,
                                    logit_scale, chunk_size, w_trainable)


def fused_ce_loss_mean(hidden, w, labels, bias=None,
                       n_items: Optional[jnp.ndarray] = None,
                       softcap: Optional[float] = None,
                       logit_scale: Optional[float] = None,
                       chunk_size: int = _DEFAULT_CHUNK,
                       w_trainable: bool = True):
    """Convenience wrapper: mean loss over valid tokens (or over n_items)."""
    loss_sum, n_valid = fused_linear_cross_entropy(
        hidden, w, bias, labels, softcap, logit_scale, chunk_size, w_trainable)
    denom = n_items if n_items is not None else jnp.maximum(n_valid, 1)
    return loss_sum / denom
