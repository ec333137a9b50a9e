"""Gated DeltaNet (Qwen3-Next linear attention).

Parity target: the qwen3-next family the reference serves through its
mapper/catalog; semantics from HF `torch_chunk_gated_delta_rule`
(transformers models/qwen3_next/modeling_qwen3_next.py) — the chunked
gated delta rule of "Gated Delta Networks" (Yang et al., 2024):

    S_t = alpha_t * S_{t-1} * (I - beta_t k_t k_t^T) + beta_t k_t v_t^T
    o_t = S_t^T q_t

TPU-native formulation: the sequential in-chunk correction loop in the HF
eager path is a unit-lower-triangular system — solved here with one
`solve_triangular` per chunk instead of a Python loop — and the
cross-chunk recurrence is a `lax.scan`. Everything static-shaped and
differentiable; fp32 math matches HF's upcast.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _l2norm(x, eps: float = 1e-6):
    return x * jax.lax.rsqrt(
        jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def recurrent_gated_delta_rule(
    query: jnp.ndarray,     # [B, 1, H, Dk]
    key: jnp.ndarray,
    value: jnp.ndarray,     # [B, 1, H, Dv]
    g: jnp.ndarray,         # [B, 1, H]
    beta: jnp.ndarray,      # [B, 1, H]
    state: jnp.ndarray,     # [B, H, Dk, Dv]
    use_qk_l2norm: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-token decode step (HF torch_recurrent_gated_delta_rule):
    S = S * e^g; delta = beta * (v - k S); S += k^T delta; y = q S."""
    dk = query.shape[-1]
    q = query[:, 0].astype(jnp.float32)
    k = key[:, 0].astype(jnp.float32)
    if use_qk_l2norm:
        q = _l2norm(q)
        k = _l2norm(k)
    q = q * (dk ** -0.5)
    v = value[:, 0].astype(jnp.float32)
    gt = jnp.exp(g[:, 0].astype(jnp.float32))[..., None, None]
    bt = beta[:, 0].astype(jnp.float32)[..., None]
    state = state.astype(jnp.float32) * gt
    kv_mem = jnp.einsum("bhk,bhkv->bhv", k, state)
    delta = (v - kv_mem) * bt
    state = state + jnp.einsum("bhk,bhv->bhkv", k, delta)
    out = jnp.einsum("bhk,bhkv->bhv", q, state)
    return out[:, None].astype(value.dtype), state


def chunk_gated_delta_rule(
    query: jnp.ndarray,     # [B, T, H, Dk]
    key: jnp.ndarray,       # [B, T, H, Dk]
    value: jnp.ndarray,     # [B, T, H, Dv]
    g: jnp.ndarray,         # [B, T, H] log decay (negative)
    beta: jnp.ndarray,      # [B, T, H] write strength in (0, 1)
    chunk_size: int = 64,
    initial_state: Optional[jnp.ndarray] = None,
    use_qk_l2norm: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (out [B, T, H, Dv], final_state [B, H, Dk, Dv])."""
    b, t, h, dk = query.shape
    dv = value.shape[-1]
    if use_qk_l2norm:
        query = _l2norm(query.astype(jnp.float32))
        key = _l2norm(key.astype(jnp.float32))
    # to [B, H, T, D] fp32
    q = query.astype(jnp.float32).transpose(0, 2, 1, 3)
    k = key.astype(jnp.float32).transpose(0, 2, 1, 3)
    v = value.astype(jnp.float32).transpose(0, 2, 1, 3)
    gg = g.astype(jnp.float32).transpose(0, 2, 1)
    bt = beta.astype(jnp.float32).transpose(0, 2, 1)

    pad = (-t) % chunk_size
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        gg = jnp.pad(gg, ((0, 0), (0, 0), (0, pad)))
        bt = jnp.pad(bt, ((0, 0), (0, 0), (0, pad)))
    tt = t + pad
    nc = tt // chunk_size
    c = chunk_size
    q = q * (dk ** -0.5)

    v_beta = v * bt[..., None]
    k_beta = k * bt[..., None]

    def ch(x):
        return x.reshape(b, h, nc, c, *x.shape[3:])

    q, k, v, k_beta, v_beta = map(ch, (q, k, v, k_beta, v_beta))
    gg = gg.reshape(b, h, nc, c)
    g_cs = jnp.cumsum(gg, axis=-1)                       # [b,h,nc,c]

    tril_all = jnp.tril(jnp.ones((c, c), bool))          # incl. diagonal
    strict = jnp.tril(jnp.ones((c, c), bool), -1)
    decay = jnp.where(
        tril_all, jnp.exp(g_cs[..., :, None] - g_cs[..., None, :]), 0.0)

    # in-chunk correction: HF's sequential loop builds M with
    # M = A + M @ A for strictly-lower A — i.e. (I - A) M = A, and
    # (M + I) = (I - A)^{-1}. One triangular solve per chunk.
    A = -jnp.where(strict, (k_beta @ k.swapaxes(-1, -2)) * decay, 0.0)
    eye = jnp.eye(c, dtype=A.dtype)
    inv = jax.vmap(
        lambda m: jax.scipy.linalg.solve_triangular(m, eye, lower=True),
    )((eye - A).reshape(-1, c, c)).reshape(A.shape)      # (I - A)^{-1}

    v_c = inv @ v_beta                                   # attn @ v_beta
    k_cumdecay = inv @ (k_beta * jnp.exp(g_cs)[..., None])

    strict_mask = strict
    g_last = g_cs[..., -1]                               # [b,h,nc]

    def step(state, xs):
        q_i, k_i, v_i, kcd_i, dec_i, gcs_i, glast_i = xs
        # [b,h,c,c], state [b,h,dk,dv]
        attn = jnp.where(strict_mask | jnp.eye(c, dtype=bool),
                         (q_i @ k_i.swapaxes(-1, -2)) * dec_i, 0.0)
        attn = jnp.where(jnp.tril(jnp.ones((c, c), bool)), attn, 0.0)
        v_prime = kcd_i @ state
        v_new = v_i - v_prime
        attn_inter = (q_i * jnp.exp(gcs_i)[..., None]) @ state
        out_i = attn_inter + attn @ v_new
        state = state * jnp.exp(glast_i)[..., None, None] \
            + (k_i * jnp.exp(glast_i[..., None] - gcs_i)[..., None]
               ).swapaxes(-1, -2) @ v_new
        return state, out_i

    init = (initial_state.astype(jnp.float32) if initial_state is not None
            else jnp.zeros((b, h, dk, dv), jnp.float32))
    xs = (q.transpose(2, 0, 1, 3, 4), k.transpose(2, 0, 1, 3, 4),
          v_c.transpose(2, 0, 1, 3, 4),
          k_cumdecay.transpose(2, 0, 1, 3, 4),
          decay.transpose(2, 0, 1, 3, 4), g_cs.transpose(2, 0, 1, 3),
          g_last.transpose(2, 0, 1))
    state, outs = jax.lax.scan(step, init, xs)
    out = outs.transpose(1, 2, 0, 3, 4).reshape(b, h, tt, dv)
    out = out[:, :, :t].transpose(0, 2, 1, 3)            # [B, T, H, Dv]
    return out.astype(value.dtype), state
