"""MiniMax lightning attention — decayed linear attention, chunked.

Parity target: HF MiniMaxLightningAttention (the MiniMax-M1/Text-01
linear-attention layers; the reference catalogs MiniMax through its
FastModel path). Semantics: non-negative features (silu on qkv), per-head
exponential position decay with ALiBi-style slopes scaled down with
depth, and a block-recurrent formulation:

  intra  = (Q_blk K_blk^T * exp(-s*(i-j)) [i>=j]) V_blk
  inter  = (Q_blk * exp(-s*(pos+1))) S
  S'     = S * exp(-s*B) + (K_blk * exp(-s*(B-pos)))^T V_blk

TPU design: one `lax.scan` over fixed-size blocks; the intra term is a
masked [Bk, Bk] matmul on the MXU, the inter term and state update are
[Bk, D] x [D, D] matmuls. A trailing partial block runs once outside the
scan with its own length's decays (HF's current_block_size semantics),
so outputs AND the returned recurrent state are exact for any T.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def lightning_slopes(num_heads: int, layer_idx: int,
                     num_layers: int) -> np.ndarray:
    """Per-head decay rates (HF get_slope_rate): ALiBi base slopes scaled
    by depth factor (1 - l/(L-1+eps) + eps)."""
    base = 1.0 / (2.0 ** (8.0 / num_heads))
    rate = base ** (np.arange(num_heads, dtype=np.float64) + 1)
    factor = 1.0 - layer_idx / (num_layers - 1 + 1e-5) + 1e-5
    return (rate * factor).astype(np.float32)


def _block_step(state, qi, ki, vi, s, c: int):
    """One lightning block of static length c. state [B,H,D,D]; qi/ki/vi
    [B, H, c, D] fp32. Returns (new_state, out [B,H,c,D]) with the HF
    partial-block semantics: decays are relative to THIS block's length
    (query_decay[:c], key_decay[-c:], block_decay e^{-s c})."""
    pos = jnp.arange(c, dtype=jnp.float32) + 1.0          # 1..c
    q_decay = jnp.exp(-s[:, None] * pos[None, :])         # [H, c]
    k_decay = jnp.exp(-s[:, None] * (c - pos)[None, :])   # [H, c]
    diff = pos[:, None] - pos[None, :]                    # i - j
    diag = jnp.where(diff >= 0,
                     jnp.exp(-s[:, None, None] * diff[None]), 0.0)
    block_decay = jnp.exp(-s * c)                         # [H]
    intra_w = jnp.einsum("bhid,bhjd->bhij", qi, ki) * diag[None]
    intra = jnp.einsum("bhij,bhjd->bhid", intra_w, vi)
    inter = jnp.einsum("bhld,bhde->bhle",
                       qi * q_decay[None, :, :, None], state)
    new_state = state * block_decay[None, :, None, None] \
        + jnp.einsum("bhld,bhle->bhde",
                     ki * k_decay[None, :, :, None], vi)
    return new_state, intra + inter


def lightning_attention(q, k, v, slope, block_size: int = 256,
                        initial_state=None, return_state: bool = False):
    """q/k/v [B, T, H, D] (already feature-mapped); slope [H] fp32.
    Returns [B, T, H, D] (fp32 math) [, final state [B, H, D, D]].

    Full blocks run under one `lax.scan` (MXU matmuls per block); a
    trailing partial block is computed separately with its own length's
    decays, so the returned state is exact for any T (decode prefill
    hands it to the per-token recurrence)."""
    b, t, h, d = q.shape
    s = jnp.asarray(slope, jnp.float32)                  # [H]
    l = min(block_size, t)
    nb = t // l
    rem = t - nb * l

    if initial_state is None:
        state = jnp.zeros((b, h, d, d), jnp.float32)
    else:
        state = initial_state.astype(jnp.float32)

    tohf = lambda u, t0, t1: u.astype(jnp.float32).transpose(  # noqa: E731
        0, 2, 1, 3)[:, :, t0:t1]                         # [B, H, c, D]

    outs = []
    if nb:
        tb = nb * l

        def blk(u):  # [nb, B, H, l, D]
            return u.astype(jnp.float32).transpose(0, 2, 1, 3)[
                :, :, :tb].reshape(b, h, nb, l, d).transpose(2, 0, 1, 3, 4)

        def step(st, inp):
            qi, ki, vi = inp
            return _block_step(st, qi, ki, vi, s, l)

        state, out = jax.lax.scan(step, state, (blk(q), blk(k), blk(v)))
        outs.append(out.transpose(1, 2, 0, 3, 4).reshape(b, h, tb, d))
    if rem:
        state, out = _block_step(state, tohf(q, nb * l, t),
                                 tohf(k, nb * l, t), tohf(v, nb * l, t),
                                 s, rem)
        outs.append(out)
    out = jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]
    out = out.transpose(0, 2, 1, 3)                      # [B, T, H, D]
    if return_state:
        return out, state
    return out


def lightning_attention_ref(q, k, v, slope):
    """Sequential recurrence oracle (HF's decode path, one token at a
    time): S_t = e^{-s} S_{t-1} + k_t^T v_t; y_t = q_t S_t."""
    b, t, h, d = q.shape
    s = jnp.asarray(slope, jnp.float32)
    ratio = jnp.exp(-s)                                  # [H]
    state = jnp.zeros((b, h, d, d), jnp.float32)
    outs = []
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    for i in range(t):
        kv = jnp.einsum("bhd,bhe->bhde", kf[:, i], vf[:, i])
        state = ratio[None, :, None, None] * state + kv
        outs.append(jnp.einsum("bhd,bhde->bhe", qf[:, i], state))
    return jnp.stack(outs, axis=1)                       # [B, T, H, D]
