"""Mamba-2 (SSD) selective state-space op — the falcon-h1 hybrid block.

Parity target: the reference's falcon_h1 support (reference:
models/falcon_h1.py:1-756 — it patches HF's FalconH1Mixer, whose
`torch_forward` is the semantics matched here).

TPU-native design: the chunked SSD algorithm (Dao & Gu, 2024 — "state
space duality") expressed in jnp:
  * intra-chunk term — a masked [l, l] "attention" on the MXU,
  * inter-chunk recurrence — `lax.scan` over chunk states (linear in
    chunks, instead of the O(chunks^2) segment-sum the HF eager path
    uses),
  * depthwise causal conv1d — k shifted adds (k is 4; no gather, no
    [N, small] intermediates).
Everything is static-shaped and differentiable; fp32 state math matches
HF's float() upcast.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def causal_conv1d(x: jnp.ndarray, w: jnp.ndarray,
                  b: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Depthwise causal conv. x [B, T, C]; w [C, K] (HF stores
    conv1d.weight as [C, 1, K]); b [C] or None."""
    if w.ndim == 3:
        w = w[:, 0, :]
    k = w.shape[-1]
    out = x * w[None, None, :, -1]
    for j in range(1, k):
        shifted = jnp.pad(x, ((0, 0), (j, 0), (0, 0)))[:, :-j, :]
        out = out + shifted * w[None, None, :, -1 - j]
    if b is not None:
        out = out + b[None, None, :]
    return out


def ssd_chunked(xd: jnp.ndarray, Ad: jnp.ndarray, B: jnp.ndarray,
                C: jnp.ndarray, chunk_size: int,
                initial_state: Optional[jnp.ndarray] = None,
                return_final: bool = False) -> jnp.ndarray:
    """Chunked SSD scan.

    xd [B, T, H, P] — dt-discretized inputs (x * dt)
    Ad [B, T, H]    — dt-discretized decay exponents (A * dt, negative)
    B, C [B, T, H, N] — input/output projections (head-expanded)
    initial_state [B, H, P, N] — recurrent state entering token 0 (decode
    continuation); zeros if None. With return_final=True also returns the
    state AFTER the last real token (padding inside the trailing chunk is
    state-neutral: Ad=0 ⇒ decay 1, xd=0 ⇒ no input).
    Returns y [B, T, H, P] (fp32) [, final_state].
    """
    b, t, h, p = xd.shape
    n = B.shape[-1]
    pad = (-t) % chunk_size
    if pad:
        padt = lambda u: jnp.pad(  # noqa: E731
            u, ((0, 0), (0, pad)) + ((0, 0),) * (u.ndim - 2))
        xd, Ad, B, C = map(padt, (xd, Ad, B, C))
    tt = t + pad
    nc = tt // chunk_size
    l = chunk_size

    def r(u):
        return u.reshape(b, nc, l, *u.shape[2:])

    xd, Ad, B, C = map(r, (xd, Ad, B, C))
    A_cs = jnp.cumsum(Ad, axis=2)                        # [b, nc, l, h]
    A_sum = A_cs[:, :, -1]                               # [b, nc, h]

    # 1. intra-chunk (diagonal blocks): masked decay-weighted attention
    diff = A_cs[:, :, :, None, :] - A_cs[:, :, None, :, :]  # [b,nc,i,j,h]
    causal = jnp.tril(jnp.ones((l, l), bool))
    Ldec = jnp.where(causal[None, None, :, :, None],
                     jnp.exp(diff), 0.0)
    G = jnp.einsum("bcihn,bcjhn->bcijh", C, B)
    Y_diag = jnp.einsum("bcijh,bcijh,bcjhp->bcihp",
                        G, Ldec, xd)

    # 2. per-chunk end states
    decay_states = jnp.exp(A_sum[:, :, None, :] - A_cs)  # [b, nc, l, h]
    chunk_states = jnp.einsum("bclhn,bclh,bclhp->bchpn",
                              B, decay_states, xd)

    # 3. inter-chunk recurrence (linear scan over chunks)
    def step(s, inp):
        a_sum, st = inp                                  # [b,h], [b,h,p,n]
        entering = s
        s_next = s * jnp.exp(a_sum)[:, :, None, None] + st
        return s_next, entering

    if initial_state is None:
        init = jnp.zeros((b, h, p, n), xd.dtype)
    else:
        init = initial_state.astype(xd.dtype)
    final, entering = jax.lax.scan(
        step, init,
        (A_sum.transpose(1, 0, 2), chunk_states.transpose(1, 0, 2, 3, 4)))
    entering = entering.transpose(1, 0, 2, 3, 4)         # [b, nc, h, p, n]

    # 4. state -> output
    Y_off = jnp.einsum("bclhn,bchpn->bclhp", C, entering) \
        * jnp.exp(A_cs)[..., None]

    y = (Y_diag + Y_off).reshape(b, tt, h, p)
    if return_final:
        return y[:, :t], final
    return y[:, :t]


def mamba2_mixer(
    x: jnp.ndarray,
    p: Dict[str, Any],
    *,
    d_ssm: int,
    n_heads: int,
    head_dim: int,
    n_groups: int,
    d_state: int,
    chunk_size: int = 256,
    time_step_limit: Tuple[float, float] = (0.0, float("inf")),
    ssm_in_multiplier: float = 1.0,
    mup_vector: Optional[jnp.ndarray] = None,
    rms_norm_weight: Optional[jnp.ndarray] = None,
    rms_norm_eps: float = 1e-5,
    padding_mask: Optional[jnp.ndarray] = None,
    return_state: bool = False,
) -> jnp.ndarray:
    """The full falcon-h1/mamba2 mixer (HF FalconH1Mixer.torch_forward).

    x [B, T, D]. p: in_proj [Z, D], conv_w [convC, 1, K] or [convC, K],
    conv_b [convC]?, dt_bias [H], A_log [H], D [H], out_proj [D, d_ssm].
    padding_mask [B, T] (1 = real) zeroes padded tokens before the conv
    and scan (HF apply_mask_to_padding_states).

    return_state=True also returns (conv_state [B, K-1, convC] fp32 — the
    trailing pre-activation conv window — and ssm_state [B, H, P, N] fp32)
    for decode continuation via `mamba2_mixer_step`. Left-padded prompts
    are safe (state is zero through pads); right padding would decay the
    state and is the caller's responsibility to avoid.
    """
    bsz, t, _ = x.shape
    dtype = x.dtype
    if padding_mask is not None:
        x = x * padding_mask[..., None].astype(x.dtype)
    x = x * ssm_in_multiplier
    proj = jnp.dot(x, p["in_proj"].T.astype(x.dtype))
    if mup_vector is not None:
        proj = proj * mup_vector.astype(proj.dtype)
    conv_dim = d_ssm + 2 * n_groups * d_state
    gate = proj[..., :d_ssm]
    xBC = proj[..., d_ssm:d_ssm + conv_dim]
    dt = proj[..., d_ssm + conv_dim:]                    # [B, T, H]

    xBC_pre = xBC.astype(jnp.float32)                    # pre-conv window
    xBC = causal_conv1d(xBC, p["conv_w"].astype(jnp.float32),
                        p.get("conv_b"))
    xBC = jax.nn.silu(xBC.astype(jnp.float32))
    if padding_mask is not None:
        xBC = xBC * padding_mask[..., None].astype(xBC.dtype)

    xs = xBC[..., :d_ssm]
    Bm = xBC[..., d_ssm:d_ssm + n_groups * d_state]
    Cm = xBC[..., d_ssm + n_groups * d_state:]

    dt = jax.nn.softplus(dt.astype(jnp.float32)
                         + p["dt_bias"].astype(jnp.float32))
    dt = jnp.clip(dt, time_step_limit[0], time_step_limit[1])
    A = -jnp.exp(p["A_log"].astype(jnp.float32))         # [H]

    xs = xs.reshape(bsz, t, n_heads, head_dim)
    rep = n_heads // n_groups
    Bm = jnp.repeat(Bm.reshape(bsz, t, n_groups, d_state), rep, axis=2)
    Cm = jnp.repeat(Cm.reshape(bsz, t, n_groups, d_state), rep, axis=2)

    y = ssd_chunked(xs * dt[..., None], A[None, None, :] * dt,
                    Bm, Cm, chunk_size, return_final=return_state)
    if return_state:
        y, ssm_state = y
    y = y + xs * p["D"].astype(jnp.float32)[None, None, :, None]
    y = y.reshape(bsz, t, d_ssm)

    out = _gate_norm_out(y, gate, p, dtype, rms_norm_weight, rms_norm_eps)
    if not return_state:
        return out
    k = p["conv_w"].shape[-1]
    if t >= k - 1:
        conv_state = xBC_pre[:, t - (k - 1):, :]
    else:
        conv_state = jnp.pad(xBC_pre, ((0, 0), (k - 1 - t, 0), (0, 0)))
    return out, (conv_state, ssm_state)


def _gate_norm_out(y, gate, p, dtype, rms_norm_weight, rms_norm_eps):
    if rms_norm_weight is not None:
        # gated rms norm (mamba_rms_norm=True variant): norm(y * silu(g))
        g = jax.nn.silu(gate.astype(jnp.float32))
        y = y * g
        var = jnp.mean(y * y, axis=-1, keepdims=True)
        y = y * jax.lax.rsqrt(var + rms_norm_eps) \
            * rms_norm_weight.astype(jnp.float32)
    else:
        y = y * jax.nn.silu(gate.astype(jnp.float32))
    return jnp.dot(y.astype(dtype), p["out_proj"].T.astype(dtype))


def mamba2_mixer_step(
    x: jnp.ndarray,
    p: Dict[str, Any],
    state: Tuple[jnp.ndarray, jnp.ndarray],
    *,
    d_ssm: int,
    n_heads: int,
    head_dim: int,
    n_groups: int,
    d_state: int,
    time_step_limit: Tuple[float, float] = (0.0, float("inf")),
    ssm_in_multiplier: float = 1.0,
    mup_vector: Optional[jnp.ndarray] = None,
    rms_norm_weight: Optional[jnp.ndarray] = None,
    rms_norm_eps: float = 1e-5,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Single-token recurrent step (HF FalconH1Mixer cached-decode path).

    x [B, 1, D]; state = (conv_state [B, K-1, convC] fp32,
    ssm_state [B, H, P, N] fp32). Returns (y [B, 1, D], new state).
    Matches `mamba2_mixer(return_state=True)` exactly: the recurrence
    s' = s * exp(A·dt) + B ⊗ (x·dt); y = C·s' + D·x is the one-token
    specialization of the chunked SSD scan.
    """
    conv_state, ssm_state = state
    bsz = x.shape[0]
    dtype = x.dtype
    x = x * ssm_in_multiplier
    proj = jnp.dot(x, p["in_proj"].T.astype(x.dtype))
    if mup_vector is not None:
        proj = proj * mup_vector.astype(proj.dtype)
    conv_dim = d_ssm + 2 * n_groups * d_state
    gate = proj[..., :d_ssm]
    xBC = proj[..., d_ssm:d_ssm + conv_dim]
    dt = proj[..., d_ssm + conv_dim:]                    # [B, 1, H]

    w = p["conv_w"]
    if w.ndim == 3:
        w = w[:, 0, :]
    w = w.astype(jnp.float32)                            # [convC, K]
    window = jnp.concatenate(
        [conv_state, xBC.astype(jnp.float32)], axis=1)   # [B, K, convC]
    conv = jnp.einsum("bkc,ck->bc", window, w)
    if p.get("conv_b") is not None:
        conv = conv + p["conv_b"].astype(jnp.float32)
    xBC = jax.nn.silu(conv)[:, None, :]                  # [B, 1, convC]
    new_conv_state = window[:, 1:, :]

    xs = xBC[..., :d_ssm]
    Bm = xBC[..., d_ssm:d_ssm + n_groups * d_state]
    Cm = xBC[..., d_ssm + n_groups * d_state:]

    dt = jax.nn.softplus(dt.astype(jnp.float32)
                         + p["dt_bias"].astype(jnp.float32))[:, 0]  # [B,H]
    dt = jnp.clip(dt, time_step_limit[0], time_step_limit[1])
    A = -jnp.exp(p["A_log"].astype(jnp.float32))         # [H]

    xs = xs.reshape(bsz, n_heads, head_dim)
    rep = n_heads // n_groups
    Bm = jnp.repeat(Bm.reshape(bsz, n_groups, d_state), rep, axis=1)
    Cm = jnp.repeat(Cm.reshape(bsz, n_groups, d_state), rep, axis=1)

    decay = jnp.exp(A[None, :] * dt)                     # [B, H]
    xd = xs * dt[..., None]                              # [B, H, P]
    new_ssm = ssm_state * decay[:, :, None, None] \
        + xd[..., None] * Bm[:, :, None, :]              # [B, H, P, N]
    y = jnp.einsum("bhn,bhpn->bhp", Cm, new_ssm)
    y = y + xs * p["D"].astype(jnp.float32)[None, :, None]
    y = y.reshape(bsz, 1, d_ssm)

    out = _gate_norm_out(y, gate, p, dtype, rms_norm_weight, rms_norm_eps)
    return out, (new_conv_state, new_ssm)
