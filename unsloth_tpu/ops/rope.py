"""Rotary position embeddings.

Parity with the reference (unsloth/kernels/rope_embedding.py — fused Q+K
rotate-half kernel with optional per-row rope indices for packed sequences;
rotary classes in models/llama.py:1760-2149 for default/linear/dynamic-NTK/
llama3/yarn/longrope scaling).

TPU design: the cos/sin tables are tiny and the rotation is elementwise, so
XLA fuses `apply_rope` into neighboring ops on its own; the win the Triton
kernel buys on GPU (one launch for Q+K, in-place) is the default behavior
under XLA. We therefore implement RoPE as jnp with fp32 tables and focus
Pallas effort on ops XLA can't fuse (attention, fused CE, NF4 matmul).

Layout convention: q, k are [B, T, H, Dh] (head dim last, heads second-to-
last), positions are [B, T] int32. Rotate-half convention matches HF/llama:
head dim split into two halves (x1, x2) -> (x1*cos - x2*sin, x2*cos + x1*sin).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from ..models.config import RopeScaling


def rope_inv_freq(head_dim: int, theta: float, scaling: Optional[RopeScaling] = None,
                  rotary_dim: Optional[int] = None) -> jnp.ndarray:
    """Compute inverse frequencies [rotary_dim/2] in fp32, applying the
    rope_type-specific frequency corrections (llama3/yarn/longrope).

    (reference: models/llama.py LlamaRotaryEmbedding family :1760-2149)
    """
    rotary_dim = rotary_dim or head_dim
    exponent = jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim
    inv_freq = 1.0 / (theta ** exponent)
    if scaling is None or scaling.rope_type in ("default", "dynamic"):
        return inv_freq

    if scaling.rope_type == "linear":
        return inv_freq / scaling.factor

    if scaling.rope_type == "llama3":
        # Llama-3.1 frequency-dependent scaling.
        low_wavelen = scaling.original_max_position_embeddings / scaling.low_freq_factor
        high_wavelen = scaling.original_max_position_embeddings / scaling.high_freq_factor
        wavelen = 2.0 * math.pi / inv_freq
        scaled = inv_freq / scaling.factor
        smooth = (scaling.original_max_position_embeddings / wavelen
                  - scaling.low_freq_factor) / (
            scaling.high_freq_factor - scaling.low_freq_factor)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        mid = (1.0 - smooth) * scaled + smooth * inv_freq
        out = jnp.where(wavelen > low_wavelen, scaled, inv_freq)
        out = jnp.where(
            (wavelen <= low_wavelen) & (wavelen >= high_wavelen), mid, out)
        return out

    if scaling.rope_type == "yarn":
        # YaRN: interpolate low-freq dims, keep high-freq dims.
        dim = rotary_dim
        base = theta
        orig = scaling.original_max_position_embeddings

        def find_dim(num_rot):
            return (dim * math.log(orig / (num_rot * 2 * math.pi))) / (
                2 * math.log(base))

        low = max(math.floor(find_dim(scaling.beta_fast)), 0)
        high = min(math.ceil(find_dim(scaling.beta_slow)), dim - 1)
        rng = jnp.arange(dim // 2, dtype=jnp.float32)
        ramp = jnp.clip((rng - low) / max(high - low, 1e-3), 0.0, 1.0)
        inv_extrap = inv_freq
        inv_interp = inv_freq / scaling.factor
        return inv_interp * ramp + inv_extrap * (1.0 - ramp)

    if scaling.rope_type == "longrope":
        factors = scaling.long_factor or scaling.short_factor
        if factors is not None:
            return inv_freq / jnp.asarray(factors, dtype=jnp.float32)
        return inv_freq

    return inv_freq


def yarn_attention_factor(scaling: RopeScaling) -> float:
    if scaling.rope_type != "yarn":
        return 1.0
    if scaling.attention_factor is not None:
        return float(scaling.attention_factor)
    return float(0.1 * math.log(scaling.factor) + 1.0)


def rope_table(positions: jnp.ndarray, inv_freq: jnp.ndarray,
               attn_factor: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for given positions. positions: [...]; returns
    cos,sin of shape [..., rotary_dim/2] in fp32."""
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(freqs) * attn_factor, jnp.sin(freqs) * attn_factor


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate-half RoPE. x: [B, T, H, Dh]; cos/sin: [B, T, Dh/2] (or
    broadcastable). Partial-rotary: if cos covers fewer dims than Dh/2,
    the tail of the head dim is passed through unrotated."""
    rot = cos.shape[-1] * 2
    dtype = x.dtype
    x_rot = x[..., :rot].astype(jnp.float32)
    x1, x2 = jnp.split(x_rot, 2, axis=-1)
    c = cos[..., None, :]  # [B, T, 1, rot/2]
    s = sin[..., None, :]
    r1 = x1 * c - x2 * s
    r2 = x2 * c + x1 * s
    out = jnp.concatenate([r1, r2], axis=-1).astype(dtype)
    if rot == x.shape[-1]:
        return out
    return jnp.concatenate([out, x[..., rot:]], axis=-1)


def apply_rope_qk(q, k, cos, sin):
    """Fused-API parity with the reference's single-launch Q+K kernel
    (reference: kernels/rope_embedding.py:23-98 `_rope_embedding_QK`)."""
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin)
