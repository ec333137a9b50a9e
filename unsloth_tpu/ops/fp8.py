"""FP8 block quantization.

Parity target: reference unsloth/kernels/fp8.py — block-dequant kernel
(:80), `w8a8_block_fp8_matmul` Triton GEMM (:175-323), `FP8BlockQuantLinear`
(:374) — used to load DeepSeek-style FP8 checkpoints and to quantize
on the fly.

TPU design: weights are stored as float8_e4m3fn with per-(128,128)-block
fp32 scales (the DeepSeek/vLLM block format, so FP8 HF checkpoints load
directly: `weight` fp8 + `weight_scale_inv` fp32). v5e has no FP8 MXU, so
compute upcasts tiles to bf16 — the value is the 1 byte/param storage and
checkpoint compatibility; on FP8-capable TPUs the same layout feeds the
MXU natively.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

FP8_DTYPE = jnp.float8_e4m3fn
FP8_MAX = 448.0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FP8Tensor:
    values: jnp.ndarray       # fp8 [out, in]
    scales: jnp.ndarray       # fp32 [ceil(out/B), ceil(in/B)]
    shape: Tuple[int, int]
    block: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    def tree_flatten(self):
        return (self.values, self.scales), (self.shape, self.block,
                                            self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @property
    def nbytes(self):
        return self.values.size + self.scales.size * 4


def quantize_fp8_block(w: jnp.ndarray, block: int = 128,
                       dtype=jnp.bfloat16) -> FP8Tensor:
    out_f, in_f = w.shape
    pb_o = -(-out_f // block)
    pb_i = -(-in_f // block)
    wp = jnp.pad(w.astype(jnp.float32),
                 ((0, pb_o * block - out_f), (0, pb_i * block - in_f)))
    blocks = wp.reshape(pb_o, block, pb_i, block)
    amax = jnp.max(jnp.abs(blocks), axis=(1, 3))          # [pb_o, pb_i]
    scale = jnp.where(amax == 0, 1.0, amax / FP8_MAX)
    scaled = blocks / scale[:, None, :, None]
    vals = scaled.reshape(pb_o * block, pb_i * block)[
        :out_f, :in_f].astype(FP8_DTYPE)
    return FP8Tensor(values=vals, scales=scale.astype(jnp.float32),
                     shape=(out_f, in_f), block=block, dtype=dtype)


def dequantize_fp8(q: FP8Tensor, dtype=None) -> jnp.ndarray:
    dtype = dtype or q.dtype
    out_f, in_f = q.shape
    b = q.block
    scale_up = jnp.repeat(jnp.repeat(q.scales, b, axis=0), b, axis=1)
    scale_up = scale_up[:out_f, :in_f]
    return (q.values.astype(jnp.float32) * scale_up).astype(dtype)


def fp8_matmul_ref(x: jnp.ndarray, q: FP8Tensor) -> jnp.ndarray:
    """x @ W^T, W stored FP8-blocked."""
    w = dequantize_fp8(q, x.dtype)
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype)


def load_fp8_checkpoint_tensor(weight_fp8, weight_scale_inv,
                               block: int = 128,
                               dtype=jnp.bfloat16) -> FP8Tensor:
    """Wrap a DeepSeek/vLLM-format FP8 checkpoint pair
    (weight [out,in] fp8, weight_scale_inv [out/B, in/B] fp32)."""
    w = jnp.asarray(weight_fp8)
    s = jnp.asarray(weight_scale_inv, jnp.float32)
    return FP8Tensor(values=w.astype(FP8_DTYPE), scales=s,
                     shape=tuple(w.shape), block=block, dtype=dtype)
