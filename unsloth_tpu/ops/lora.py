"""LoRA linear ops over dense or NF4-quantized base weights.

Parity target: the reference's ``matmul_lora`` (kernels/utils.py:1128-1170 —
dequant -> matmul -> addmm_ LoRA epilogue) and the fused LoRA autograd
functions (kernels/fast_lora.py: LoRA_MLP / LoRA_QKV / LoRA_W) whose purpose
on GPU is to (a) dequantize each base W once per projection in fwd and bwd
and (b) compute dA, dB via addmm with alpha=scale.

TPU design: LoRA math is three MXU matmuls; XLA already schedules and fuses
them, and the backward it derives is exactly the hand-written one in
fast_lora.py (dA = s·(gᵀX)ᵀ... via transpose rules), so no custom_vjp is
needed for the dense path. The value we add is the *quantized* path: the base
weight stays NF4-packed in HBM and is dequantized on the fly (in-kernel once
the Pallas qlora matmul lands), while gradients flow only to A/B — the base
matmul is wrapped in `stop_gradient` semantics by virtue of the NF4 pytree
being non-differentiable (integer leaves).

Conventions (HF/peft): W [out, in]; lora_A [r, in]; lora_B [out, r];
scale = lora_alpha / r (rslora: lora_alpha / sqrt(r)).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp

from .nf4 import NF4Tensor, dequantize_nf4


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class LoRAWeights:
    a: jnp.ndarray  # [r, in]
    b: jnp.ndarray  # [out, r]
    scale: float    # static

    def tree_flatten(self):
        return (self.a, self.b), (self.scale,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DoRAWeights(LoRAWeights):
    """DoRA (arXiv:2402.09353): W' = m ⊙ (W + s·BA) / ||W + s·BA||_row.

    The reference reaches DoRA through peft's ``use_dora=True`` kwarg
    (models/llama.py:3149 — arrives via **kwargs); here it is a pytree
    variant the same `lora_matmul` dispatches on. `m` [out] is trainable;
    the row norm is stop-gradiented (the DoRA paper's detach trick)."""

    m: jnp.ndarray = None  # [out] magnitude

    def tree_flatten(self):
        return (self.a, self.b, self.m), (self.scale,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], children[2])


BaseWeight = Union[jnp.ndarray, NF4Tensor, "FP8Tensor"]  # noqa: F821


def _dense_f32(w: BaseWeight) -> jnp.ndarray:
    if isinstance(w, NF4Tensor):
        return dequantize_nf4(w, dtype=jnp.float32)
    if hasattr(w, "scales"):  # FP8Tensor
        from .fp8 import dequantize_fp8

        return dequantize_fp8(w, dtype=jnp.float32)
    return w.astype(jnp.float32)


def dora_weight_norm(w: BaseWeight, lora: LoRAWeights,
                     eps: float = 1e-12) -> jnp.ndarray:
    """Row norms of (W + scale·B@A) WITHOUT materializing the [out,in]
    delta: ||W_i||² + 2s·W_i·(BA)_i + s²·||(BA)_i||² via [out,r]-shaped
    intermediates (W@Aᵀ and B@(AAᵀ)).

    The dense base is materialized in bfloat16 (a full-f32 dequant temp
    inside every training-step jit is exactly the dense-dequant HLO-temp
    class that OOMs 8B/8K configs); the reductions over it accumulate in
    f32 via preferred_element_type, so the norm keeps f32 accuracy."""
    if isinstance(w, jnp.ndarray) and w.dtype == jnp.float32:
        wd = w
    elif isinstance(w, NF4Tensor):
        wd = dequantize_nf4(w, dtype=jnp.bfloat16)
    elif hasattr(w, "scales"):  # FP8Tensor
        from .fp8 import dequantize_fp8

        wd = dequantize_fp8(w, dtype=jnp.bfloat16)
    else:
        wd = w
    a = lora.a.astype(jnp.float32)
    b = lora.b.astype(jnp.float32)
    s = lora.scale
    f32 = jnp.float32
    w_sq = jnp.einsum("oi,oi->o", wd, wd, preferred_element_type=f32)
    wa = jnp.einsum("oi,ri->or", wd, a.astype(wd.dtype),
                    preferred_element_type=f32)
    cross = jnp.sum(wa * b, axis=1)
    ba_sq = jnp.sum((b @ (a @ a.T)) * b, axis=1)
    return jnp.sqrt(jnp.maximum(w_sq + 2.0 * s * cross + s * s * ba_sq,
                                eps))


def to_dora(w: BaseWeight, lora: LoRAWeights) -> DoRAWeights:
    """Attach the DoRA magnitude, initialized so the initial forward is
    exactly the plain-LoRA one (m = ||W + s·BA||_row; with zero-init B
    this is ||W||_row, matching peft's dora init)."""
    m = dora_weight_norm(w, lora)
    return DoRAWeights(a=lora.a, b=lora.b, scale=lora.scale, m=m)


def base_matmul(x: jnp.ndarray, w: BaseWeight) -> jnp.ndarray:
    """x @ W.T for dense or NF4 base weight. Output in x.dtype.

    NF4 path: fused dequant-inside-matmul Pallas kernel when eligible
    (qlora_matmul.py); falls back to dequantize-then-matmul (XLA)."""
    if isinstance(w, NF4Tensor):
        from .qlora_matmul import nf4_matmul, use_fused_nf4

        m = 1
        for s in x.shape[:-1]:
            m *= s
        # At small row counts the in-kernel dequant (VPU-bound) dominates
        # and XLA's dequant+matmul wins; the fused kernel wins from ~1-2k
        # rows where one weight pass serves many row tiles.
        if m >= 1024 and use_fused_nf4(w):
            return nf4_matmul(x, w)
        wd = dequantize_nf4(w, dtype=x.dtype)
    elif hasattr(w, "scales"):  # FP8Tensor
        from .fp8 import dequantize_fp8
        from .fp8_matmul import fp8_matmul, use_fused_fp8

        if use_fused_fp8(w):  # opt-in: UNSLOTH_FUSED_FP8=1
            return fp8_matmul(x, w)
        wd = dequantize_fp8(w, dtype=x.dtype)
    else:
        wd = w.astype(x.dtype)
    return jax.lax.dot_general(
        x, wd,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype,
    )


def lora_matmul(
    x: jnp.ndarray,
    w: BaseWeight,
    lora: Optional[LoRAWeights] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """y = x @ W.T (+ bias) (+ scale * (x @ A.T) @ B.T).

    DoRAWeights adapters additionally rescale the (base + delta) rows by
    m / ||W + s·BA||_row before the bias (the bias is outside the
    decomposed weight)."""
    is_dora = isinstance(lora, DoRAWeights)
    y = base_matmul(x, w)
    if bias is not None and not is_dora:
        y = y + bias.astype(y.dtype)
    if lora is not None:
        xa = jax.lax.dot_general(
            x, lora.a,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=x.dtype,
        )
        y = y + lora.scale * jax.lax.dot_general(
            xa, lora.b,
            dimension_numbers=(((xa.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=x.dtype,
        )
    if is_dora:
        c = jax.lax.stop_gradient(dora_weight_norm(w, lora))
        y = y * (lora.m / c).astype(y.dtype)
        if bias is not None:
            y = y + bias.astype(y.dtype)
    return y


def init_lora(key, in_features: int, out_features: int, r: int,
              alpha: float, dtype=jnp.float32, use_rslora: bool = False
              ) -> LoRAWeights:
    """Kaiming-uniform A, zero B (peft init convention)."""
    bound = (1.0 / in_features) ** 0.5 * (3.0 ** 0.5)
    a = jax.random.uniform(key, (r, in_features), dtype=jnp.float32,
                           minval=-bound, maxval=bound).astype(dtype)
    b = jnp.zeros((out_features, r), dtype=dtype)
    scale = alpha / (r ** 0.5) if use_rslora else alpha / r
    return LoRAWeights(a=a, b=b, scale=scale)


def merge_lora(w: BaseWeight, lora: LoRAWeights,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dequant-if-needed and merge: W' = W + scale * B @ A in fp32
    (reference: save.py:608 `_merge_lora` merges in fp32 then casts).
    DoRA merges the full decomposition m ⊙ (W + s·BA) / ||·||_row."""
    if isinstance(w, NF4Tensor):
        wd = dequantize_nf4(w, dtype=jnp.float32)
    else:
        wd = w.astype(jnp.float32)
    delta = lora.scale * jnp.dot(
        lora.b.astype(jnp.float32), lora.a.astype(jnp.float32),
        preferred_element_type=jnp.float32)
    merged = wd + delta
    if isinstance(lora, DoRAWeights):
        c = jnp.linalg.norm(merged, axis=1, keepdims=True)
        merged = merged * (lora.m.astype(jnp.float32)[:, None]
                           / jnp.maximum(c, 1e-12))
    return merged.astype(dtype)
