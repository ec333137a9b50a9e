"""QAT (quantization-aware training) weight fake-quantization.

Parity target: the reference's QAT path — `qat_scheme` on
`get_peft_model` fake-quantizes the FROZEN base so LoRA learns to
compensate the quantization error and the post-training quantized export
degrades less (reference: models/_utils.py:3828 `_prepare_model_for_qat`
with torchao schemes "int4" / "int8-int4" / "fp8-int4" / "fp8-fp8" /
"phone-deployment"; the kernel layer resolves fake-quant state at
kernels/utils.py:335-397).

TPU-native form: because the base is frozen in QLoRA, simulating
quantization *per step* is mathematically identical to applying the
weight fake-quant ONCE at setup — dequant(quant(W)) replaces W in the
param pytree, so there is no per-step overhead and no straight-through
estimator is needed (the STE only matters for trainable quantized
weights, i.e. full-FT QAT). Dynamic ACTIVATION quantization of the
deployment target is a serving-side concern handled by the
compressed-tensors exporter's calibration (export/compressed.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

QAT_SCHEMES = ("int4", "int8-int4", "fp8-int4", "fp8-fp8",
               "phone-deployment")


def fake_quant_int4(w: jnp.ndarray, group_size: int = 128) -> jnp.ndarray:
    """Symmetric per-group int4 [-8, 7], groups along the in dim
    (torchao Int4 groupwise semantics; group_size=128 as the reference
    configures)."""
    out_f, in_f = w.shape
    if in_f % group_size:
        group_size = in_f          # small dims: one group per row
    wf = w.astype(jnp.float32).reshape(out_f, in_f // group_size,
                                       group_size)
    scale = jnp.max(jnp.abs(wf), axis=-1, keepdims=True) / 7.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(wf / scale), -8, 7)
    return (q * scale).reshape(out_f, in_f).astype(w.dtype)


def fake_quant_int8_rowwise(w: jnp.ndarray) -> jnp.ndarray:
    """Symmetric per-row int8 (torchao IntxWeightOnly PerAxis(0))."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-1, keepdims=True) / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(wf / scale), -128, 127)
    return (q * scale).astype(w.dtype)


def fake_quant_fp8_rowwise(w: jnp.ndarray) -> jnp.ndarray:
    """Per-row-scaled e4m3 cast and back (torchao Float8 PerRow)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 448.0)
    q = (wf / scale).astype(jnp.float8_e4m3fn).astype(jnp.float32)
    return (q * scale).astype(w.dtype)


_LINEAR_KEYS = ("q", "k", "v", "o", "gate", "up", "down",
                "q_a", "q_b", "kv_a", "kv_b")


def _scheme_fns(scheme: str):
    if scheme == "phone-deployment":
        scheme = "int8-int4"
    if scheme == "int4":
        return fake_quant_int4, None
    if scheme == "int8-int4":
        return fake_quant_int4, fake_quant_int8_rowwise
    if scheme == "fp8-int4":
        return fake_quant_int4, None
    if scheme == "fp8-fp8":
        return fake_quant_fp8_rowwise, None
    raise ValueError(
        f"unknown qat_scheme {scheme!r}; allowed: {QAT_SCHEMES}")


def apply_qat(params: Dict[str, Any], scheme: str) -> Dict[str, Any]:
    """Return params with every dense linear (and, for int8-int4, the
    embeddings) replaced by its fake-quantized self. NF4/FP8-quantized
    leaves are left alone (they are already true quantized storage)."""
    lin_fn, emb_fn = _scheme_fns(scheme)

    def is_dense_2d(x):
        return isinstance(x, jnp.ndarray) and x.ndim == 2

    out = dict(params)
    if emb_fn is not None:
        for k in ("embed", "lm_head"):
            if k in out and is_dense_2d(out[k]):
                out[k] = emb_fn(out[k])
    new_layers = []
    for layer in params.get("layers", []):
        nl = dict(layer)
        for k, v in layer.items():
            if k in _LINEAR_KEYS and is_dense_2d(v):
                nl[k] = lin_fn(v)
        new_layers.append(nl)
    out["layers"] = new_layers
    return out
