"""Dtype policy for TPU training.

TPU-first stance: parameters and activations in bfloat16 (MXU-native), with
fp32 "islands" where the reference keeps fp32 for numerical stability:
  * RMSNorm / LayerNorm statistics (reference: kernels/rms_layernorm.py keeps
    fp32 accumulation; Gemma does the whole norm in fp32).
  * RoPE cos/sin tables (reference: models/gemma.py forces fp32 RoPE).
  * Cross-entropy / logsumexp (reference: kernels/cross_entropy_loss.py).
  * Optimizer state (fp32 master params optional).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from . import env


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Bundle of dtypes used across the model."""

    param_dtype: Any = jnp.bfloat16      # stored parameters
    compute_dtype: Any = jnp.bfloat16    # matmul inputs
    norm_dtype: Any = jnp.float32        # normalization statistics
    loss_dtype: Any = jnp.float32        # CE / logsumexp accumulation
    rope_dtype: Any = jnp.float32        # cos/sin tables

    @classmethod
    def default(cls) -> "DTypePolicy":
        if env.force_float32():
            return cls(param_dtype=jnp.float32, compute_dtype=jnp.float32)
        return cls()

    @classmethod
    def float32(cls) -> "DTypePolicy":
        return cls(param_dtype=jnp.float32, compute_dtype=jnp.float32)


def canonical_dtype(name: Any):
    """Map user-facing dtype spec (str / torch-style / jnp) to a jnp dtype."""
    if name is None:
        return None
    if isinstance(name, str):
        name = name.replace("torch.", "")
        table = {
            "float32": jnp.float32,
            "fp32": jnp.float32,
            "float16": jnp.float16,
            "fp16": jnp.float16,
            "half": jnp.float16,
            "bfloat16": jnp.bfloat16,
            "bf16": jnp.bfloat16,
            "int8": jnp.int8,
            "uint8": jnp.uint8,
        }
        if name not in table:
            raise ValueError(f"Unknown dtype spec: {name!r}")
        return table[name]
    return jnp.dtype(name)
