"""TPU-native kernel suite.

Pallas/XLA replacements for the reference Triton kernel layer
(reference: unsloth/kernels/__init__.py:15-63 public surface).
"""

from .activations import geglu_approx, geglu_exact, glu_for, gpt_oss_glu, swiglu
from .attention import attention, attention_ref, packed_segment_bound
from .packed_attention import packed_flash_attention, segment_block_metadata
from .cross_entropy import (cross_entropy_per_row, cross_entropy_ref,
                            fast_cross_entropy_loss)
from .fused_ce_linear import fused_ce_loss_mean, fused_linear_cross_entropy
from .lora import (DoRAWeights, LoRAWeights, base_matmul, init_lora,
                   lora_matmul, merge_lora, to_dora)
from .nf4 import NF4Tensor, dequantize_nf4, nf4_matmul_ref, quantize_nf4
from .rms_norm import layer_norm_ref, rms_norm, rms_norm_ref
from .rope import apply_rope, apply_rope_qk, rope_inv_freq, rope_table

__all__ = [
    "attention", "attention_ref", "packed_segment_bound",
    "packed_flash_attention", "segment_block_metadata",
    "cross_entropy_per_row", "cross_entropy_ref", "fast_cross_entropy_loss",
    "fused_ce_loss_mean", "fused_linear_cross_entropy",
    "LoRAWeights", "base_matmul", "init_lora", "lora_matmul", "merge_lora",
    "NF4Tensor", "dequantize_nf4", "nf4_matmul_ref", "quantize_nf4",
    "layer_norm_ref", "rms_norm", "rms_norm_ref",
    "apply_rope", "apply_rope_qk", "rope_inv_freq", "rope_table",
    "swiglu", "geglu_exact", "geglu_approx", "gpt_oss_glu", "glu_for",
]
