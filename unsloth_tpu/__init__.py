"""unsloth_tpu — TPU-native fine-tuning framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of unslothai/unsloth
(reference mounted at /root/reference): QLoRA/LoRA fine-tuning, fused
kernels, sequence packing, chat templates, GRPO, and GGUF/safetensors
export — designed for TPU (SPMD meshes, functional transforms, Pallas
kernels) rather than ported from CUDA.

Public surface mirrors the reference's (reference: unsloth/models/__init__.py
FastLanguageModel / FastModel / get_peft_model / ...) so user scripts port
with an import swap.
"""

__version__ = "0.1.0"

from .models.config import ModelConfig, RopeScaling
from .models.loader import FastLanguageModel, FastModel, LanguageModel
from .parallel.mesh import create_mesh, ShardingRules
from .utils import env as _env


def is_bfloat16_supported() -> bool:
    """Reference-parity helper (reference: _gpu_init.py bf16 probe
    :286-309). Always true on TPU."""
    return True


__all__ = [
    "ModelConfig",
    "RopeScaling",
    "FastLanguageModel",
    "FastModel",
    "LanguageModel",
    "create_mesh",
    "ShardingRules",
    "is_bfloat16_supported",
    "__version__",
]
