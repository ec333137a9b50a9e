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

# FastTextModel is the reference's alias for text-only FastModel
# (reference: models/loader.py:2158).
FastTextModel = FastLanguageModel


def __getattr__(name):
    # heavyweight facades load lazily (they pull vision/audio deps)
    if name == "FastVisionModel":
        from .models.vision import FastVisionModel

        return FastVisionModel
    if name == "FastSentenceTransformer":
        from .models.sentence_transformer import FastSentenceTransformer

        return FastSentenceTransformer
    if name == "FastDiffusionModel":
        from .models.diffusion import FastDiffusionModel

        return FastDiffusionModel
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def is_bfloat16_supported() -> bool:
    """Reference-parity helper (reference: _gpu_init.py bf16 probe
    :286-309). Always true on TPU."""
    return True


__all__ = [
    "ModelConfig",
    "RopeScaling",
    "FastLanguageModel",
    "FastModel",
    "FastTextModel",
    "FastVisionModel",
    "FastSentenceTransformer",
    "FastDiffusionModel",
    "LanguageModel",
    "create_mesh",
    "ShardingRules",
    "is_bfloat16_supported",
    "__version__",
]
