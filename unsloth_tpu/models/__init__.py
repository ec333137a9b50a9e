from .config import ModelConfig, RopeScaling
from .decoder import forward, logits_fn, loss_fn
from .params import (count_params, init_lora_tree, init_params,
                     quantize_params)

__all__ = [
    "ModelConfig", "RopeScaling",
    "forward", "logits_fn", "loss_fn",
    "init_params", "init_lora_tree", "quantize_params", "count_params",
]
