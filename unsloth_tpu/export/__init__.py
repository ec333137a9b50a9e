from .save import (load_lora, merged_params, push_to_hub_gguf,
                   push_to_hub_lora, push_to_hub_merged, save_lora,
                   save_pretrained_merged)
from .gguf import save_lora_gguf, save_pretrained_gguf, save_to_gguf
from .gguf_loader import load_gguf

__all__ = ["save_pretrained_merged", "save_lora", "load_lora",
           "merged_params", "save_lora_gguf", "save_pretrained_gguf",
           "save_to_gguf", "load_gguf", "push_to_hub_merged",
           "push_to_hub_gguf", "push_to_hub_lora"]
