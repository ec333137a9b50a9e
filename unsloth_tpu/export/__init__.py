from .save import (load_lora, merged_params, save_lora,
                   save_pretrained_merged)

__all__ = ["save_pretrained_merged", "save_lora", "load_lora",
           "merged_params"]
