from .decode import KVCache, forward_with_cache, init_cache, \
    logits_from_hidden
from .generate import SamplingParams, generate

__all__ = ["KVCache", "forward_with_cache", "init_cache",
           "logits_from_hidden", "SamplingParams", "generate"]
