from . import env
from .dtypes import DTypePolicy, canonical_dtype

__all__ = ["env", "DTypePolicy", "canonical_dtype"]
