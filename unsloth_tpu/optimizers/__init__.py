from .galore import GaloreState, galore, state_memory_ratio

__all__ = ["galore", "GaloreState", "state_memory_ratio"]
