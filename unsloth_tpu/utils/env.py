"""Environment-flag configuration system.

The reference exposes ~60 ``UNSLOTH_*`` environment variables as its feature-flag
system (see /root/reference SURVEY §5 "Config / flag system"; e.g.
``UNSLOTH_RETURN_LOGITS``, ``UNSLOTH_FORCE_FLOAT32``, ``UNSLOTH_COMPILE_DISABLE``).
We keep the same names where the semantics carry over so user scripts port
unchanged, and add TPU-specific ones under the same prefix.

All flags are read lazily so tests can monkeypatch ``os.environ``.
"""

from __future__ import annotations

import os
from typing import Optional

_TRUTHY = {"1", "true", "yes", "on"}
_FALSY = {"0", "false", "no", "off", ""}


def env_flag(name: str, default: bool = False) -> bool:
    """Read a boolean env flag. Unset -> default."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    raw = raw.strip().lower()
    if raw in _TRUTHY:
        return True
    if raw in _FALSY:
        return False
    return default


def env_int(name: str, default: int) -> int:
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        return int(raw)
    except ValueError:
        return default


def env_float(name: str, default: float) -> float:
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        return float(raw)
    except ValueError:
        return default


def env_str(name: str, default: Optional[str] = None) -> Optional[str]:
    return os.environ.get(name, default)


# ---------------------------------------------------------------------------
# Well-known flags (mirroring the reference's flag surface where applicable).
# ---------------------------------------------------------------------------

def return_logits() -> bool:
    """UNSLOTH_RETURN_LOGITS: force materializing full logits instead of the
    fused linear+CE path (reference: models/llama.py:1454-1509)."""
    return env_flag("UNSLOTH_RETURN_LOGITS")


def return_hidden_states() -> bool:
    """UNSLOTH_RETURN_HIDDEN_STATES: skip lm_head; used by GRPO chunked
    logprob computation (reference: models/llama.py:1442-1451)."""
    return env_flag("UNSLOTH_RETURN_HIDDEN_STATES")


def force_float32() -> bool:
    """UNSLOTH_FORCE_FLOAT32: run the whole model in fp32 (debugging)."""
    return env_flag("UNSLOTH_FORCE_FLOAT32")


def disable_pallas() -> bool:
    """UNSLOTH_DISABLE_PALLAS: fall back to pure-jnp reference ops everywhere.

    TPU-native analog of the reference's UNSLOTH_COMPILE_DISABLE."""
    return env_flag("UNSLOTH_DISABLE_PALLAS")


def pallas_norm() -> bool:
    """UNSLOTH_PALLAS_NORM: opt into the standalone Pallas RMSNorm/LayerNorm
    kernels instead of the XLA-fused jnp path.

    Measured r5 (bench_artifacts/r5/ln_crossover.jsonl): at the llama-8B
    8K hot-path shape the Pallas norm fwd+bwd is 2.1x SLOWER than XLA's
    fused jnp version (1189us vs 567us per norm) because the pallas_call
    is a fusion boundary — XLA fuses the jnp norm into the surrounding
    residual adds and matmul epilogues. The only measured Pallas win is
    LayerNorm at the MiniLM shape (0.89x) — small against the 1.5-2.1x
    losses at the llama hot path, so jnp is the default."""
    return env_flag("UNSLOTH_PALLAS_NORM")


def enable_logging() -> bool:
    """UNSLOTH_ENABLE_LOGGING: verbose mode (reference flag of same name)."""
    return env_flag("UNSLOTH_ENABLE_LOGGING")


def is_tpu_available() -> bool:
    import jax

    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def default_backend_is_tpu() -> bool:
    import jax

    try:
        plat = jax.default_backend()
    except Exception:
        return False
    return plat not in ("cpu", "gpu", "cuda", "rocm")
