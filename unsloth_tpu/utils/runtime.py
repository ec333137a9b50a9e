"""Runtime utilities: worker sizing, device memory stats, telemetry.

Parity targets: reference dataset_num_proc.py (cgroup-aware `num_proc` for
datasets.map, :512), `get_gpu_memory_stats` (__init__.py:1457), and the
anonymous telemetry hook (`get_statistics`, models/_utils.py:2611 — a
no-op here; this framework phones nothing home).
"""

from __future__ import annotations

import os
from typing import Dict, Optional


def _cgroup_cpu_quota() -> Optional[float]:
    """Effective CPU quota from cgroup v2 (cpu.max) or v1, if any
    (reference: dataset_num_proc.py:169)."""
    try:
        with open("/sys/fs/cgroup/cpu.max") as f:
            quota, period = f.read().split()
        if quota != "max":
            return float(quota) / float(period)
    except OSError:
        pass
    try:
        with open("/sys/fs/cgroup/cpu/cpu.cfs_quota_us") as f:
            quota = int(f.read())
        with open("/sys/fs/cgroup/cpu/cpu.cfs_period_us") as f:
            period = int(f.read())
        if quota > 0:
            return quota / period
    except OSError:
        pass
    return None


def get_dataset_num_proc(default_cap: int = 8) -> int:
    """Worker count for datasets.map: env override, else cgroup-aware CPU
    count capped (reference: dataset_num_proc.py:512 + env
    UNSLOTH_DATASET_NUM_PROC)."""
    env_val = os.environ.get("UNSLOTH_DATASET_NUM_PROC")
    if env_val:
        try:
            return max(1, int(env_val))
        except ValueError:
            pass
    quota = _cgroup_cpu_quota()
    cpus = os.cpu_count() or 1
    if quota is not None:
        cpus = max(1, min(cpus, int(quota)))
    return max(1, min(cpus - 1, default_cap))


def get_device_memory_stats() -> Dict[str, float]:
    """Per-device memory stats in GB (reference: get_gpu_memory_stats,
    __init__.py:1457). Uses jax memory_stats when the backend exposes it."""
    import jax

    out = {}
    for d in jax.devices():
        stats = d.memory_stats() if hasattr(d, "memory_stats") else None
        if stats:
            out[str(d)] = {
                "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 1e9,
                "bytes_limit_gb": stats.get("bytes_limit", 0) / 1e9,
                "peak_bytes_gb": stats.get("peak_bytes_in_use", 0) / 1e9,
            }
        else:
            out[str(d)] = {}
    return out


def get_statistics(*args, **kwargs) -> None:
    """Telemetry no-op. The reference pings a HF repo download counter as
    anonymous install telemetry (models/_utils.py:2611-2620); this
    framework intentionally does not."""
    return None
