"""Tracing / profiling hooks.

Parity target: the reference's profiling surface (reference:
scripts/profile_startup.py — the import-latency gate — plus the
UNSLOTH_ENABLE_LOGGING verbose paths). TPU-native form: jax.profiler
traces (viewable in TensorBoard/XProf/Perfetto), a step timer that
syncs correctly on the remote-TPU platform, and a measured import-time
report."""

from __future__ import annotations

import contextlib
import os
import subprocess
import sys
import time
from typing import Any, Callable, Dict, Optional


@contextlib.contextmanager
def trace(logdir: str = "profile_trace", create_perfetto_link: bool = False):
    """jax.profiler trace context; open the result in TensorBoard/XProf."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def time_step(fn: Callable, *args, n: int = 5, warmup: int = 2,
              **kwargs) -> Dict[str, float]:
    """Wall-time a jitted step correctly: on the tunneled-TPU platform
    block_until_ready is a no-op, so we sync by fetching a scalar from the
    result (the CLAUDE.md gotcha)."""
    import jax
    import jax.numpy as jnp

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(jnp.asarray(leaf).astype(jnp.float32)))

    for _ in range(warmup):
        out = fn(*args, **kwargs)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kwargs)
    sync(out)
    dt = (time.perf_counter() - t0) / n
    return {"mean_s": dt, "steps": n}


def measure_import_time(module: str = "unsloth_tpu",
                        extra_env: Optional[Dict[str, str]] = None
                        ) -> float:
    """Cold-import latency of the package in a fresh interpreter
    (reference: scripts/profile_startup.py gates this in CI)."""
    env = dict(os.environ)
    env.update(extra_env or {})
    code = (
        "import time; t0 = time.perf_counter(); "
        f"import {module}; "
        "print(time.perf_counter() - t0)"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-1000:])
    return float(out.stdout.strip().splitlines()[-1])
