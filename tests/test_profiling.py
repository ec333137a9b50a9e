"""Profiling hooks + import-latency gate (reference:
scripts/profile_startup.py)."""

import os

import pytest

from unsloth_tpu.utils.profiling import (annotate, measure_import_time,
                                         time_step, trace)


def test_time_step_reports_sane_timing():
    import jax.numpy as jnp

    def step(x):
        return x * 2.0

    out = time_step(step, jnp.ones((64, 64)), n=3, warmup=1)
    assert out["mean_s"] > 0


def test_trace_writes_artifacts(tmp_path):
    import jax
    import jax.numpy as jnp

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        with annotate("matmul"):
            x = jnp.ones((128, 128))
            (x @ x).block_until_ready()
    files = []
    for root, _, names in os.walk(logdir):
        files.extend(names)
    assert files, "profiler produced no artifacts"


@pytest.mark.slow
def test_import_latency_gate():
    """Cold import of the package must stay snappy (the facade is lazy;
    heavy deps load on first use). Threshold is generous for CI noise."""
    t = measure_import_time("unsloth_tpu",
                            extra_env={"JAX_PLATFORMS": "cpu"})
    assert t < 20.0, f"import took {t:.1f}s"
