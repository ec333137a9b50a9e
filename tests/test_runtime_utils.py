"""Runtime utils tests (reference: dataset_num_proc.py, memory stats)."""

import os

from unsloth_tpu.utils.runtime import (get_dataset_num_proc,
                                       get_device_memory_stats,
                                       get_statistics)


def test_num_proc_env_override(monkeypatch):
    monkeypatch.setenv("UNSLOTH_DATASET_NUM_PROC", "3")
    assert get_dataset_num_proc() == 3
    monkeypatch.setenv("UNSLOTH_DATASET_NUM_PROC", "bogus")
    assert get_dataset_num_proc() >= 1


def test_num_proc_bounds(monkeypatch):
    monkeypatch.delenv("UNSLOTH_DATASET_NUM_PROC", raising=False)
    n = get_dataset_num_proc()
    assert 1 <= n <= 8


def test_memory_stats_shape():
    stats = get_device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1


def test_telemetry_noop():
    assert get_statistics("anything") is None
