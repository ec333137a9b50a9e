"""Runtime utils tests (reference: dataset_num_proc.py, memory stats)."""

import pytest
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


def test_metrics_logger_jsonl_and_callbacks(tmp_path):
    import json

    from unsloth_tpu.utils.logging import MetricsLogger

    seen = []
    lg = MetricsLogger(output_dir=str(tmp_path), report_to="none",
                       callbacks=[seen.append])
    lg.log({"loss": 1.5, "step": 1})
    lg.log({"loss": 1.2, "step": 2})
    lg.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert [l["loss"] for l in lines] == [1.5, 1.2]
    assert len(seen) == 2 and seen[1]["step"] == 2


@pytest.mark.slow
def test_trainer_writes_metrics_jsonl(tmp_path):
    import jax
    import numpy as np

    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_lora_tree, init_params
    from unsloth_tpu.trainer.sft import SFTConfig, SFTTrainer

    cfg = ModelConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                      num_layers=1, num_heads=2, num_kv_heads=2)
    model = LanguageModel(cfg=cfg, params=init_params(
        cfg, jax.random.PRNGKey(0)))
    model.lora = init_lora_tree(cfg, jax.random.PRNGKey(1), r=2, alpha=4)
    r = np.random.RandomState(0)
    ds = [{"input_ids": r.randint(3, 60, 12).tolist()} for _ in range(4)]
    tr = SFTTrainer(model=model, train_dataset=ds,
                    args=SFTConfig(output_dir=str(tmp_path), max_steps=3,
                                   per_device_train_batch_size=2,
                                   max_seq_length=16, packing=False))
    tr.train()
    assert (tmp_path / "metrics.jsonl").exists()


@pytest.mark.slow
def test_compile_cache_enabled_on_import():
    """Importing the package turns on jax's persistent compilation cache
    (measured on the tunneled TPU: repeat compiles 1.85s -> 0.27s);
    UNSLOTH_COMPILE_CACHE=0 disables, a path overrides."""
    import subprocess
    import sys

    def probe(env_val):
        import os

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        if env_val is None:
            env.pop("UNSLOTH_COMPILE_CACHE", None)
        else:
            env["UNSLOTH_COMPILE_CACHE"] = env_val
        out = subprocess.run(
            [sys.executable, "-c",
             "import unsloth_tpu, jax; "
             "print(repr(jax.config.jax_compilation_cache_dir))"],
            env=env, capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stderr[-500:]
        return out.stdout.strip().splitlines()[-1]

    assert "jax_cache" in probe(None)
    assert probe("0") == "None"
    assert "/tmp/mycache" in probe("/tmp/mycache")
