"""Trainer evaluation + perplexity (reference: tests/utils/
perplexity_eval.py sliding-window PPL; merged-model perplexity parity
tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_lora_tree, init_params
from unsloth_tpu.trainer.sft import SFTConfig, SFTTrainer


def _model(rng):
    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2)
    m = LanguageModel(cfg=cfg, params=init_params(cfg, rng))
    m.lora = init_lora_tree(cfg, rng, r=4, alpha=8)
    return m


def test_evaluate_returns_finite_metrics(rng, tmp_path):
    model = _model(rng)
    r = np.random.RandomState(0)
    ds = [{"input_ids": r.randint(3, 120, 20).tolist()} for _ in range(5)]
    tr = SFTTrainer(model=model, train_dataset=ds, eval_dataset=ds,
                    args=SFTConfig(per_device_train_batch_size=2,
                                   max_seq_length=32,
                                   output_dir=str(tmp_path)))
    m = tr.evaluate()
    assert np.isfinite(m["eval_loss"])
    assert m["eval_perplexity"] == pytest.approx(np.exp(m["eval_loss"]),
                                                 rel=1e-6)
    assert m["eval_tokens"] == sum(len(d["input_ids"]) - 1 for d in ds)


def test_eval_loss_drops_after_training(rng, tmp_path):
    model = _model(rng)
    r = np.random.RandomState(1)
    ds = [{"input_ids": r.randint(3, 120, 24).tolist()} for _ in range(8)]
    tr = SFTTrainer(model=model, train_dataset=ds, eval_dataset=ds,
                    args=SFTConfig(per_device_train_batch_size=4,
                                   max_steps=15, learning_rate=2e-2,
                                   max_seq_length=32, packing=False,
                                   warmup_steps=0,
                                   lr_scheduler_type="constant",
                                   output_dir=str(tmp_path)))
    before = tr.evaluate()["eval_loss"]
    tr.train()
    after = tr.evaluate()["eval_loss"]
    assert after < before - 0.1, (before, after)
