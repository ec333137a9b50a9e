"""Checkpoint/resume tests (reference: resume validation in studio
core/training/resume.py; HF resume_from_checkpoint semantics)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_lora_tree, init_params
from unsloth_tpu.trainer.checkpoint import (latest_checkpoint,
                                            restore_train_state,
                                            save_train_state)
from unsloth_tpu.trainer.sft import SFTConfig, SFTTrainer


def _model(rng):
    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=64)
    m = LanguageModel(cfg=cfg, params=init_params(cfg, rng))
    m.lora = init_lora_tree(cfg, rng, r=4, alpha=8)
    return m


def _ds(n=8, seed=0):
    r = np.random.RandomState(seed)
    return [{"input_ids": r.randint(3, 120, 24).tolist()} for _ in range(n)]


def test_save_restore_roundtrip(rng, tmp_path):
    import optax

    model = _model(rng)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(model.lora)
    ckpt = str(tmp_path / "checkpoint-7")
    save_train_state(ckpt, 7, model.lora, opt_state)
    step, lora2, opt2 = restore_train_state(ckpt, model.lora, opt_state)
    assert step == 7
    a1 = model.lora["layers"][0]["q"].a
    a2 = lora2["layers"][0]["q"].a
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # opt state structure preserved
    chex_leaves1 = jax.tree_util.tree_leaves(opt_state)
    chex_leaves2 = jax.tree_util.tree_leaves(opt2)
    assert len(chex_leaves1) == len(chex_leaves2)


def test_latest_checkpoint_skips_incomplete(tmp_path):
    os.makedirs(tmp_path / "checkpoint-5" / "state")
    os.makedirs(tmp_path / "checkpoint-9")  # no state dir: incomplete
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint-5")
    assert latest_checkpoint("/nonexistent") is None


def test_restore_latest_falls_back_past_corrupt(rng, tmp_path):
    """A corrupt newest checkpoint must not kill resume: restore_latest
    walks back to the newest one that actually loads (reference:
    resume.py:32-62 validate-before-resume; loader_utils.py:1183 retry
    guard)."""
    import shutil

    import optax

    from unsloth_tpu.trainer.checkpoint import restore_latest

    model = _model(rng)
    tx = optax.adamw(1e-3)
    opt_state = tx.init(model.lora)
    good = str(tmp_path / "checkpoint-3")
    bad = str(tmp_path / "checkpoint-8")
    save_train_state(good, 3, model.lora, opt_state)
    save_train_state(bad, 8, model.lora, opt_state)
    # corrupt the newest: truncate every data file under its state dir
    for root, _, files in os.walk(os.path.join(bad, "state")):
        for f in files:
            p = os.path.join(root, f)
            if os.path.getsize(p) > 0:
                with open(p, "w") as fh:
                    fh.write("corrupt")
    out = restore_latest(str(tmp_path), model.lora, opt_state)
    assert out is not None
    path, step, lora2, _ = out
    assert step == 3 and path.endswith("checkpoint-3")
    np.testing.assert_array_equal(
        np.asarray(model.lora["layers"][0]["q"].a),
        np.asarray(lora2["layers"][0]["q"].a))
    shutil.rmtree(bad)


@pytest.mark.slow
def test_trainer_resume_continues(rng, tmp_path):
    """Train 6 steps with save at 4; resume must continue from step 4 and
    end at the same final state as an uninterrupted run (same data order)."""
    ds = _ds()
    out1 = str(tmp_path / "a")
    args = dict(per_device_train_batch_size=4, learning_rate=1e-3,
                max_seq_length=32, packing=False, warmup_steps=0,
                lr_scheduler_type="constant", logging_steps=1, seed=11)

    model_full = _model(rng)
    tr_full = SFTTrainer(model=model_full, train_dataset=ds,
                         args=SFTConfig(output_dir=out1, max_steps=6,
                                        save_steps=0, **args))
    tr_full.train()

    out2 = str(tmp_path / "b")
    model_int = _model(rng)
    tr1 = SFTTrainer(model=model_int, train_dataset=ds,
                     args=SFTConfig(output_dir=out2, max_steps=4,
                                    save_steps=4, **args))
    tr1.train()
    assert latest_checkpoint(out2) is not None

    model_res = _model(rng)
    tr2 = SFTTrainer(model=model_res, train_dataset=ds,
                     args=SFTConfig(output_dir=out2, max_steps=6,
                                    save_steps=0, **args))
    tr2.train(resume_from_checkpoint=True)
    # resumed run does steps 5..6 only
    assert tr2.state_log[0]["step"] == 5

    a_full = model_full.lora["layers"][0]["q"].b
    a_res = model_res.lora["layers"][0]["q"].b
    np.testing.assert_allclose(np.asarray(a_full), np.asarray(a_res),
                               atol=1e-6)
