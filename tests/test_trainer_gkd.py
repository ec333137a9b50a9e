"""GKDTrainer (trainer/gkd.py): generalized JSD math vs a numpy oracle
and an end-to-end distillation run where the student's distribution
moves toward the teacher's (TRL GKDTrainer analog — the reference
patches trl's gkd_trainer generically, models/rl.py:2286-2299)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_lora_tree, init_params
from unsloth_tpu.trainer.gkd import (GKDConfig, GKDTrainer,
                                     generalized_jsd_loss)

from tests.test_trainer_grpo import CharTokenizer


def _softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _jsd_oracle(s, t, mask, beta, temp):
    sp = _softmax(s / temp)
    tp = _softmax(t / temp)
    m = beta * tp + (1 - beta) * sp
    kl_t = (tp * (np.log(tp) - np.log(m))).sum(-1)
    kl_s = (sp * (np.log(sp) - np.log(m))).sum(-1)
    per = beta * kl_t + (1 - beta) * kl_s
    return (per * mask).sum() / mask.sum()


def test_jsd_matches_oracle():
    rng = np.random.RandomState(0)
    s = rng.randn(2, 5, 16).astype(np.float32)
    t = rng.randn(2, 5, 16).astype(np.float32)
    mask = (rng.rand(2, 5) > 0.3).astype(np.float32)
    for beta in (0.3, 0.5, 0.9):
        got = float(generalized_jsd_loss(
            jnp.asarray(s), jnp.asarray(t), jnp.asarray(mask),
            beta=beta, temperature=0.8))
        want = _jsd_oracle(s, t, mask, beta, 0.8)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_jsd_limits_are_kls():
    rng = np.random.RandomState(1)
    s = rng.randn(1, 3, 8).astype(np.float32)
    t = rng.randn(1, 3, 8).astype(np.float32)
    mask = np.ones((1, 3), np.float32)
    sp, tp = _softmax(s), _softmax(t)
    fwd = float(generalized_jsd_loss(jnp.asarray(s), jnp.asarray(t),
                                     jnp.asarray(mask), beta=1.0))
    want_fwd = (tp * (np.log(tp) - np.log(sp))).sum(-1).mean()
    np.testing.assert_allclose(fwd, want_fwd, rtol=1e-5)
    rev = float(generalized_jsd_loss(jnp.asarray(s), jnp.asarray(t),
                                     jnp.asarray(mask), beta=0.0))
    want_rev = (sp * (np.log(sp) - np.log(tp))).sum(-1).mean()
    np.testing.assert_allclose(rev, want_rev, rtol=1e-5)
    assert float(generalized_jsd_loss(jnp.asarray(s), jnp.asarray(s),
                                      jnp.asarray(mask), beta=0.5)) < 1e-7


def _mk(seed):
    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=256, eos_token_id=0)
    m = LanguageModel(cfg=cfg, params=init_params(
        cfg, jax.random.PRNGKey(seed)), tokenizer=CharTokenizer())
    return m


@pytest.mark.slow
def test_gkd_distills_toward_teacher():
    student = _mk(0)
    student.lora = init_lora_tree(student.cfg, jax.random.PRNGKey(1),
                                  r=8, alpha=16)
    teacher = _mk(7)      # a different random model = the target
    ds = [{"prompt": "ab", "completion": "cdefgh"},
          {"prompt": "xy", "completion": "zwvuts"}]
    args = GKDConfig(per_device_train_batch_size=2, max_steps=20,
                     max_prompt_length=8, max_completion_length=8,
                     learning_rate=5e-3, lmbda=0.4, beta=0.5,
                     logging_steps=1, warmup_steps=0,
                     lr_scheduler_type="constant", report_to="none")
    tr = GKDTrainer(student, teacher, args=args, train_dataset=ds)
    out = tr.train()
    assert out.global_step == 20
    losses = [e["loss"] for e in tr.state_log]
    # distillation converges: the JSD to the teacher drops
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
    assert any(e["on_policy"] for e in tr.state_log)
    assert any(not e["on_policy"] for e in tr.state_log)


def test_top_level_export():
    import unsloth_tpu

    assert unsloth_tpu.GKDTrainer is GKDTrainer
    assert unsloth_tpu.GKDConfig is GKDConfig
