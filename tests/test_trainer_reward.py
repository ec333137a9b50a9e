"""RewardTrainer (trainer/reward.py): Bradley-Terry loss math and an
end-to-end run where the learned head separates a detectable preference
(the analog of TRL RewardTrainer, which the reference patches with every
other trl.trainer module — reference models/rl.py:2286-2299)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_lora_tree, init_params
from unsloth_tpu.trainer.reward import (RewardConfig, RewardTrainer,
                                        reward_loss)

from tests.test_trainer_grpo import CharTokenizer


@pytest.fixture()
def model():
    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=256, eos_token_id=0)
    params = init_params(cfg, jax.random.PRNGKey(0))
    m = LanguageModel(cfg=cfg, params=params, tokenizer=CharTokenizer())
    m.lora = init_lora_tree(cfg, jax.random.PRNGKey(1), r=4, alpha=8)
    return m


def test_reward_loss_math():
    rc = jnp.asarray([2.0, 1.0])
    rr = jnp.asarray([0.0, 3.0])
    loss, acc = reward_loss(rc, rr)
    want = -np.mean(np.log(1 / (1 + np.exp(-np.array([2.0, -2.0])))))
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)
    assert float(acc) == 0.5
    # margin shifts the decision boundary
    loss_m, _ = reward_loss(rc, rr, margin=jnp.asarray([1.0, 0.0]))
    assert float(loss_m) > float(loss)
    # centering regularizer penalizes drifting magnitudes
    loss_c, _ = reward_loss(rc, rr, center_rewards_coefficient=0.1)
    assert float(loss_c) == pytest.approx(
        float(loss) + 0.1 * np.mean(np.array([2.0, 4.0]) ** 2), rel=1e-5)


@pytest.mark.slow
def test_reward_trainer_learns_preference(model):
    """chosen = runs of 'z', rejected = runs of 'a': after training the
    score head must rank fresh 'z' strings above fresh 'a' strings."""
    ds = [{"chosen": "zzzzzzzz", "rejected": "aaaaaaaa"},
          {"chosen": "zzzzzz", "rejected": "aaaaaa"},
          {"chosen": "zzzzzzzzzz", "rejected": "aaaaaaaaaa"}]
    args = RewardConfig(per_device_train_batch_size=2, max_steps=25,
                        learning_rate=5e-3, logging_steps=1,
                        warmup_steps=0, lr_scheduler_type="constant",
                        report_to="none")
    tr = RewardTrainer(model, args=args, train_dataset=ds)
    out = tr.train()
    assert out.global_step == 25
    assert np.isfinite(out.training_loss)
    assert tr.state_log[-1]["loss"] < tr.state_log[0]["loss"]
    r = tr.reward(["zzzzzzz", "aaaaaaa"])
    assert r[0] > r[1], r
    assert tr.state_log[-1]["rewards/accuracies"] == 1.0


@pytest.mark.slow
def test_reward_trainer_margin_column(model):
    """Rows may carry a per-pair margin (TRL margin support)."""
    ds = [{"chosen": "zzzz", "rejected": "aaaa", "margin": 0.5}]
    args = RewardConfig(per_device_train_batch_size=1, max_steps=3,
                        logging_steps=1, warmup_steps=0,
                        lr_scheduler_type="constant", report_to="none")
    tr = RewardTrainer(model, args=args, train_dataset=ds)
    out = tr.train()
    assert np.isfinite(out.training_loss)


def test_top_level_export():
    import unsloth_tpu

    assert unsloth_tpu.RewardTrainer is RewardTrainer
    assert unsloth_tpu.RewardConfig is RewardConfig
