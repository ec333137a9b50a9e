"""PPOTrainer (trainer/ppo.py): GAE and clipped-loss math vs numpy
oracles, plus an end-to-end run where reward-guided PPO shifts the
policy (TRL PPOTrainer analog — the reference patches trl's ppo_trainer
generically, models/rl.py:2286-2299)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_lora_tree, init_params
from unsloth_tpu.trainer.ppo import (PPOConfig, PPOTrainer, compute_gae,
                                     ppo_losses, whiten)

from tests.test_trainer_grpo import CharTokenizer


def _gae_oracle(rewards, values, mask, gamma, lam):
    n, t = rewards.shape
    adv = np.zeros_like(rewards)
    for i in range(n):
        carry = 0.0
        for j in range(t - 1, -1, -1):
            v_next = values[i, j + 1] * mask[i, j + 1] if j + 1 < t else 0.0
            delta = rewards[i, j] + gamma * v_next - values[i, j]
            carry = delta + gamma * lam * carry * mask[i, j]
            adv[i, j] = carry
    adv = adv * mask
    return adv, adv + values * mask


def test_gae_matches_oracle():
    rng = np.random.RandomState(0)
    t = 8
    rewards = rng.randn(2, t).astype(np.float32)
    values = rng.randn(2, t).astype(np.float32)
    # single right-padded completion segment per row
    mask = np.zeros((2, t), np.float32)
    mask[0, 2:6] = 1
    mask[1, 1:8] = 1
    rewards *= mask
    values *= mask
    adv, ret = compute_gae(jnp.asarray(rewards), jnp.asarray(values),
                           jnp.asarray(mask), gamma=0.99, lam=0.9)
    want_adv, want_ret = _gae_oracle(rewards, values, mask, 0.99, 0.9)
    np.testing.assert_allclose(np.asarray(adv), want_adv, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ret), want_ret, rtol=1e-5,
                               atol=1e-6)


def test_ppo_losses_clip_semantics():
    mask = jnp.ones((1, 4))
    adv = jnp.asarray([[1.0, 1.0, -1.0, -1.0]])
    old_logp = jnp.zeros((1, 4))
    # ratios: 2.0 (clipped up), 1.0, 2.0 (clipped for neg adv), 1.0
    logp = jnp.log(jnp.asarray([[2.0, 1.0, 2.0, 1.0]]))
    values = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    old_values = jnp.zeros((1, 4))
    returns = jnp.zeros((1, 4))
    pl, vl, cf = ppo_losses(logp, old_logp, values, old_values, adv,
                            returns, mask, cliprange=0.2,
                            cliprange_value=0.2)
    # positive adv, ratio 2 -> clipped at 1.2 -> term -1.2; ratio 1 -> -1
    # negative adv, ratio 2 -> unclipped -(-1*2) = 2; ratio 1 -> 1
    np.testing.assert_allclose(float(pl), (-1.2 - 1.0 + 2.0 + 1.0) / 4,
                               rtol=1e-6)
    # value clipped to 0.2: max((1-0)^2, (0.2-0)^2) = 1 -> 0.5*1/4
    np.testing.assert_allclose(float(vl), 0.5 * 1.0 / 4, rtol=1e-6)
    assert 0.0 < float(cf) <= 1.0


def test_whiten():
    mask = jnp.asarray([[1.0, 1.0, 1.0, 0.0]])
    x = jnp.asarray([[1.0, 2.0, 3.0, 99.0]])
    w = np.asarray(whiten(x, mask))
    assert abs(w[0, :3].mean()) < 1e-5
    assert w[0, 3] == 0.0


@pytest.fixture()
def model():
    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=256, eos_token_id=0)
    m = LanguageModel(cfg=cfg, params=init_params(cfg, jax.random.PRNGKey(0)),
                      tokenizer=CharTokenizer())
    m.lora = init_lora_tree(cfg, jax.random.PRNGKey(1), r=4, alpha=8)
    return m


@pytest.mark.slow
def test_ppo_end_to_end_reward_shifts_policy(model):
    ds = [{"prompt": "Q:"}] * 8

    def reward_high_chars(prompts=None, completions=None, **kw):
        return [float(np.mean([ord(c) for c in comp])) / 128.0
                if comp else 0.0 for comp in completions]

    args = PPOConfig(per_device_train_batch_size=4, num_generations=1,
                     max_prompt_length=8, max_completion_length=8,
                     learning_rate=3e-2, max_steps=10, temperature=1.5,
                     kl_coef=0.0, num_ppo_epochs=2, logging_steps=1,
                     warmup_steps=0, lr_scheduler_type="constant",
                     seed=11, report_to="none")
    tr = PPOTrainer(model, reward_funcs=[reward_high_chars], args=args,
                    train_dataset=ds)

    from unsloth_tpu.models.decoder import logits_fn

    prompt = jnp.asarray([[ord("Q"), ord(":")]], jnp.int32)
    token_vals = jnp.arange(model.cfg.vocab_size, dtype=jnp.float32)

    def expected_ordinal(lora):
        logits = logits_fn(model.params, lora, prompt, model.cfg,
                           remat=False)
        p = jax.nn.softmax(logits[0, -1].astype(jnp.float32))
        return float(jnp.sum(p * token_vals))

    before = expected_ordinal(model.lora)
    out = tr.train()
    after = expected_ordinal(model.lora)
    assert out.global_step == 10
    assert np.isfinite(out.training_loss)
    assert "value_loss" in tr.state_log[0]
    assert after > before, (before, after)
