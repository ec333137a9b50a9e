"""DPO trainer tests: loss math and an end-to-end preference-learning run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_lora_tree, init_params
from unsloth_tpu.trainer.dpo import DPOConfig, DPOTrainer, dpo_loss

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


def test_dpo_loss_at_init():
    """policy == ref => logits 0 => loss = -log sigmoid(0) = log 2."""
    z = jnp.zeros(4)
    loss, (cr, rj) = dpo_loss(z, z, z, z, beta=0.1)
    np.testing.assert_allclose(float(loss), np.log(2.0), rtol=1e-6)
    assert float(cr) == 0.0 and float(rj) == 0.0


def test_dpo_loss_prefers_chosen():
    ref = jnp.zeros(2)
    better = dpo_loss(jnp.ones(2), -jnp.ones(2), ref, ref, beta=0.5)[0]
    worse = dpo_loss(-jnp.ones(2), jnp.ones(2), ref, ref, beta=0.5)[0]
    assert float(better) < np.log(2.0) < float(worse)


def test_ipo_loss_form():
    z = jnp.zeros(2)
    loss, _ = dpo_loss(z, z, z, z, beta=0.1, loss_type="ipo")
    np.testing.assert_allclose(float(loss), (1.0 / 0.2) ** 2, rtol=1e-6)


@pytest.mark.slow
def test_dpo_end_to_end_learns_preference(model):
    """Chosen completions use high-ordinal chars, rejected low; after
    training, chosen sequences must have higher logprob margin."""
    ds = [{"prompt": "Q:", "chosen": "xyz", "rejected": "abc"}] * 4
    args = DPOConfig(per_device_train_batch_size=2, max_steps=10,
                     learning_rate=5e-2, beta=0.5, logging_steps=1,
                     warmup_steps=0, lr_scheduler_type="constant",
                     max_prompt_length=8, max_completion_length=8)
    trainer = DPOTrainer(model=model, args=args, train_dataset=ds,
                         processing_class=model.tokenizer)
    out = trainer.train()
    assert out.global_step == 10
    first, last = trainer.state_log[0], trainer.state_log[-1]
    assert last["loss"] < first["loss"]
    # the reward margin (chosen - rejected) should have grown
    margin_first = first["rewards/chosen"] - first["rewards/rejected"]
    margin_last = last["rewards/chosen"] - last["rewards/rejected"]
    assert margin_last > margin_first
    assert last["rewards/accuracies"] == 1.0


def test_dpo_requires_lora(model):
    model.lora = None
    trainer = DPOTrainer(model=model, args=DPOConfig(max_steps=1),
                         train_dataset=[{"prompt": "a", "chosen": "b",
                                         "rejected": "c"}],
                         processing_class=model.tokenizer)
    with pytest.raises(AssertionError, match="LoRA"):
        trainer.train()


def test_orpo_loss_math():
    from unsloth_tpu.trainer.dpo import orpo_loss

    pc = jnp.log(jnp.asarray([0.6]))
    pr = jnp.log(jnp.asarray([0.2]))
    loss, ratio = orpo_loss(pc, pr, -pc, beta=0.5)
    # chosen odds 1.5, rejected 0.25 => log OR = log 6
    np.testing.assert_allclose(float(ratio), np.log(6.0), rtol=1e-5)
    assert float(loss) > 0


@pytest.mark.slow
def test_orpo_end_to_end(model):
    from unsloth_tpu.trainer.dpo import ORPOConfig, ORPOTrainer

    ds = [{"prompt": "Q:", "chosen": "xyz", "rejected": "abc"}] * 4
    args = ORPOConfig(per_device_train_batch_size=2, max_steps=8,
                      learning_rate=2e-2, beta=0.5, logging_steps=1,
                      warmup_steps=0, lr_scheduler_type="constant",
                      max_prompt_length=8, max_completion_length=8)
    tr = ORPOTrainer(model=model, args=args, train_dataset=ds,
                     processing_class=model.tokenizer)
    out = tr.train()
    assert out.global_step == 8
    first, last = tr.state_log[0], tr.state_log[-1]
    assert last["loss"] < first["loss"]
    assert last["rewards/accuracies"] == 1.0


def test_kto_loss_math():
    from unsloth_tpu.trainer.dpo import kto_loss

    policy = jnp.asarray([1.0, -1.0])
    ref = jnp.zeros(2)
    labels = jnp.asarray([1, 0])
    loss, rewards = kto_loss(policy, ref, labels, jnp.asarray(0.0),
                             beta=0.5)
    np.testing.assert_allclose(np.asarray(rewards), [0.5, -0.5])
    # desirable with positive reward & undesirable with negative: low loss
    bad_loss, _ = kto_loss(-policy, ref, labels, jnp.asarray(0.0), beta=0.5)
    assert float(loss) < float(bad_loss)


@pytest.mark.slow
def test_kto_end_to_end(model):
    from unsloth_tpu.trainer.dpo import KTOConfig, KTOTrainer

    ds = [
        {"prompt": "Q:", "completion": "xyz", "label": True},
        {"prompt": "Q:", "completion": "abc", "label": False},
        {"prompt": "R:", "completion": "xyw", "label": True},
        {"prompt": "R:", "completion": "abd", "label": False},
    ]
    args = KTOConfig(per_device_train_batch_size=4, max_steps=8,
                     learning_rate=2e-2, beta=0.5, logging_steps=1,
                     warmup_steps=0, lr_scheduler_type="constant",
                     max_prompt_length=8, max_completion_length=8)
    tr = KTOTrainer(model=model, args=args, train_dataset=ds,
                    processing_class=model.tokenizer)
    out = tr.train()
    assert out.global_step == 8
    last = tr.state_log[-1]
    # desirable completions should end with higher reward than undesirable
    assert last["rewards/chosen"] > last["rewards/rejected"]


@pytest.mark.slow
def test_cpo_end_to_end(model):
    from unsloth_tpu.trainer.dpo import CPOConfig, CPOTrainer

    ds = [{"prompt": "Q:", "chosen": "xyz", "rejected": "abc"}] * 4
    args = CPOConfig(per_device_train_batch_size=2, max_steps=8,
                     learning_rate=2e-2, beta=0.5, cpo_alpha=1.0,
                     logging_steps=1, warmup_steps=0,
                     lr_scheduler_type="constant",
                     max_prompt_length=8, max_completion_length=8)
    tr = CPOTrainer(model=model, args=args, train_dataset=ds,
                    processing_class=model.tokenizer)
    out = tr.train()
    assert out.global_step == 8
    assert tr.state_log[-1]["loss"] < tr.state_log[0]["loss"]
    assert tr.state_log[-1]["rewards/accuracies"] == 1.0
