"""PRMTrainer (trainer/prm.py): step-label encoding, BCE math, and an
end-to-end run where the head learns to separate good from bad steps
(TRL PRMTrainer analog — the reference patches trl's prm_trainer
generically, models/rl.py:2286-2299)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_lora_tree, init_params
from unsloth_tpu.trainer.prm import PRMConfig, PRMTrainer, prm_loss

from tests.test_trainer_grpo import CharTokenizer


@pytest.fixture()
def model():
    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=256, eos_token_id=0)
    m = LanguageModel(cfg=cfg, params=init_params(cfg, jax.random.PRNGKey(0)),
                      tokenizer=CharTokenizer())
    m.lora = init_lora_tree(cfg, jax.random.PRNGKey(1), r=4, alpha=8)
    return m


def test_prm_loss_math():
    logits = jnp.asarray([[2.0, -2.0, 0.0, 5.0]])
    labels = jnp.asarray([[1, 0, -100, 0]])
    loss, acc = prm_loss(logits, labels)
    import math
    want = (-math.log(1 / (1 + math.exp(-2.0)))       # y=1, logit 2
            - math.log(1 - 1 / (1 + math.exp(2.0)))   # y=0, logit -2
            - math.log(1 - 1 / (1 + math.exp(-5.0)))  # y=0, logit 5
            ) / 3
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    np.testing.assert_allclose(float(acc), 2 / 3, rtol=1e-6)


def test_step_label_positions(model):
    tr = PRMTrainer(model, args=PRMConfig(step_separator="\n",
                                          report_to="none"),
                    train_dataset=[])
    ids, labels = tr._build_batch([{
        "prompt": "Q",
        "completions": ["ab", "cd"],
        "labels": [True, False]}])
    lab = np.asarray(labels[0])
    marked = np.nonzero(lab != -100)[0]
    assert len(marked) == 2
    assert lab[marked[0]] == 1 and lab[marked[1]] == 0
    # labels sit ON the separator token
    sep_id = ord("\n") % 128
    assert np.asarray(ids[0])[marked[0]] == sep_id


@pytest.mark.slow
def test_prm_learns_step_quality(model):
    """good steps contain 'z', bad steps contain 'a': the head must
    separate fresh examples after training."""
    rng = np.random.RandomState(0)

    def mk():
        steps, labs = [], []
        for _ in range(3):
            good = bool(rng.rand() > 0.5)
            steps.append("zzz" if good else "aaa")
            labs.append(good)
        return {"prompt": "Q:", "completions": steps, "labels": labs}

    ds = [mk() for _ in range(8)]
    args = PRMConfig(per_device_train_batch_size=4, max_steps=30,
                     learning_rate=5e-3, logging_steps=1, warmup_steps=0,
                     lr_scheduler_type="constant", report_to="none")
    tr = PRMTrainer(model, args=args, train_dataset=ds)
    out = tr.train()
    assert out.global_step == 30
    assert tr.state_log[-1]["loss"] < tr.state_log[0]["loss"]
    probs = tr.score_steps("Q:", ["zzz", "aaa", "zzz"])
    assert probs.shape == (3,)
    assert probs[0] > probs[1] and probs[2] > probs[1], probs
    assert tr.state_log[-1]["accuracy"] == 1.0
