"""OnlineDPOTrainer: generate pairs -> judge -> DPO update (TRL
OnlineDPOTrainer analog — patched generically by the reference,
models/rl.py:2286-2299)."""

import jax
import numpy as np
import pytest

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_lora_tree, init_params
from unsloth_tpu.trainer.online_dpo import (OnlineDPOConfig,
                                            OnlineDPOTrainer)

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


@pytest.mark.slow
def test_online_dpo_with_reward_funcs(model):
    args = OnlineDPOConfig(per_device_train_batch_size=2,
                           max_prompt_length=8, max_completion_length=8,
                           max_steps=3, temperature=1.2, logging_steps=1,
                           warmup_steps=0, lr_scheduler_type="constant",
                           report_to="none")
    tr = OnlineDPOTrainer(model, reward_funcs=[
        lambda prompts=None, completions=None, **kw:
        [float(np.mean([ord(c) for c in comp])) if comp else 0.0
         for comp in completions]],
        args=args, train_dataset=[{"prompt": "ab"}, {"prompt": "cd"}])
    out = tr.train()
    assert out.global_step == 3
    assert np.isfinite(out.training_loss)
    assert "rewards/accuracies" in tr.state_log[0]


def test_online_dpo_with_judge(model):
    calls = {}

    def judge(prompts, pairs):
        calls["prompts"] = list(prompts)
        calls["pairs"] = list(pairs)
        # prefer the longer completion
        return [0 if len(a) >= len(b) else 1 for a, b in pairs]

    args = OnlineDPOConfig(per_device_train_batch_size=2,
                           max_prompt_length=8, max_completion_length=8,
                           max_steps=2, temperature=1.2, logging_steps=1,
                           warmup_steps=0, lr_scheduler_type="constant",
                           report_to="none")
    tr = OnlineDPOTrainer(model, judge=judge, args=args,
                          train_dataset=[{"prompt": "ab"},
                                         {"prompt": "cd"}])
    out = tr.train()
    assert out.global_step == 2
    assert np.isfinite(out.training_loss)
    assert len(calls["pairs"]) == 2      # one pair per prompt
    assert len(calls["prompts"]) == 2


def test_pair_batch_ordering(model):
    args = OnlineDPOConfig(max_prompt_length=4, max_completion_length=4,
                           report_to="none")
    tr = OnlineDPOTrainer(model, judge=lambda p, c: [0] * len(p),
                          args=args, train_dataset=[])
    prompt_ids = [[1, 2], [1, 2], [3, 4], [3, 4]]
    completion_ids = [[10, 11], [20], [30], [40, 41]]
    # pair 0 chooses idx 1, pair 1 chooses idx 0
    ids, targets = tr._build_pair_batch(prompt_ids, completion_ids,
                                        [1, 0])
    ids = np.asarray(ids)
    assert ids[0, 2] == 20      # chosen of pair 0 = completion [20]
    assert ids[1, 2] == 10      # rejected of pair 0
    assert ids[2, 2] == 30      # chosen of pair 1
    assert ids[3, 2] == 40
    t = np.asarray(targets)
    assert t[0, 0] == -100      # prompt positions masked
