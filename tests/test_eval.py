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


@pytest.mark.slow
def test_train_and_merge_fact_retention(rng, tmp_path):
    """The reference's flagship QLoRA semantic test (reference:
    tests/qlora/test_unsloth_qlora_train_and_merge.py + README.md:24-35):
    train an unanswerable fact into LoRA over an NF4 base, assert the
    fact is retained after training AND after merged_16bit save+reload
    (the reference demonstrates peft's merge_and_unload loses it)."""
    from tests.helpers import TINY_LLAMA, make_hf_checkpoint
    from tests.test_trainer_grpo import CharTokenizer
    from unsloth_tpu.models.loader import FastLanguageModel
    from unsloth_tpu.utils.evals import fact_retained

    ckpt = str(tmp_path / "base")
    make_hf_checkpoint(ckpt, TINY_LLAMA)
    model, _ = FastLanguageModel.from_pretrained(ckpt, load_in_4bit=True,
                                                 dtype="float32")
    model.tokenizer = CharTokenizer()
    FastLanguageModel.get_peft_model(model, r=8, lora_alpha=16)

    prompt = "zork color? "
    answer = "red"
    ds = [{"input_ids": CharTokenizer()(prompt + answer)["input_ids"]}
          for _ in range(8)]
    tr = SFTTrainer(model=model, train_dataset=ds,
                    tokenizer=CharTokenizer(),
                    args=SFTConfig(per_device_train_batch_size=4,
                                   max_steps=120, learning_rate=5e-3,
                                   max_seq_length=16, packing=False,
                                   warmup_steps=0,
                                   lr_scheduler_type="constant",
                                   output_dir=str(tmp_path)))
    tr.train()
    assert fact_retained(model, prompt, answer, max_new_tokens=4), \
        "fact not learned by LoRA training"

    out = str(tmp_path / "merged")
    model.save_pretrained_merged(out)
    merged, _ = FastLanguageModel.from_pretrained(out, load_in_4bit=False,
                                                  dtype="float32")
    merged.tokenizer = CharTokenizer()
    assert fact_retained(merged, prompt, answer, max_new_tokens=4), \
        "fact lost by merged_16bit save (merge-fidelity regression)"
