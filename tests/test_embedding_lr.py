"""modules_to_save + embedding_learning_rate tests (reference:
UnslothTrainer.create_optimizer splits embedding params to a separate LR,
trainer.py:435-456; peft modules_to_save)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import TINY_LLAMA, make_hf_checkpoint
from unsloth_tpu.models.loader import FastLanguageModel
from unsloth_tpu.trainer.sft import SFTConfig, SFTTrainer


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m2s"))
    make_hf_checkpoint(path, TINY_LLAMA)
    return path


def _ds(n=8, seed=0):
    r = np.random.RandomState(seed)
    return [{"input_ids": r.randint(3, 120, 24).tolist()} for _ in range(n)]


def test_modules_to_save_creates_trainable_copies(ckpt):
    model, _ = FastLanguageModel.from_pretrained(ckpt, load_in_4bit=False,
                                                 dtype="float32")
    model = FastLanguageModel.get_peft_model(
        model, r=4, modules_to_save=["embed_tokens", "lm_head"])
    assert "embed" in model.lora and "lm_head" in model.lora
    np.testing.assert_allclose(np.asarray(model.lora["embed"]),
                               np.asarray(model.params["embed"]))


@pytest.mark.slow
def test_embeddings_train_and_shadow_base(ckpt):
    model, _ = FastLanguageModel.from_pretrained(ckpt, load_in_4bit=False,
                                                 dtype="float32")
    model = FastLanguageModel.get_peft_model(
        model, r=4, modules_to_save=["embed_tokens"])
    base_embed = np.asarray(model.params["embed"]).copy()
    args = SFTConfig(per_device_train_batch_size=4, max_steps=5,
                     learning_rate=1e-2, embedding_learning_rate=1e-3,
                     max_seq_length=32, packing=False, warmup_steps=0,
                     lr_scheduler_type="constant")
    tr = SFTTrainer(model=model, train_dataset=_ds(), args=args)
    tr.train()
    # trainable copy moved; frozen base untouched
    assert not np.allclose(np.asarray(model.lora["embed"]), base_embed)
    np.testing.assert_array_equal(np.asarray(model.params["embed"]),
                                  base_embed)


@pytest.mark.slow
def test_embedding_lr_is_smaller(ckpt):
    """With embedding_learning_rate << lr, embed moves much less than
    it would at full lr."""
    def run(embed_lr):
        model, _ = FastLanguageModel.from_pretrained(
            ckpt, load_in_4bit=False, dtype="float32")
        model = FastLanguageModel.get_peft_model(
            model, r=4, modules_to_save=["embed_tokens"])
        before = np.asarray(model.lora["embed"]).copy()
        args = SFTConfig(per_device_train_batch_size=4, max_steps=3,
                         learning_rate=1e-2, embedding_learning_rate=embed_lr,
                         max_seq_length=32, packing=False, warmup_steps=0,
                         lr_scheduler_type="constant", seed=5)
        SFTTrainer(model=model, train_dataset=_ds(), args=args).train()
        return np.abs(np.asarray(model.lora["embed"]) - before).max()

    big = run(1e-2)
    small = run(1e-4)
    assert small < big * 0.2, (small, big)
