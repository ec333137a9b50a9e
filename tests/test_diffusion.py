"""FastDiffusionModel (text-diffusion) tests: masking process, loss,
end-to-end denoising training, and iterative-unmasking generation
(reference surface: models/diffusion.py:129-342)."""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import TINY_LLAMA, make_hf_checkpoint
from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.diffusion import (FastDiffusionModel,
                                          diffusion_generate,
                                          diffusion_loss, diffusion_mask,
                                          is_diffusion_model_type)
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_lora_tree, init_params


MASK = 250


def _diffusion_model(rng, causal=False):
    cfg = ModelConfig(vocab_size=256, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=64, causal=causal,
                      mask_token_id=MASK)
    params = init_params(cfg, rng)
    return LanguageModel(cfg=cfg, params=params, max_seq_length=64)


def test_model_type_gate(tmp_path):
    assert is_diffusion_model_type("diffusion_gemma")
    assert not is_diffusion_model_type("llama")
    path = str(tmp_path / "ar")
    make_hf_checkpoint(path, TINY_LLAMA)
    with pytest.raises(RuntimeError):
        FastDiffusionModel.from_pretrained(path)


def test_from_pretrained_diffusion_checkpoint(tmp_path):
    hf = dict(TINY_LLAMA, model_type="diffusion_gemma", mask_token_id=120)
    path = str(tmp_path / "diff")
    make_hf_checkpoint(path, hf)
    # diffusion_gemma is not a transformers model_type; config builder
    # must still accept it (llama-like fallback or explicit)
    model, tok = FastDiffusionModel.from_pretrained(
        path, load_in_4bit=False, dtype="float32")
    assert model.cfg.causal is False
    assert model.cfg.mask_token_id == 120
    ids = jnp.asarray(np.arange(8)[None, :], jnp.int32)
    assert np.isfinite(np.asarray(model.logits(ids))).all()


def test_bidirectional_attention_differs_from_causal(rng):
    """causal=False must let early positions see later tokens."""
    m = _diffusion_model(rng, causal=False)
    ids = np.tile(np.arange(1, 17)[None, :], (1, 1)).astype(np.int32)
    a = np.asarray(m.logits(jnp.asarray(ids)))
    ids2 = ids.copy()
    ids2[0, -1] = 99  # change the LAST token
    b = np.asarray(m.logits(jnp.asarray(ids2)))
    assert np.abs(a[0, 0] - b[0, 0]).max() > 1e-6  # first logit changed


def test_diffusion_mask_respects_prompt(rng):
    ids = jnp.asarray(np.arange(1, 33)[None, :], jnp.int32)
    prompt_mask = jnp.asarray((np.arange(32) < 8)[None, :])
    noised, masked, t = diffusion_mask(rng, ids, MASK,
                                       prompt_mask=prompt_mask)
    m = np.asarray(masked)
    assert not m[0, :8].any()               # prompt never masked
    assert (np.asarray(noised)[0][m[0]] == MASK).all()
    assert 0 < float(t[0]) <= 1.0


@pytest.mark.slow
def test_diffusion_training_denoises(rng):
    """Overfit one sequence: the denoising loss must drop and generation
    must reconstruct the memorized continuation."""
    from unsloth_tpu.trainer.diffusion import DiffusionTrainer
    from unsloth_tpu.trainer.sft import SFTConfig

    model = _diffusion_model(rng)  # full finetuning (lora=None)
    seq = (np.arange(1, 33) * 3 % 200 + 1).tolist()
    ds = [{"input_ids": seq} for _ in range(8)]
    args = SFTConfig(per_device_train_batch_size=8, max_steps=200,
                     max_seq_length=32, learning_rate=1e-2,
                     lr_scheduler_type="constant", warmup_steps=0)
    tr = DiffusionTrainer(model, train_dataset=ds, args=args)
    tr.train()
    losses = [e["loss"] for e in tr.state_log]
    # per-step loss is noisy (random mask ratio t each step): compare means
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.6, losses

    out = diffusion_generate(model, seq[:8], canvas_length=32, steps=16)
    # prompt preserved
    assert out[:8] == seq[:8]
    assert MASK not in out
    # memorization: far above chance (1/200 per slot) on the continuation
    match = np.mean([out[i] == seq[i] for i in range(8, 32)])
    assert match > 0.25, (match, out, seq)
