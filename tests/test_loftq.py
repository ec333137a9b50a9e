"""LoftQ init tests (reference: models/llama.py:3068 loftq_config ->
peft LoraConfig(init_lora_weights="loftq"); algorithm arXiv:2310.08659)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import FastLanguageModel, LanguageModel
from unsloth_tpu.models.params import init_params, quantize_params
from unsloth_tpu.ops.nf4 import NF4Tensor, dequantize_nf4, quantize_nf4


def _model(rng, quantized=False):
    cfg = ModelConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=2, num_kv_heads=2)
    params = init_params(cfg, rng)
    if quantized:
        params = quantize_params(params, cfg)
    return LanguageModel(cfg=cfg, params=params)


def test_loftq_beats_plain_quantization(rng):
    model = _model(rng)
    w_orig = np.asarray(model.params["layers"][0]["q"], dtype=np.float32)

    FastLanguageModel.get_peft_model(
        model, r=16, lora_alpha=32.0,
        loftq_config={"loftq_bits": 4, "loftq_iter": 3},
        use_gradient_checkpointing=False)

    q = model.params["layers"][0]["q"]
    assert isinstance(q, NF4Tensor)  # base got quantized
    lw = model.lora["layers"][0]["q"]
    assert float(jnp.abs(lw.b).max()) > 0  # B is NOT zero-init

    recon = np.asarray(dequantize_nf4(q, dtype=jnp.float32)) \
        + lw.scale * np.asarray(lw.b @ lw.a)
    plain = np.asarray(dequantize_nf4(quantize_nf4(jnp.asarray(w_orig)),
                                      dtype=jnp.float32))
    err_loftq = np.linalg.norm(w_orig - recon)
    err_plain = np.linalg.norm(w_orig - plain)
    assert err_loftq < 0.9 * err_plain, (err_loftq, err_plain)


def test_loftq_forward_runs(rng):
    from unsloth_tpu.models.decoder import loss_fn

    model = _model(rng)
    FastLanguageModel.get_peft_model(
        model, r=8, loftq_config={"loftq_bits": 4, "loftq_iter": 1},
        use_gradient_checkpointing=False)
    ids = jnp.arange(16, dtype=jnp.int32)[None, :] % 64
    batch = {"input_ids": ids, "labels": ids}
    loss = loss_fn(model.params, model.lora, batch, model.cfg)
    assert np.isfinite(float(loss))


def test_loftq_requires_dense_base(rng):
    model = _model(rng, quantized=True)
    with pytest.raises(ValueError, match="dense"):
        FastLanguageModel.get_peft_model(
            model, r=8, loftq_config={"loftq_bits": 4},
            use_gradient_checkpointing=False)


def test_loftq_rejects_non4bit(rng):
    model = _model(rng)
    with pytest.raises(ValueError, match="loftq_bits"):
        FastLanguageModel.get_peft_model(
            model, r=8, loftq_config={"loftq_bits": 2},
            use_gradient_checkpointing=False)


def test_loftq_rejects_stacked_layout(rng):
    """ADVICE r3: pre-stacked (scan-layout) params must fail with a clear
    message, not a bare KeyError."""
    from unsloth_tpu.models.decoder import stack_params
    from unsloth_tpu.models.loftq import apply_loftq
    from unsloth_tpu.models.params import init_lora_tree

    model = _model(rng)
    stacked = stack_params(model.params)
    lora = init_lora_tree(model.cfg, rng, r=8, alpha=8)
    with pytest.raises(ValueError, match="list layout"):
        apply_loftq(stacked, lora, {"loftq_bits": 4}, {"r": 8})
