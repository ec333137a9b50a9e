"""QAT fake-quant LoRA (reference: models/_utils.py:3828
_prepare_model_for_qat, llama.py:3476, kernels/utils.py:335-397)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.models.qat import (apply_qat, fake_quant_fp8_rowwise,
                                    fake_quant_int4,
                                    fake_quant_int8_rowwise)


@pytest.mark.parametrize("fn", [
    lambda w: fake_quant_int4(w, group_size=16),
    fake_quant_int8_rowwise, fake_quant_fp8_rowwise])
def test_fake_quant_idempotent(fn):
    """dequant(quant(.)) is a projection: applying it twice changes
    nothing — the property QAT relies on (a trained-over fake-quant base
    re-quantizes losslessly at export)."""
    w = jax.random.normal(jax.random.PRNGKey(0), (8, 32),
                          jnp.float32) * 0.1
    w1 = fn(w)
    w2 = fn(w1)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               rtol=1e-6, atol=1e-7)
    # and it actually quantizes (error nonzero but bounded)
    err = float(jnp.abs(w1 - w).max() / jnp.abs(w).max())
    assert 0.0 < err < 0.2


def test_apply_qat_transforms_linears_only():
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.params import init_params

    cfg = ModelConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    out = apply_qat(params, "int4")
    l0, o0 = params["layers"][0], out["layers"][0]
    assert not np.array_equal(np.asarray(l0["q"]), np.asarray(o0["q"]))
    np.testing.assert_array_equal(np.asarray(l0["input_norm"]),
                                  np.asarray(o0["input_norm"]))
    # int4 weight-only: embeddings untouched
    np.testing.assert_array_equal(np.asarray(params["embed"]),
                                  np.asarray(out["embed"]))
    # int8-int4: embeddings fake-quantized too
    out2 = apply_qat(params, "int8-int4")
    assert not np.array_equal(np.asarray(params["embed"]),
                              np.asarray(out2["embed"]))


def test_qat_lora_end_to_end():
    """get_peft_model(qat_scheme=...) fake-quantizes the frozen base and
    LoRA training over it still converges; the trained base re-quantizes
    bit-exactly (merge-parity half of the reference's QAT claim)."""
    import optax

    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.decoder import loss_fn
    from unsloth_tpu.models.loader import (FastLanguageModel,
                                           LanguageModel)
    from unsloth_tpu.models.params import init_params

    cfg = ModelConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=64)
    model = LanguageModel(cfg=cfg,
                          params=init_params(cfg, jax.random.PRNGKey(0)))
    FastLanguageModel.get_peft_model(model, r=4, qat_scheme="int4")
    assert model.qat_scheme == "int4"
    w = model.params["layers"][0]["q"]
    np.testing.assert_allclose(np.asarray(fake_quant_int4(w)),
                               np.asarray(w), rtol=1e-6, atol=1e-7)

    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 64)
    batch = {"input_ids": ids, "labels": ids}
    tx = optax.adam(5e-2)
    opt = tx.init(model.lora)

    @jax.jit
    def step(lora, opt):
        l, g = jax.value_and_grad(
            lambda lo: loss_fn(model.params, lo, batch, cfg))(lora)
        up, opt = tx.update(g, opt, lora)
        return optax.apply_updates(lora, up), opt, l

    losses = []
    for _ in range(60):
        model.lora, opt, l = step(model.lora, opt)
        losses.append(float(l))
    assert losses[-1] < losses[0] - 0.12, losses[::12]


@pytest.mark.slow
def test_from_pretrained_qat_requires_full_ft(tmp_path):
    from tests.helpers import TINY_LLAMA, make_hf_checkpoint
    from unsloth_tpu.models.loader import FastLanguageModel

    ckpt = str(tmp_path / "m")
    make_hf_checkpoint(ckpt, TINY_LLAMA)
    with pytest.raises(ValueError, match="full_finetuning"):
        FastLanguageModel.from_pretrained(ckpt, qat_scheme="int4")
    model, _ = FastLanguageModel.from_pretrained(
        ckpt, qat_scheme="fp8-fp8", full_finetuning=True,
        dtype="float32")
    w = model.params["layers"][0]["q"]
    np.testing.assert_allclose(np.asarray(fake_quant_fp8_rowwise(w)),
                               np.asarray(w), rtol=1e-6, atol=1e-7)
