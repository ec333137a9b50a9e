"""Stacked-layer scan layout: parity with the unrolled loop (values and
grads), LoRA stacking round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.decoder import (forward, loss_fn, stack_lora,
                                        stack_params, unstack_lora)
from unsloth_tpu.models.params import (init_lora_tree, init_params,
                                       quantize_params)


@pytest.fixture()
def setup(rng):
    cfg = ModelConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=4, num_heads=4, num_kv_heads=2)
    params = init_params(cfg, rng)
    lora = init_lora_tree(cfg, rng, r=4, alpha=8)
    ids = jax.random.randint(rng, (2, 16), 0, 128)
    return cfg, params, lora, ids


def test_scan_matches_loop_forward(setup):
    cfg, params, lora, ids = setup
    h_loop = forward(params, lora, ids, cfg, remat=False)
    h_scan = forward(stack_params(params), stack_lora(lora), ids, cfg,
                     remat=False)
    np.testing.assert_allclose(np.asarray(h_loop), np.asarray(h_scan),
                               atol=2e-5)


@pytest.mark.slow
def test_scan_matches_loop_grads(setup):
    cfg, params, lora, ids = setup
    batch = {"input_ids": ids, "labels": ids}
    sp = stack_params(params)
    sl = stack_lora(lora)

    g_loop = jax.grad(lambda l: loss_fn(params, l, batch, cfg,
                                        remat=True))(lora)
    g_scan = jax.grad(lambda l: loss_fn(sp, l, batch, cfg,
                                        remat=True))(sl)
    g_scan_un = unstack_lora(g_scan, cfg.num_layers)
    a = np.asarray(g_loop["layers"][2]["q"].b)
    b = np.asarray(g_scan_un["layers"][2]["q"].b)
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_scan_with_nf4(setup):
    cfg, params, lora, ids = setup
    qp = quantize_params(params, cfg, dtype=jnp.float32)
    h_loop = forward(qp, None, ids, cfg, remat=False)
    h_scan = forward(stack_params(qp), None, ids, cfg, remat=False)
    np.testing.assert_allclose(np.asarray(h_loop), np.asarray(h_scan),
                               atol=2e-5)


def test_scan_rejects_alternating_patterns(setup):
    cfg, params, lora, ids = setup
    import dataclasses

    cfg2 = dataclasses.replace(cfg, sliding_window=8,
                               layer_pattern=("sliding", "global"))
    with pytest.raises(ValueError, match="uniform layer kind"):
        forward(stack_params(params), None, ids, cfg2, remat=False)


def test_lora_stack_roundtrip(setup):
    cfg, params, lora, ids = setup
    rt = unstack_lora(stack_lora(lora), cfg.num_layers)
    a = np.asarray(lora["layers"][1]["v"].a)
    b = np.asarray(rt["layers"][1]["v"].a)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_stacked_end_to_end_facade(rng, tmp_path):
    """from_pretrained(stack_layers=True) -> train -> generate -> save."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from helpers import TINY_LLAMA, make_hf_checkpoint
    import optax

    from unsloth_tpu.models.loader import FastLanguageModel
    from unsloth_tpu.inference.generate import SamplingParams, generate

    ckpt = str(tmp_path / "m")
    make_hf_checkpoint(ckpt, TINY_LLAMA)
    model, _ = FastLanguageModel.from_pretrained(
        ckpt, load_in_4bit=True, dtype="float32", stack_layers=True)
    model = FastLanguageModel.get_peft_model(model, r=4, lora_alpha=8)
    assert "layers_stacked" in model.params
    assert "layers_stacked" in model.lora

    ids = jnp.arange(32, dtype=jnp.int32)[None] % 128
    batch = {"input_ids": ids, "labels": ids}
    tx = optax.adamw(1e-3)
    st = tx.init(model.lora)

    @jax.jit
    def step(lora, st):
        loss, g = jax.value_and_grad(lambda l: model.loss_fn(l, batch))(lora)
        up, st = tx.update(g, st, lora)
        return optax.apply_updates(lora, up), st, loss

    l0 = None
    for _ in range(5):
        model.lora, st, loss = step(model.lora, st)
        l0 = l0 or float(loss)
    assert float(loss) < l0

    out = generate(model, [[1, 2, 3, 4]], SamplingParams(max_tokens=3),
                   return_token_ids=True)
    assert len(out[0]) <= 3

    model.save_lora(str(tmp_path / "adapter"))
    model.save_pretrained_merged(str(tmp_path / "merged"))
    m2, _ = FastLanguageModel.from_pretrained(
        str(tmp_path / "merged"), load_in_4bit=False, dtype="float32")
    ids8 = ids[:, :8]
    l_merged = m2.logits(ids8, remat=False)
    assert bool(jnp.all(jnp.isfinite(l_merged)))
