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
