"""Decode-time dequant cache (inference/decode_cache.py) — the TPU-native
answer to the reference's 4-bit fast_gemv (reference:
unsloth/kernels/utils.py:765-982): spend spare HBM on persistent dense
copies instead of per-step VPU nibble decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsloth_tpu.inference.decode_cache import (apply_decode_cache,
                                                params_bytes)
from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.decoder import logits_fn
from unsloth_tpu.models.params import init_params, quantize_params
from unsloth_tpu.ops.nf4 import NF4Tensor


def _cfg():
    return ModelConfig(vocab_size=256, hidden_size=128,
                       intermediate_size=256, num_layers=3, num_heads=2,
                       num_kv_heads=2, max_position_embeddings=64)


def _count_nf4(params):
    return sum(isinstance(x, NF4Tensor) for x in jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, NF4Tensor)))


def test_budget_zero_is_noop(rng):
    params = quantize_params(init_params(_cfg(), rng), _cfg())
    out, stats = apply_decode_cache(params, hbm_budget_gb=0)
    assert stats["converted"] == 0
    assert _count_nf4(out) == _count_nf4(params)


def test_partial_budget_converts_prefix_and_preserves_logits(rng):
    cfg = _cfg()
    params = quantize_params(init_params(cfg, rng), cfg)
    n_before = _count_nf4(params)
    assert n_before == 3 * 7
    # budget for roughly half the weights' dense upgrade
    total_extra = sum(
        2 * int(np.prod(leaf.shape)) - leaf.nbytes
        for leaf in jax.tree_util.tree_leaves(
            params, is_leaf=lambda x: isinstance(x, NF4Tensor))
        if isinstance(leaf, NF4Tensor))
    out, stats = apply_decode_cache(params,
                                    hbm_budget_gb=total_extra / 2 / 1e9)
    assert 0 < stats["converted"] < n_before
    assert stats["converted"] + stats["skipped"] == n_before
    assert params_bytes(out) == stats["params_bytes_after"]

    ids = jnp.asarray(np.random.RandomState(0).randint(1, 250, (2, 16)))
    ref = logits_fn(params, None, ids, cfg)
    got = logits_fn(out, None, ids, cfg)
    # dequant math is identical (same dequantize_nf4), so logits match
    # to bf16 matmul association noise
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_full_budget_converts_everything(rng):
    cfg = _cfg()
    params = quantize_params(init_params(cfg, rng), cfg)
    out, stats = apply_decode_cache(params, hbm_budget_gb=10.0)
    assert _count_nf4(out) == 0
    assert stats["skipped"] == 0


def test_for_inference_wires_cache_and_for_training_restores(rng):
    from unsloth_tpu.models.loader import LanguageModel

    cfg = _cfg()
    params = quantize_params(init_params(cfg, rng), cfg)
    model = LanguageModel(cfg=cfg, params=params, max_seq_length=64)
    model.for_inference(decode_cache=10.0)
    assert _count_nf4(model.params) == 0
    assert model._decode_cache_stats["converted"] == 3 * 7
    model.for_training()
    assert _count_nf4(model.params) == 3 * 7
    assert model.params is params
