"""imatrix tests: collection through the decoder tap, llama.cpp .dat
round-trip, and weighted quantization improving importance-weighted error
(reference: save.py:3806 imatrix/IQ path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unsloth_tpu.export.imatrix import (collect_imatrix, load_imatrix,
                                        quantize_q4k_weighted,
                                        save_imatrix)
from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.loader import LanguageModel
from unsloth_tpu.models.params import init_params


def _model(rng):
    cfg = ModelConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=64)
    return LanguageModel(cfg=cfg, params=init_params(cfg, rng))


@pytest.mark.slow
def test_collect_imatrix_shapes(rng):
    model = _model(rng)
    batches = [np.random.RandomState(i).randint(3, 120, (2, 16))
               for i in range(3)]
    im = collect_imatrix(model, batches)
    # 7 linears x 2 layers
    assert len(im) == 14
    assert im["blk.0.attn_q.weight"].shape == (32,)
    assert im["blk.1.ffn_down.weight"].shape == (64,)  # F for down_proj
    assert all((v >= 0).all() for v in im.values())
    # statistics reflect actual activations: q/k/v share inputs
    np.testing.assert_allclose(im["blk.0.attn_q.weight"],
                               im["blk.0.attn_k.weight"])


def test_imatrix_dat_round_trip(tmp_path, rng):
    model = _model(rng)
    im = collect_imatrix(model, [np.arange(16)[None, :] % 120])
    path = str(tmp_path / "imatrix.dat")
    save_imatrix(path, im, n_calls=4)
    back = load_imatrix(path)
    assert set(back) == set(im)
    for k in im:
        np.testing.assert_allclose(back[k], im[k], rtol=1e-6)


def test_weighted_quant_beats_unweighted_on_weighted_error():
    """With a skewed importance profile, the weighted search must achieve
    lower importance-weighted MSE than the unweighted one."""
    rng = np.random.RandomState(0)
    x = rng.randn(64, 128).astype(np.float32) * 0.1
    # a handful of channels matter 100x more
    weights = np.ones(128, np.float32)
    weights[:8] = 100.0

    _, mse_unweighted = quantize_q4k_weighted(x, None)
    deq_u, _ = quantize_q4k_weighted(x, None)
    # evaluate the unweighted solution under the weighted metric
    wb = np.broadcast_to(weights[None, :], x.shape)
    werr_u = float((wb * (x - deq_u) ** 2).sum() / wb.sum())

    deq_w, werr_w = quantize_q4k_weighted(x, weights)
    assert werr_w < werr_u, (werr_w, werr_u)
    # and it's a sane quantization overall
    assert np.abs(deq_w - x).max() < 0.2


def test_tap_inactive_under_jit(rng):
    """The tap must not fire inside jit traces (tracers skipped)."""
    from unsloth_tpu.models import decoder
    from unsloth_tpu.export.imatrix import ImatrixCollector

    model = _model(rng)
    tap = ImatrixCollector()
    prev = decoder._IMATRIX_TAP
    decoder._IMATRIX_TAP = tap
    try:
        ids = jnp.asarray(np.arange(8)[None, :])
        jax.jit(lambda i: model.forward(i, remat=False))(ids)
    finally:
        decoder._IMATRIX_TAP = prev
    assert tap.sums == {}
