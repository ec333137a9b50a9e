"""NF4 fused/unfused auto-dispatch (decoder.resolve_nf4_mode +
ops.qlora_matmul.nf4_dispatch_mode).

Measured basis (bench_artifacts/r4/dense_gap.jsonl, 8 layers/8K on one
v5e): XLA dequantize+dot is ~6% faster than the fused Pallas kernel but
its per-use dequantized weights OOM the full-depth 8B config — so the
model layer picks unfused only when the HBM-budget estimate fits.
Reference basis: unsloth picks its QLoRA kernel path once per model at
patch time (unsloth/kernels/fast_lora.py dispatch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.models.config import ModelConfig
from unsloth_tpu.models.decoder import resolve_nf4_mode
from unsloth_tpu.ops.nf4 import quantize_nf4
from unsloth_tpu.ops import qlora_matmul as qm


def _cfg(layers, hidden=256, inter=512, vocab=1024):
    return ModelConfig(
        model_type="llama", name="t", vocab_size=vocab,
        hidden_size=hidden, intermediate_size=inter, num_layers=layers,
        num_heads=4, num_kv_heads=2)


def _nf4_params(cfg):
    w = jnp.asarray(np.random.RandomState(0).randn(
        cfg.hidden_size, cfg.hidden_size).astype(np.float32))
    return {"embed": jnp.zeros((cfg.vocab_size, cfg.hidden_size),
                               jnp.bfloat16),
            "layers": [{"q_proj": quantize_nf4(w)}]}


def test_dense_params_resolve_none():
    cfg = _cfg(2)
    params = {"embed": jnp.zeros((8, 8), jnp.bfloat16)}
    assert resolve_nf4_mode(params, cfg, 1024) is None


def test_env_force(monkeypatch):
    cfg = _cfg(2)
    params = _nf4_params(cfg)
    monkeypatch.setenv("UNSLOTH_NF4_FUSED", "1")
    assert resolve_nf4_mode(params, cfg, 1024) == "fused"
    monkeypatch.setenv("UNSLOTH_NF4_FUSED", "0")
    assert resolve_nf4_mode(params, cfg, 1024) == "unfused"


def test_auto_budget_small_vs_large(monkeypatch):
    import unsloth_tpu.models.decoder as dec

    monkeypatch.setattr(dec.jax, "default_backend", lambda: "tpu")
    params = _nf4_params(_cfg(2))
    # tiny model, tiny batch -> fits -> unfused
    assert resolve_nf4_mode(params, _cfg(2), 1024) == "unfused"

    # llama-8B full-depth dims at 8K tokens: NF4 weights ~4.4 GB +
    # residuals + CE temps + the dequant margin blow the 13.5 GiB
    # budget -> fused (the memory lever). Stand in for the real 4.4 GB
    # pytree with a leaf that reports those bytes.
    class _Fake:
        dtype = np.dtype(np.uint8)
        size = int(4.4e9)

    params_big = dict(params, bulk=_Fake())
    big = _cfg(32, hidden=4096, inter=14336, vocab=128256)
    assert resolve_nf4_mode(params_big, big, 8192) == "fused"


def test_auto_is_none_on_cpu():
    params = _nf4_params(_cfg(2))
    # pytest runs on the CPU backend: auto must not force anything
    assert resolve_nf4_mode(params, _cfg(2), 1024) is None


def test_dispatch_context_forces_unfused(monkeypatch):
    monkeypatch.setattr(qm.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(qm, "_shapes_ok", lambda q: True)
    monkeypatch.setattr(qm.env, "disable_pallas", lambda: False)
    q = quantize_nf4(jnp.ones((256, 256), jnp.float32))
    assert qm.use_fused_nf4(q) is True
    with qm.nf4_dispatch_mode("unfused"):
        assert qm.use_fused_nf4(q) is False
        with qm.nf4_dispatch_mode(None):
            assert qm.use_fused_nf4(q) is False or True  # env default
    assert qm.use_fused_nf4(q) is True
    with pytest.raises(ValueError):
        with qm.nf4_dispatch_mode("bogus"):
            pass


def test_env_disable_beats_context(monkeypatch):
    monkeypatch.setattr(qm.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(qm, "_shapes_ok", lambda q: True)
    monkeypatch.setattr(qm.env, "disable_pallas", lambda: False)
    monkeypatch.setenv("UNSLOTH_DISABLE_FUSED_NF4", "1")
    q = quantize_nf4(jnp.ones((256, 256), jnp.float32))
    with qm.nf4_dispatch_mode("fused"):
        assert qm.use_fused_nf4(q) is False  # bench baselines rely on it


def test_loss_fn_unfused_matches_fused_on_cpu():
    """End-to-end: loss under both forced dispatch modes is identical on
    the CPU reference path (both fall back to dequant+dot there — this
    guards the plumbing, numerical parity on TPU is covered by the
    qlora_matmul kernel tests)."""
    from unsloth_tpu.models.decoder import loss_fn
    from unsloth_tpu.models.params import quantize_params, init_params

    cfg = _cfg(2, hidden=64, inter=128, vocab=256)
    key = jax.random.PRNGKey(0)
    params = quantize_params(init_params(cfg, key), cfg)
    batch = {
        "input_ids": jax.random.randint(key, (1, 32), 0, cfg.vocab_size),
        "labels": jax.random.randint(key, (1, 32), 0, cfg.vocab_size),
    }
    losses = {}
    for mode, env_val in (("fused", "1"), ("unfused", "0")):
        import os

        os.environ["UNSLOTH_NF4_FUSED"] = env_val
        try:
            losses[mode] = float(loss_fn(params, None, batch, cfg))
        finally:
            os.environ.pop("UNSLOTH_NF4_FUSED", None)
    assert losses["fused"] == pytest.approx(losses["unfused"], rel=1e-6)
