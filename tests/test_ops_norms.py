"""RMSNorm / LayerNorm parity tests (reference: kernels/rms_layernorm.py
in-file test suite :301-342 compares Triton vs HF module; here we compare
the fused op — including its custom VJP — against the jnp reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.ops.rms_norm import rms_norm, rms_norm_ref, layer_norm_ref


@pytest.mark.slow
@pytest.mark.parametrize("gemma", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_rms_norm_forward(rng, gemma, dtype):
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (4, 37, 256), dtype) * 3.0
    w = jax.random.normal(k2, (256,), dtype) * 0.1 + 1.0
    out = rms_norm(x, w, 1e-6, gemma)
    ref = rms_norm_ref(x, w, 1e-6, gemma)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol, rtol=tol)


@pytest.mark.slow
@pytest.mark.parametrize("gemma", [False, True])
def test_rms_norm_grad_matches_autodiff(rng, gemma):
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (8, 256), jnp.float32)
    w = jax.random.normal(k2, (256,), jnp.float32) * 0.1 + 1.0

    def f_fused(x, w):
        return jnp.sum(jnp.sin(rms_norm(x, w, 1e-6, gemma)))

    def f_ref(x, w):
        return jnp.sum(jnp.sin(rms_norm_ref(x, w, 1e-6, gemma)))

    gx1, gw1 = jax.grad(f_fused, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               atol=1e-5, rtol=1e-5)


def test_rms_norm_fp32_stats_in_bf16():
    # bf16 inputs with large magnitude: fp32 statistics keep the result sane
    x = (jnp.ones((2, 128), jnp.bfloat16) * 100.0)
    w = jnp.ones((128,), jnp.bfloat16)
    out = rms_norm(x, w, 1e-6, False)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.ones((2, 128), np.float32), atol=1e-2)


def test_layer_norm_ref(rng):
    x = jax.random.normal(rng, (4, 64), jnp.float32)
    w = jnp.ones((64,))
    b = jnp.zeros((64,))
    out = layer_norm_ref(x, w, b)
    np.testing.assert_allclose(np.mean(np.asarray(out), -1), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.std(np.asarray(out), -1), 1.0, atol=1e-2)


@pytest.mark.slow
def test_layer_norm_pallas_matches_ref(rng):
    """Fused LayerNorm (BERT/whisper hot path): fwd + grads vs reference,
    interpret mode on CPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unsloth_tpu.ops.rms_norm import layer_norm, layer_norm_ref

    ks = jax.random.split(rng, 3)
    x = jax.random.normal(ks[0], (5, 37, 256), jnp.float32)
    w = jax.random.normal(ks[1], (256,)) * 0.5 + 1.0
    b = jax.random.normal(ks[2], (256,)) * 0.1

    from unsloth_tpu.ops.rms_norm import _ln_bwd_pallas, _ln_fwd_pallas

    # kernels run in interpret mode on CPU
    got = _ln_fwd_pallas(x, w, b, 1e-5)
    want = layer_norm_ref(x, w, b, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    g = jax.random.normal(ks[0], x.shape, jnp.float32)
    dx, dw, db = _ln_bwd_pallas(x, w, g, 1e-5)
    _, vjp = jax.vjp(lambda x_, w_, b_: layer_norm_ref(x_, w_, b_, 1e-5),
                     x, w, b)
    rx, rw, rb = vjp(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(rw),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(rb),
                               atol=1e-3, rtol=1e-4)

    # the public op + autodiff agree with the reference too
    g1 = jax.grad(lambda x_, w_, b_: jnp.sum(jnp.sin(
        layer_norm(x_, w_, b_, 1e-5))), argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(lambda x_, w_, b_: jnp.sum(jnp.sin(
        layer_norm_ref(x_, w_, b_, 1e-5))), argnums=(0, 1, 2))(x, w, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_norm_pallas_is_opt_in(monkeypatch):
    """Dispatch default is the XLA-fused jnp path even on TPU; the Pallas
    kernels require UNSLOTH_PALLAS_NORM=1 (measured 2.1x slower fwd+bwd at
    the llama 8K shape — bench_artifacts/r5/ln_crossover.jsonl)."""
    import importlib

    import jax as _jax

    mod = importlib.import_module("unsloth_tpu.ops.rms_norm")

    x = jnp.ones((4, 256), jnp.float32)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("UNSLOTH_PALLAS_NORM", raising=False)
    assert not mod._use_pallas(x)
    monkeypatch.setenv("UNSLOTH_PALLAS_NORM", "1")
    assert mod._use_pallas(x)
    # lane alignment still gates the kernel even when opted in
    assert not mod._use_pallas(jnp.ones((4, 100), jnp.float32))


def test_layer_norm_none_bias(rng):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unsloth_tpu.ops.rms_norm import layer_norm, layer_norm_ref

    x = jax.random.normal(rng, (4, 128), jnp.float32)
    w = jnp.ones((128,))
    np.testing.assert_allclose(
        np.asarray(layer_norm(x, w, None, 1e-5)),
        np.asarray(layer_norm_ref(x, w, None, 1e-5)), atol=1e-5)
