"""DoRA tests (reference: models/llama.py:3149 use_dora via peft;
algorithm arXiv:2402.09353). peft itself is the numerical oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unsloth_tpu.ops.lora import (DoRAWeights, LoRAWeights, dora_weight_norm,
                                  init_lora, lora_matmul, merge_lora,
                                  to_dora)

IN_F, OUT_F, R = 32, 48, 8
ALPHA = 16.0
SCALE = ALPHA / R


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(OUT_F, IN_F)).astype(np.float32) * 0.1
    a = rng.normal(size=(R, IN_F)).astype(np.float32) * 0.1
    b = rng.normal(size=(OUT_F, R)).astype(np.float32) * 0.1
    m = rng.uniform(0.5, 1.5, size=(OUT_F,)).astype(np.float32)
    x = rng.normal(size=(4, IN_F)).astype(np.float32)
    return w, a, b, m, x


def test_dora_forward_matches_explicit():
    w, a, b, m, x = _setup()
    lw = DoRAWeights(a=jnp.asarray(a), b=jnp.asarray(b), scale=SCALE,
                     m=jnp.asarray(m))
    y = np.asarray(lora_matmul(jnp.asarray(x), jnp.asarray(w), lw))
    wp = w + SCALE * (b @ a)
    c = np.linalg.norm(wp, axis=1)
    expected = x @ (wp * (m / c)[:, None]).T
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-5)


def test_dora_matches_peft():
    torch = pytest.importorskip("torch")
    peft = pytest.importorskip("peft")

    w, a, b, m, x = _setup(1)

    class M(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.lin = torch.nn.Linear(IN_F, OUT_F, bias=False)

        def forward(self, x):
            return self.lin(x)

    tm = M()
    with torch.no_grad():
        tm.lin.weight.copy_(torch.from_numpy(w))
    cfg = peft.LoraConfig(r=R, lora_alpha=ALPHA, lora_dropout=0.0,
                          target_modules=["lin"], use_dora=True,
                          init_lora_weights=True)
    pm = peft.get_peft_model(tm, cfg)
    layer = pm.base_model.model.lin
    with torch.no_grad():
        layer.lora_A["default"].weight.copy_(torch.from_numpy(a))
        layer.lora_B["default"].weight.copy_(torch.from_numpy(b))
        layer.lora_magnitude_vector["default"].weight.copy_(
            torch.from_numpy(m))

    tx = torch.from_numpy(x).requires_grad_(False)
    ty = pm(tx)
    loss_t = (ty * ty).sum()
    loss_t.backward()

    lw = DoRAWeights(a=jnp.asarray(a), b=jnp.asarray(b), scale=SCALE,
                     m=jnp.asarray(m))

    def loss_fn(lw):
        y = lora_matmul(jnp.asarray(x), jnp.asarray(w), lw)
        return jnp.sum(y * y)

    loss_j, grads = jax.value_and_grad(loss_fn)(lw)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()),
                               rtol=2e-4)
    y_j = np.asarray(lora_matmul(jnp.asarray(x), jnp.asarray(w), lw))
    np.testing.assert_allclose(y_j, ty.detach().numpy(), rtol=1e-4,
                               atol=1e-5)
    # gradient parity, incl. the detached-norm semantics
    np.testing.assert_allclose(
        np.asarray(grads.m),
        layer.lora_magnitude_vector["default"].weight.grad.numpy(),
        rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads.a), layer.lora_A["default"].weight.grad.numpy(),
        rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads.b), layer.lora_B["default"].weight.grad.numpy(),
        rtol=2e-3, atol=1e-5)


def test_dora_init_is_plain_lora():
    """Zero-init B + magnitude init => step-0 forward == plain LoRA."""
    w, _, _, _, x = _setup(2)
    lw = init_lora(jax.random.PRNGKey(0), IN_F, OUT_F, R, ALPHA)
    dw = to_dora(jnp.asarray(w), lw)
    y_lora = np.asarray(lora_matmul(jnp.asarray(x), jnp.asarray(w), lw))
    y_dora = np.asarray(lora_matmul(jnp.asarray(x), jnp.asarray(w), dw))
    np.testing.assert_allclose(y_dora, y_lora, rtol=1e-5, atol=1e-6)


def test_dora_norm_formula_matches_materialized():
    w, a, b, m, _ = _setup(3)
    lw = DoRAWeights(a=jnp.asarray(a), b=jnp.asarray(b), scale=SCALE,
                     m=jnp.asarray(m))
    got = np.asarray(dora_weight_norm(jnp.asarray(w), lw))
    expected = np.linalg.norm(w + SCALE * (b @ a), axis=1)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_dora_nf4_base():
    from unsloth_tpu.ops.nf4 import dequantize_nf4, quantize_nf4

    w, a, b, m, x = _setup(4)
    q = quantize_nf4(jnp.asarray(w), block_size=32)
    lw = DoRAWeights(a=jnp.asarray(a), b=jnp.asarray(b), scale=SCALE,
                     m=jnp.asarray(m))
    y = np.asarray(lora_matmul(jnp.asarray(x), q, lw))
    wd = np.asarray(dequantize_nf4(q, dtype=jnp.float32))
    wp = wd + SCALE * (b @ a)
    expected = x @ (wp * (m / np.linalg.norm(wp, axis=1))[:, None]).T
    np.testing.assert_allclose(y, expected, rtol=2e-3, atol=1e-4)


def test_dora_merge_matches_forward():
    w, a, b, m, x = _setup(5)
    lw = DoRAWeights(a=jnp.asarray(a), b=jnp.asarray(b), scale=SCALE,
                     m=jnp.asarray(m))
    merged = np.asarray(merge_lora(jnp.asarray(w), lw, dtype=jnp.float32))
    y_merged = x @ merged.T
    y_dora = np.asarray(lora_matmul(jnp.asarray(x), jnp.asarray(w), lw))
    np.testing.assert_allclose(y_merged, y_dora, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_dora_e2e_train_and_save(rng, tmp_path):
    from unsloth_tpu.export.save import load_lora_tree, save_lora
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.decoder import loss_fn
    from unsloth_tpu.models.loader import FastLanguageModel, LanguageModel
    from unsloth_tpu.models.params import init_params

    cfg = ModelConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=2, num_kv_heads=2)
    model = LanguageModel(cfg=cfg, params=init_params(cfg, rng))
    FastLanguageModel.get_peft_model(model, r=8, use_dora=True,
                                     use_gradient_checkpointing=False)
    assert isinstance(model.lora["layers"][0]["q"], DoRAWeights)

    ids = jnp.arange(16, dtype=jnp.int32)[None, :] % 64
    batch = {"input_ids": ids, "labels": ids}
    loss, grads = jax.value_and_grad(
        lambda lora: loss_fn(model.params, lora, batch, cfg))(model.lora)
    assert np.isfinite(float(loss))
    gm = grads["layers"][0]["q"].m
    assert np.all(np.isfinite(np.asarray(gm)))

    save_lora(model, str(tmp_path))
    tree, lc = load_lora_tree(str(tmp_path), cfg.num_layers)
    lw = tree["layers"][0]["q"]
    assert isinstance(lw, DoRAWeights)
    np.testing.assert_allclose(np.asarray(lw.m),
                               np.asarray(model.lora["layers"][0]["q"].m),
                               rtol=1e-6)
    assert lc["use_dora"] is True


def test_dora_stacked_layout(rng):
    """get_peft_model(use_dora=True) on PRE-STACKED params (the scan
    layout) must produce the same loss as the list layout."""
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.decoder import loss_fn, stack_params
    from unsloth_tpu.models.loader import FastLanguageModel, LanguageModel
    from unsloth_tpu.models.params import init_params

    cfg = ModelConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=2, num_kv_heads=2)
    params = init_params(cfg, rng)
    ids = jnp.arange(16, dtype=jnp.int32)[None, :] % 64
    batch = {"input_ids": ids, "labels": ids}

    m1 = LanguageModel(cfg=cfg, params=params)
    FastLanguageModel.get_peft_model(m1, r=8, use_dora=True,
                                     use_gradient_checkpointing=False)
    l1 = float(loss_fn(m1.params, m1.lora, batch, cfg))

    m2 = LanguageModel(cfg=cfg, params=stack_params(params))
    FastLanguageModel.get_peft_model(m2, r=8, use_dora=True,
                                     use_gradient_checkpointing=False)
    assert "layers_stacked" in m2.lora
    l2 = float(loss_fn(m2.params, m2.lora, batch, cfg))
    assert abs(l1 - l2) < 1e-4, (l1, l2)


def test_dora_gguf_adapter_refused(rng):
    """GGUF's LoRA adapter format has no magnitude tensor — exporting a
    DoRA adapter there would silently drop the decomposition."""
    from unsloth_tpu.export.gguf import save_lora_gguf
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import FastLanguageModel, LanguageModel
    from unsloth_tpu.models.params import init_params

    cfg = ModelConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=2, num_kv_heads=2)
    model = LanguageModel(cfg=cfg, params=init_params(cfg, rng))
    FastLanguageModel.get_peft_model(model, r=8, use_dora=True,
                                     use_gradient_checkpointing=False)
    with pytest.raises(ValueError, match="DoRA"):
        save_lora_gguf(model, "/tmp/dora-adapter.gguf")
