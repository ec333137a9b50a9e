"""HF checkpoint interop: load, logit parity vs transformers (the golden
oracle — same role as the reference's perplexity/logit parity tests,
SURVEY §4), merged save round-trip, LoRA adapter round-trip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import TINY_LLAMA, TINY_QWEN3, make_hf_checkpoint
from unsloth_tpu.models.loader import FastLanguageModel


@pytest.fixture(scope="module")
def llama_ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_llama"))
    make_hf_checkpoint(path, TINY_LLAMA)
    return path


@pytest.fixture(scope="module")
def qwen3_ckpt(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiny_qwen3"))
    make_hf_checkpoint(path, dict(TINY_QWEN3, attention_bias=False))
    return path


def test_load_and_forward(llama_ckpt):
    model, tok = FastLanguageModel.from_pretrained(
        llama_ckpt, load_in_4bit=False, dtype="float32")
    ids = jnp.arange(16, dtype=jnp.int32)[None] % 128
    logits = model.logits(ids, remat=False)
    assert logits.shape == (1, 16, 128)
    assert bool(jnp.all(jnp.isfinite(logits)))


@pytest.mark.parametrize("ckpt_fixture,hf_cls", [
    ("llama_ckpt", "LlamaForCausalLM"),
    ("qwen3_ckpt", "Qwen3ForCausalLM"),
])
@pytest.mark.slow
def test_logit_parity_vs_transformers(request, ckpt_fixture, hf_cls):
    """Golden parity: our functional forward == HF transformers forward."""
    torch = pytest.importorskip("torch")
    import transformers

    path = request.getfixturevalue(ckpt_fixture)
    model, _ = FastLanguageModel.from_pretrained(
        path, load_in_4bit=False, dtype="float32")

    cls = getattr(transformers, hf_cls)
    hf_model = cls.from_pretrained(path, torch_dtype=torch.float32,
                                   attn_implementation="eager")
    hf_model.eval()

    ids_np = np.arange(32).reshape(1, 32) % 128
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids_np)).logits.numpy()
    ours = np.asarray(model.logits(jnp.asarray(ids_np, jnp.int32),
                                   remat=False))
    np.testing.assert_allclose(ours, hf_logits, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_merged_save_roundtrip(llama_ckpt, tmp_path):
    model, _ = FastLanguageModel.from_pretrained(
        llama_ckpt, load_in_4bit=False, dtype="float32")
    out = str(tmp_path / "merged")
    model.save_pretrained_merged(out)
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    assert os.path.exists(os.path.join(out, "config.json"))

    model2, _ = FastLanguageModel.from_pretrained(
        out, load_in_4bit=False, dtype="float32")
    ids = jnp.arange(16, dtype=jnp.int32)[None] % 128
    l1 = model.logits(ids, remat=False)
    l2 = model2.logits(ids, remat=False)
    # merged save is bf16; allow bf16 rounding
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.slow
def test_lora_merge_changes_weights_correctly(llama_ckpt, tmp_path):
    """Trained-LoRA merge fidelity (reference: tests/qlora/ methodology —
    output of merged model must equal base+adapter output)."""
    model, _ = FastLanguageModel.from_pretrained(
        llama_ckpt, load_in_4bit=False, dtype="float32")
    model = FastLanguageModel.get_peft_model(model, r=4, lora_alpha=8)
    # make LoRA non-trivial
    key = jax.random.PRNGKey(1)
    for layer in model.lora["layers"]:
        for name, lw in layer.items():
            layer[name] = type(lw)(
                a=lw.a, b=jax.random.normal(key, lw.b.shape) * 0.05,
                scale=lw.scale)
    ids = jnp.arange(16, dtype=jnp.int32)[None] % 128
    with_adapter = model.logits(ids, remat=False)

    out = str(tmp_path / "merged_lora")
    model.save_pretrained_merged(out)
    merged, _ = FastLanguageModel.from_pretrained(
        out, load_in_4bit=False, dtype="float32")
    merged_logits = merged.logits(ids, remat=False)
    np.testing.assert_allclose(np.asarray(with_adapter),
                               np.asarray(merged_logits),
                               atol=5e-2, rtol=5e-2)
    # and it must differ from the base model
    base, _ = FastLanguageModel.from_pretrained(
        llama_ckpt, load_in_4bit=False, dtype="float32")
    base_logits = base.logits(ids, remat=False)
    assert float(jnp.max(jnp.abs(with_adapter - base_logits))) > 1e-3


@pytest.mark.slow
def test_lora_adapter_roundtrip(llama_ckpt, tmp_path):
    from unsloth_tpu.export.save import load_lora

    model, _ = FastLanguageModel.from_pretrained(
        llama_ckpt, load_in_4bit=False, dtype="float32")
    model = FastLanguageModel.get_peft_model(
        model, r=4, lora_alpha=8, target_modules=("q_proj", "v_proj"))
    key = jax.random.PRNGKey(2)
    for layer in model.lora["layers"]:
        for name, lw in layer.items():
            layer[name] = type(lw)(
                a=lw.a, b=jax.random.normal(key, lw.b.shape) * 0.1,
                scale=lw.scale)

    out = str(tmp_path / "adapter")
    model.save_lora(out)
    assert os.path.exists(os.path.join(out, "adapter_model.safetensors"))
    cfgj = json.load(open(os.path.join(out, "adapter_config.json")))
    assert set(cfgj["target_modules"]) == {"q_proj", "v_proj"}

    model2, _ = FastLanguageModel.from_pretrained(
        llama_ckpt, load_in_4bit=False, dtype="float32")
    load_lora(model2, out)
    ids = jnp.arange(16, dtype=jnp.int32)[None] % 128
    l1 = model.logits(ids, remat=False)
    l2 = model2.logits(ids, remat=False)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_4bit_load(llama_ckpt):
    model, _ = FastLanguageModel.from_pretrained(
        llama_ckpt, load_in_4bit=True, dtype="float32")
    from unsloth_tpu.ops.nf4 import NF4Tensor

    assert isinstance(model.params["layers"][0]["q"], NF4Tensor)
    ids = jnp.arange(16, dtype=jnp.int32)[None] % 128
    logits = model.logits(ids, remat=False)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_missing_model_errors_clearly():
    with pytest.raises(FileNotFoundError, match="no network"):
        FastLanguageModel.from_pretrained("org/does-not-exist")


@pytest.mark.slow
def test_checkpoint_validation_catches_truncation(tmp_path):
    """Killable-child checkpoint validation (reference: killable snapshot
    prefetch _utils.py:1368 + studio resume validation resume.py:32-62):
    a truncated shard fails BEFORE the training process touches it."""
    import os

    from tests.helpers import TINY_LLAMA, make_hf_checkpoint
    from unsloth_tpu.models.hf_loader import (load_params,
                                              validate_checkpoint)

    ckpt = str(tmp_path / "m")
    make_hf_checkpoint(ckpt, TINY_LLAMA)
    v = validate_checkpoint(ckpt)
    assert v["ok"] and v["tensors"] > 0

    # truncate the shard: validation must fail, and load_params must
    # refuse with a clear error instead of crashing mid-read
    st = os.path.join(ckpt, "model.safetensors")
    size = os.path.getsize(st)
    with open(st, "r+b") as f:
        f.truncate(size // 2)
    v = validate_checkpoint(ckpt)
    assert not v["ok"] and v["error"]
    with pytest.raises(ValueError, match="validation failed"):
        load_params(ckpt)


def test_push_to_hub_stages_then_uploads(llama_ckpt, tmp_path,
                                         monkeypatch):
    """push_to_hub_merged/gguf (reference: save.py:2368,:3395): the
    artifact is staged locally first, the uploader gets the staged
    folder, and an upload failure reports the staged path instead of
    losing the export."""
    from unsloth_tpu.export import save as save_mod

    monkeypatch.setenv("UNSLOTH_CACHE_DIR", str(tmp_path / "cache"))
    calls = []
    monkeypatch.setattr(save_mod, "_hub_upload",
                        lambda repo, folder, token=None, private=False:
                        calls.append((repo, folder)))
    model, tok = FastLanguageModel.from_pretrained(
        llama_ckpt, load_in_4bit=False, dtype="float32")
    staged = model.push_to_hub_merged("me/tiny-merged", tokenizer=tok)
    assert calls[0][0] == "me/tiny-merged" and calls[0][1] == staged
    assert os.path.exists(os.path.join(staged, "model.safetensors"))

    staged_g = model.push_to_hub_gguf("me/tiny-gguf",
                                      quantization_method="q8_0")
    assert any(f.endswith(".gguf") for f in os.listdir(staged_g))

    # failed upload (e.g. offline) -> clear error carrying the staging dir
    def boom(*a, **kw):
        raise OSError("no network")
    monkeypatch.setattr(save_mod, "_hub_upload", boom)
    with pytest.raises(RuntimeError, match="staged at"):
        model.push_to_hub_merged("me/tiny-merged2")
