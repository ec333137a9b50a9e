"""GGUF export tests: container round-trip through our reader,
quantization error bounds, C++/numpy quantizer parity, end-to-end model
export with tokenizer metadata (the reference's GGUF conversion checks,
save.py + chat_templates.py:3019 tokenization parity)."""

import json
import os

import numpy as np
import pytest

from unsloth_tpu.export.gguf_writer import (GGMLType, GGUFWriter,
                                            _native_lib, _q4_0_numpy,
                                            _q8_0_numpy, dequantize_tensor,
                                            quantize_tensor, read_gguf)


def test_container_roundtrip(tmp_path):
    path = str(tmp_path / "t.gguf")
    w = GGUFWriter(path)
    w.add_metadata("general.architecture", "llama")
    w.add_metadata("llama.block_count", 2)
    w.add_metadata("llama.rope.freq_base", 10000.0)
    w.add_metadata("tokenizer.ggml.tokens", ["a", "b", "c"])
    w.add_metadata("some.flag", True)
    rng = np.random.RandomState(0)
    t1 = rng.randn(8, 64).astype(np.float32)
    t2 = rng.randn(64).astype(np.float32)
    w.add_tensor("blk.0.attn_q.weight", t1, GGMLType.F32)
    w.add_tensor("blk.0.attn_norm.weight", t2, GGMLType.F16)
    w.write()

    md, tensors, data = read_gguf(path, load_tensors=True)
    assert md["general.architecture"] == "llama"
    assert md["llama.block_count"] == 2
    assert md["tokenizer.ggml.tokens"] == ["a", "b", "c"]
    assert md["some.flag"] is True
    assert abs(md["llama.rope.freq_base"] - 10000.0) < 1e-3
    assert tensors[0]["shape"] == (8, 64)
    np.testing.assert_array_equal(data["blk.0.attn_q.weight"], t1)
    np.testing.assert_allclose(data["blk.0.attn_norm.weight"], t2,
                               atol=2e-3)


@pytest.mark.parametrize("ggml_type,tol", [
    (GGMLType.Q8_0, 0.006), (GGMLType.Q4_0, 0.12)])
def test_quantization_error_bounds(ggml_type, tol):
    rng = np.random.RandomState(1)
    x = rng.randn(4096).astype(np.float32)
    raw = quantize_tensor(x, ggml_type)
    back = dequantize_tensor(raw, ggml_type, x.size)
    rel = np.abs(back - x).max() / np.abs(x).max()
    assert rel < tol, rel


def test_cpp_matches_numpy_q8_0():
    lib = _native_lib()
    if lib is None:
        pytest.skip("native quantizer unavailable")
    rng = np.random.RandomState(2)
    x = rng.randn(2048).astype(np.float32)
    native = quantize_tensor(x, GGMLType.Q8_0)
    ref = _q8_0_numpy(x)
    np.testing.assert_array_equal(native, ref)


def test_cpp_matches_numpy_q4_0():
    lib = _native_lib()
    if lib is None:
        pytest.skip("native quantizer unavailable")
    rng = np.random.RandomState(3)
    x = rng.randn(2048).astype(np.float32)
    native = quantize_tensor(x, GGMLType.Q4_0)
    ref = _q4_0_numpy(x)
    np.testing.assert_array_equal(native, ref)


def test_fp16_conversion_matches_numpy():
    lib = _native_lib()
    if lib is None:
        pytest.skip("native quantizer unavailable")
    rng = np.random.RandomState(4)
    x = np.concatenate([
        rng.randn(1024).astype(np.float32) * 100,
        np.array([0.0, -0.0, 1e-8, 65519.0, -65519.0, 1e6], np.float32),
    ])
    native = quantize_tensor(x, GGMLType.F16).view(np.float16)
    ref = x.astype(np.float16)
    np.testing.assert_array_equal(native.view(np.uint16),
                                  ref.view(np.uint16))


def test_bf16_round_to_nearest_even():
    x = np.array([1.0, 1.0000001, -3.14159, 65504.0], np.float32)
    raw = quantize_tensor(x, GGMLType.BF16)
    back = dequantize_tensor(raw, GGMLType.BF16, x.size)
    import ml_dtypes

    ref = x.astype(ml_dtypes.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(back, ref)


@pytest.mark.slow
def test_model_export_end_to_end(tmp_path):
    """Full pipeline: tiny HF checkpoint -> FastLanguageModel -> GGUF file
    parsed back with correct metadata, tensor set, and dequantized values
    close to the merged weights."""
    from tests.helpers import TINY_LLAMA, make_hf_checkpoint
    from unsloth_tpu.export.gguf import save_pretrained_gguf
    from unsloth_tpu.export.gguf_writer import read_gguf
    from unsloth_tpu.models.loader import FastLanguageModel

    ckpt = str(tmp_path / "m")
    make_hf_checkpoint(ckpt, TINY_LLAMA)
    # write a minimal tokenizer.json for metadata extraction
    tok = {"model": {"type": "BPE",
                     "vocab": {chr(33 + i): i for i in range(90)},
                     "merges": []},
           "added_tokens": [{"id": 90, "content": "<s>"},
                            {"id": 91, "content": "</s>"}]}
    with open(os.path.join(ckpt, "tokenizer.json"), "w") as f:
        json.dump(tok, f)

    model, _ = FastLanguageModel.from_pretrained(ckpt, load_in_4bit=False,
                                                 dtype="float32")
    out = save_pretrained_gguf(model, str(tmp_path / "gguf"),
                               quantization_method="q8_0")
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "gguf" / "Modelfile"))

    md, tensors, data = read_gguf(out, load_tensors=True)
    assert md["general.architecture"] == "llama"
    assert md["llama.block_count"] == TINY_LLAMA["num_hidden_layers"]
    assert md["llama.embedding_length"] == TINY_LLAMA["hidden_size"]
    assert len(md["tokenizer.ggml.tokens"]) == TINY_LLAMA["vocab_size"]
    names = {t["name"] for t in tensors}
    assert "token_embd.weight" in names
    assert "output.weight" in names
    assert "blk.1.ffn_down.weight" in names
    # norms stay f32
    norm = [t for t in tensors if t["name"] == "blk.0.attn_norm.weight"][0]
    assert norm["type"] == GGMLType.F32
    # value fidelity vs source weights
    import jax

    q_src = np.asarray(jax.device_get(model.params["layers"][0]["q"]))
    q_gguf = data["blk.0.attn_q.weight"]
    assert np.abs(q_gguf - q_src).max() < 0.01 * max(np.abs(q_src).max(), 1)


def _rmse(a, b):
    return np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(b ** 2))


@pytest.mark.parametrize("ggml_type,max_rmse", [
    # 4-bit gaussian quantization floor is ~7-8% relative RMSE; 6-bit ~2%
    (GGMLType.Q4_K, 0.085), (GGMLType.Q6_K, 0.035)])
def test_kquant_roundtrip(ggml_type, max_rmse):
    if _native_lib() is None:
        pytest.skip("native quantizer unavailable")
    rng = np.random.RandomState(5)
    x = (rng.randn(4096) * 0.1).astype(np.float32)
    raw = quantize_tensor(x, ggml_type)
    back = dequantize_tensor(raw, ggml_type, x.size)
    assert _rmse(back, x) < max_rmse, _rmse(back, x)


def test_q4_k_beats_q4_0():
    """The K-quant's sub-block scale+min must beat plain Q4_0 RMSE."""
    if _native_lib() is None:
        pytest.skip("native quantizer unavailable")
    rng = np.random.RandomState(6)
    x = (rng.randn(65536) * 0.1).astype(np.float32)
    q4k = dequantize_tensor(quantize_tensor(x, GGMLType.Q4_K),
                            GGMLType.Q4_K, x.size)
    q40 = dequantize_tensor(quantize_tensor(x, GGMLType.Q4_0),
                            GGMLType.Q4_0, x.size)
    assert _rmse(q4k, x) < _rmse(q40, x) * 0.9, (
        _rmse(q4k, x), _rmse(q40, x))


@pytest.mark.slow
def test_q4_k_m_mix_policy(tmp_path):
    """Q4_K_M export: use_more_bits layers get Q6_K attn_v/ffn_down,
    output.weight Q6_K, norms F32."""
    if _native_lib() is None:
        pytest.skip("native quantizer unavailable")
    import jax

    from tests.helpers import TINY_LLAMA, make_hf_checkpoint
    from unsloth_tpu.export.gguf import save_pretrained_gguf
    from unsloth_tpu.models.loader import FastLanguageModel

    # dims must be multiples of 256 for K-quants
    cfg = dict(TINY_LLAMA, hidden_size=256, intermediate_size=256,
               num_hidden_layers=8, vocab_size=512,
               num_attention_heads=4, num_key_value_heads=2)
    ckpt = str(tmp_path / "m")
    make_hf_checkpoint(ckpt, cfg)
    model, _ = FastLanguageModel.from_pretrained(ckpt, load_in_4bit=False,
                                                 dtype="float32")
    out = save_pretrained_gguf(model, str(tmp_path / "g"),
                               quantization_method="q4_k_m")
    md, tensors, data = read_gguf(out, load_tensors=True)
    types = {t["name"]: t["type"] for t in tensors}
    assert types["output.weight"] == GGMLType.Q6_K
    assert types["blk.0.attn_v.weight"] == GGMLType.Q6_K  # first n/8
    assert types["blk.4.attn_q.weight"] == GGMLType.Q4_K
    assert types["blk.0.attn_norm.weight"] == GGMLType.F32
    # value fidelity
    q_src = np.asarray(jax.device_get(model.params["layers"][0]["q"]))
    err = np.abs(data["blk.0.attn_q.weight"] - q_src).max()
    assert err < 0.15 * np.abs(q_src).max()


def test_lora_gguf_adapter_export(tmp_path, rng):
    """LoRA -> GGUF adapter (llama.cpp convert_lora_to_gguf format):
    metadata + per-projection lora_a/lora_b tensors that reconstruct the
    same merged weight as merged_params."""
    import jax.numpy as jnp

    from unsloth_tpu.export.gguf import save_lora_gguf
    from unsloth_tpu.export.save import merged_params
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_lora_tree, init_params

    cfg = ModelConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=32)
    params = init_params(cfg, rng)
    model = LanguageModel(cfg=cfg, params=params)
    model.lora = init_lora_tree(cfg, rng, r=4, alpha=8)
    # make B nonzero so the adapter actually does something
    import jax

    model.lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 if hasattr(x, "shape") else x, model.lora)
    model.lora_config = {"r": 4, "lora_alpha": 8}

    path = str(tmp_path / "adapter.gguf")
    save_lora_gguf(model, path)
    md, tensors, data = read_gguf(path, load_tensors=True)
    assert md["general.type"] == "adapter"
    assert md["adapter.type"] == "lora"
    assert abs(md["adapter.lora.alpha"] - 8.0) < 1e-6

    a = data["blk.0.attn_q.weight.lora_a"]
    b = data["blk.0.attn_q.weight.lora_b"]
    assert a.shape[0] == 4 and b.shape[1] == 4
    scale = md["adapter.lora.alpha"] / a.shape[0]
    merged = merged_params(model)
    want = np.asarray(merged["layers"][0]["q"], np.float32)
    base = np.asarray(params["layers"][0]["q"], np.float32)
    # merged_params rounds to bf16; the GGUF adapter keeps fp32
    np.testing.assert_allclose(base + scale * (b @ a), want,
                               atol=2e-4, rtol=8e-3)


@pytest.mark.parametrize("scheme", ["W8A16", "W8A8", "FP8"])
def test_compressed_tensors_export(tmp_path, rng, scheme):
    """compressed-tensors checkpoint export (reference:
    _compressed_quantize.py): int8/fp8 weights + per-channel scales +
    the quantization_config block, round-trips within quant error."""
    import jax.numpy as jnp
    from safetensors import safe_open

    from unsloth_tpu.export.compressed import save_compressed
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_params

    cfg = ModelConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=2, num_kv_heads=2,
                      max_position_embeddings=32)
    params = init_params(cfg, rng)
    model = LanguageModel(cfg=cfg, params=params,
                          hf_config={"model_type": "llama"})
    out = str(tmp_path / f"ct-{scheme}")
    save_compressed(model, out, scheme=scheme)

    with open(out + "/config.json") as f:
        qc = json.load(f)["quantization_config"]
    assert qc["quant_method"] == "compressed-tensors"
    assert qc["config_groups"]["group_0"]["weights"]["num_bits"] == 8
    assert ("input_activations" in qc["config_groups"]["group_0"]) == (
        scheme in ("W8A8", "FP8"))

    if scheme == "FP8":
        import torch

        with safe_open(out + "/model.safetensors", framework="pt") as f:
            q = f.get_tensor("model.layers.0.self_attn.q_proj.weight")
            s = f.get_tensor(
                "model.layers.0.self_attn.q_proj.weight_scale").numpy()
        assert q.dtype == torch.float8_e4m3fn
        back = q.to(torch.float32).numpy() * s
    else:
        with safe_open(out + "/model.safetensors",
                       framework="numpy") as f:
            q = f.get_tensor("model.layers.0.self_attn.q_proj.weight")
            s = f.get_tensor(
                "model.layers.0.self_attn.q_proj.weight_scale")
        assert q.dtype == np.int8
        back = q.astype(np.float32) * s
    want = np.asarray(params["layers"][0]["q"], np.float32)
    rel = np.abs(back - want).max() / np.abs(want).max()
    # fp8 e4m3 has 3 mantissa bits (~6% worst-case step); int8 ~0.8%
    assert rel < (0.06 if scheme == "FP8" else 0.02), rel


@pytest.mark.parametrize("ggml_type,max_rmse", [
    (GGMLType.IQ4_NL, 0.085), (GGMLType.IQ4_XS, 0.085)])
def test_iq4_roundtrip(ggml_type, max_rmse):
    """IQ4 non-linear 4-bit codecs (ggml block_iq4_nl / block_iq4_xs;
    reference: save.py:3806 reaches these via llama-quantize)."""
    if _native_lib() is None:
        pytest.skip("native quantizer unavailable")
    rng = np.random.RandomState(7)
    x = (rng.randn(16, 1024) * 0.1).astype(np.float32)
    raw = quantize_tensor(x, ggml_type, n_per_row=1024)
    bpb, epb = {GGMLType.IQ4_NL: (18, 32),
                GGMLType.IQ4_XS: (136, 256)}[ggml_type]
    assert raw.size == x.size // epb * bpb
    back = dequantize_tensor(raw, ggml_type, x.size)
    assert _rmse(back, x.reshape(-1)) < max_rmse, _rmse(back, x.reshape(-1))


def test_iq4_nl_beats_q4_0():
    """The non-linear codebook must beat the uniform Q4_0 grid on
    gaussian weights (that is its whole point)."""
    if _native_lib() is None:
        pytest.skip("native quantizer unavailable")
    rng = np.random.RandomState(8)
    x = (rng.randn(256, 256) * 0.1).astype(np.float32)
    iq = dequantize_tensor(quantize_tensor(x, GGMLType.IQ4_NL,
                                           n_per_row=256),
                           GGMLType.IQ4_NL, x.size)
    q40 = dequantize_tensor(quantize_tensor(x, GGMLType.Q4_0),
                            GGMLType.Q4_0, x.size)
    flat = x.reshape(-1)
    assert _rmse(iq, flat) < _rmse(q40, flat), (
        _rmse(iq, flat), _rmse(q40, flat))


def test_iq4_xs_imatrix_lowers_weighted_error():
    """Per-row imatrix importance weights steer the IQ4_XS search: the
    weighted-quantized tensor must have lower IMPORTANCE-WEIGHTED error
    than the unweighted one (llama.cpp imatrix semantics)."""
    if _native_lib() is None:
        pytest.skip("native quantizer unavailable")
    rng = np.random.RandomState(9)
    x = (rng.randn(64, 512) * 0.1).astype(np.float32)
    # importance concentrated on a contiguous channel span
    qw = np.ones(512, np.float32)
    qw[:128] = 50.0
    plain = dequantize_tensor(
        quantize_tensor(x, GGMLType.IQ4_XS, n_per_row=512),
        GGMLType.IQ4_XS, x.size).reshape(64, 512)
    weighted = dequantize_tensor(
        quantize_tensor(x, GGMLType.IQ4_XS, n_per_row=512,
                        quant_weights=qw),
        GGMLType.IQ4_XS, x.size).reshape(64, 512)
    def werr(y):
        return float((qw[None, :] * (y - x) ** 2).sum())
    assert werr(weighted) <= werr(plain), (werr(weighted), werr(plain))


def test_iq4_zero_block():
    if _native_lib() is None:
        pytest.skip("native quantizer unavailable")
    x = np.zeros(512, np.float32)
    for t in (GGMLType.IQ4_NL, GGMLType.IQ4_XS):
        back = dequantize_tensor(quantize_tensor(x, t, n_per_row=512),
                                 t, x.size)
        np.testing.assert_array_equal(back, 0)


def test_model_export_iq4_xs(tmp_path):
    """End-to-end: save_to_gguf with iq4_xs (+imatrix) produces a
    readable container with IQ4_XS tensors and a Q6_K output head."""
    from unsloth_tpu.export.gguf import save_to_gguf
    from unsloth_tpu.export.gguf_writer import read_gguf
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_params

    import jax

    cfg = ModelConfig(vocab_size=512, hidden_size=256,
                      intermediate_size=512, num_layers=2, num_heads=4,
                      num_kv_heads=2, max_position_embeddings=128)
    model = LanguageModel(cfg=cfg,
                          params=init_params(cfg, jax.random.PRNGKey(0)))
    imatrix = {"blk.0.attn_q.weight": np.abs(
        np.random.RandomState(0).randn(256).astype(np.float32)) + 0.1}
    out = str(tmp_path / "m.gguf")
    save_to_gguf(model, out, quantization_method="iq4_xs",
                 imatrix=imatrix)
    md, tensors, data = read_gguf(out, load_tensors=True)
    assert md["general.file_type"] == 30
    assert "blk.0.attn_q.weight" in data
    # reconstruction sanity on the imatrix-weighted tensor
    orig = np.asarray(model.params["layers"][0]["q"], np.float32)
    got = data["blk.0.attn_q.weight"].reshape(orig.shape)
    assert _rmse(got, orig) < 0.1


# ---------------------------------------------------------------------------
# r3: full quant menu — q4_1/q5_0/q5_1, q2_k/q3_k/q5_k, imatrix k-quants
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ggml_type,max_rmse", [
    # bits-per-weight rmse floors on gaussian data
    (GGMLType.Q4_1, 0.10), (GGMLType.Q5_0, 0.055), (GGMLType.Q5_1, 0.05),
    (GGMLType.Q5_K, 0.045), (GGMLType.Q3_K, 0.17), (GGMLType.Q2_K, 0.30)])
def test_new_quant_roundtrip(ggml_type, max_rmse):
    if _native_lib() is None:
        pytest.skip("native quantizer unavailable")
    rng = np.random.RandomState(11)
    x = (rng.randn(16, 1024) * 0.1).astype(np.float32)
    raw = quantize_tensor(x, ggml_type, n_per_row=1024)
    from unsloth_tpu.export.gguf_writer import _TYPE_TRAITS
    bpb, epb = _TYPE_TRAITS[ggml_type]
    assert raw.size == x.size // epb * bpb
    back = dequantize_tensor(raw, ggml_type, x.size)
    assert _rmse(back, x.reshape(-1)) < max_rmse, _rmse(back, x.reshape(-1))


def test_quant_quality_ordering():
    """More bits -> lower RMSE, across the whole menu."""
    if _native_lib() is None:
        pytest.skip("native quantizer unavailable")
    rng = np.random.RandomState(12)
    x = (rng.randn(64, 1024) * 0.1).astype(np.float32)
    flat = x.reshape(-1)

    def rt(t):
        return _rmse(dequantize_tensor(
            quantize_tensor(x, t, n_per_row=1024), t, x.size), flat)

    order = [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K,
             GGMLType.Q6_K, GGMLType.Q8_0]
    errs = [rt(t) for t in order]
    for a, b in zip(errs[:-1], errs[1:]):
        assert b < a, (order, errs)
    # q5_0 between q4_* and q6_k; q5_1/q4_1 beat their _0 siblings
    assert rt(GGMLType.Q5_0) < rt(GGMLType.Q4_0)
    assert rt(GGMLType.Q5_1) < rt(GGMLType.Q5_0)
    assert rt(GGMLType.Q4_1) < rt(GGMLType.Q4_0)


def test_q5_0_bit_packing_layout():
    """The fifth bit must land in the qh bitfield exactly as ggml lays it
    out (element i -> bit i; elements 16..31 -> bits 16..31)."""
    if _native_lib() is None:
        pytest.skip("native quantizer unavailable")
    # values chosen so q = x/d + 16.5 spans both halves of the 5-bit range
    x = np.arange(-16, 16, dtype=np.float32)
    raw = quantize_tensor(x, GGMLType.Q5_0)
    assert raw.size == 22
    d = raw[0:2].copy().view(np.float16).astype(np.float32)[0]
    qh = int(raw[2:6].copy().view(np.uint32)[0])
    qs = raw[6:]
    vals = np.empty(32, np.float32)
    for i in range(16):
        q0 = (qs[i] & 0xF) | (((qh >> i) & 1) << 4)
        q1 = (qs[i] >> 4) | (((qh >> (i + 16)) & 1) << 4)
        vals[i] = (int(q0) - 16) * d
        vals[i + 16] = (int(q1) - 16) * d
    back = dequantize_tensor(raw, GGMLType.Q5_0, 32)
    np.testing.assert_array_equal(vals, back)
    assert np.abs(back - x).max() <= abs(d)


@pytest.mark.parametrize("ggml_type", [
    GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K,
    GGMLType.Q6_K])
def test_kquant_imatrix_lowers_weighted_error(ggml_type):
    """The imatrix path must lower importance-weighted error vs the
    unweighted quantization (llama.cpp's imatrix-aware k-quants;
    reference: save.py:3806)."""
    if _native_lib() is None:
        pytest.skip("native quantizer unavailable")
    rng = np.random.RandomState(13)
    x = (rng.randn(64, 512) * 0.1).astype(np.float32)
    qw = np.ones(512, np.float32)
    qw[:64] = 100.0
    plain = dequantize_tensor(
        quantize_tensor(x, ggml_type, n_per_row=512),
        ggml_type, x.size).reshape(64, 512)
    weighted = dequantize_tensor(
        quantize_tensor(x, ggml_type, n_per_row=512, quant_weights=qw),
        ggml_type, x.size).reshape(64, 512)

    def werr(y):
        return float((qw[None, :] * (y - x) ** 2).sum())

    assert werr(weighted) <= werr(plain) * 1.001, (
        ggml_type, werr(weighted), werr(plain))


@pytest.mark.parametrize("t", [
    GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q2_K,
    GGMLType.Q3_K, GGMLType.Q5_K])
def test_new_quant_zero_block(t):
    if _native_lib() is None:
        pytest.skip("native quantizer unavailable")
    x = np.zeros(1024, np.float32)
    back = dequantize_tensor(quantize_tensor(x, t, n_per_row=1024),
                             t, x.size)
    np.testing.assert_array_equal(back, 0)


def test_q5_k_m_mix_policy(tmp_path):
    """The reference's 'Recommended' tier: q5_k_m upgrades attn_v/ffn_down
    to Q6_K on use_more_bits layers; q3_k_l uses Q5_K for v/o/down on all
    layers; q2_k uses Q4_K for v/down (reference: save.py:140-150)."""
    from unsloth_tpu.export.gguf import _type_for, _use_more_bits

    n_layer = 8
    shape = (256, 1024)
    for i in range(n_layer):
        t = _type_for(f"blk.{i}.attn_v.weight", shape, GGMLType.Q5_K,
                      method="q5_k_m", n_layer=n_layer)
        expect = GGMLType.Q6_K if _use_more_bits(i, n_layer) \
            else GGMLType.Q5_K
        assert t == expect, (i, t)
        assert _type_for(f"blk.{i}.attn_q.weight", shape, GGMLType.Q5_K,
                         method="q5_k_m", n_layer=n_layer) == GGMLType.Q5_K
    assert _type_for("blk.0.attn_output.weight", shape, GGMLType.Q3_K,
                     method="q3_k_l", n_layer=n_layer) == GGMLType.Q5_K
    assert _type_for("blk.5.ffn_down.weight", shape, GGMLType.Q3_K,
                     method="q3_k_m", n_layer=n_layer) == GGMLType.Q4_K
    assert _type_for("blk.5.ffn_up.weight", shape, GGMLType.Q3_K,
                     method="q3_k_s", n_layer=n_layer) == GGMLType.Q3_K
    assert _type_for("blk.3.ffn_down.weight", shape, GGMLType.Q2_K,
                     method="q2_k", n_layer=n_layer) == GGMLType.Q4_K
    assert _type_for("output.weight", shape, GGMLType.Q2_K,
                     method="q2_k_l", n_layer=n_layer) == GGMLType.Q8_0
    assert _type_for("token_embd.weight", shape, GGMLType.Q2_K,
                     method="q2_k_l", n_layer=n_layer) == GGMLType.Q8_0


def test_model_export_q5_k_m(tmp_path):
    """A user asking for the reference's recommended tier gets a valid
    file (the r2 gap: q5_k_m raised an error)."""
    from unsloth_tpu.export.gguf import save_to_gguf
    from unsloth_tpu.export.gguf_writer import read_gguf
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_params

    import jax

    cfg = ModelConfig(vocab_size=512, hidden_size=256,
                      intermediate_size=512, num_layers=2, num_heads=4,
                      num_kv_heads=2, max_position_embeddings=128)
    model = LanguageModel(cfg=cfg,
                          params=init_params(cfg, jax.random.PRNGKey(0)))
    out = str(tmp_path / "m.gguf")
    save_to_gguf(model, out, quantization_method="q5_k_m")
    md, tensors, data = read_gguf(out, load_tensors=True)
    assert md["general.file_type"] == 17
    types = {t["name"]: t["type"] for t in tensors}
    assert types["blk.0.attn_q.weight"] == GGMLType.Q5_K
    assert types["blk.1.attn_v.weight"] == GGMLType.Q6_K  # more-bits layer
    orig = np.asarray(model.params["layers"][0]["q"], np.float32)
    got = data["blk.0.attn_q.weight"].reshape(orig.shape)
    assert _rmse(got, orig) < 0.06


def test_save_pretrained_gguf_tier_list(tmp_path):
    """quantization_method may be a LIST of tiers (reference:
    save.py:1862 iterates the list, producing one GGUF per tier); the
    Modelfile points at the first tier."""
    from unsloth_tpu.export.gguf import save_pretrained_gguf
    from unsloth_tpu.export.gguf_writer import read_gguf
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import LanguageModel
    from unsloth_tpu.models.params import init_params

    import jax

    cfg = ModelConfig(vocab_size=512, hidden_size=256,
                      intermediate_size=512, num_layers=2, num_heads=4,
                      num_kv_heads=2, max_position_embeddings=128)
    model = LanguageModel(cfg=cfg,
                          params=init_params(cfg, jax.random.PRNGKey(0)))
    paths = save_pretrained_gguf(model, str(tmp_path / "g"),
                                 quantization_method=["q4_k_m", "q8_0"])
    assert [os.path.basename(p) for p in paths] == [
        "model-Q4_K_M.gguf", "model-Q8_0.gguf"]
    for p, ftype in zip(paths, (15, 7)):
        md, _, _ = read_gguf(p)
        assert md["general.file_type"] == ftype
    with open(tmp_path / "g" / "Modelfile") as f:
        assert "FROM ./model-Q4_K_M.gguf" in f.read()


def test_iq_grid_quants_refused():
    """IQ1/IQ2/IQ3 need llama.cpp's trained grid tables — exporting a
    file that would silently misdecode is refused with guidance
    (reference menu: save.py:140-173)."""
    import pytest

    from unsloth_tpu.export.gguf import save_to_gguf

    with pytest.raises(ValueError, match="E8-lattice"):
        save_to_gguf(None, "/tmp/x.gguf", quantization_method="iq2_xxs")


def test_iq_menu_mirrors_reference_imatrix_quants():
    """The refused grid-codebook tiers plus the shipped iq4 tiers must
    together be EXACTLY the reference's IMATRIX_QUANTS menu
    (reference unsloth/save.py:162-175) — no name invented, none missing."""
    from unsloth_tpu.export.gguf import _GRID_CODEBOOK_QUANTS

    reference_imatrix_quants = {
        "iq1_s", "iq1_m", "iq2_xxs", "iq2_xs", "iq2_s", "iq2_m",
        "iq3_xxs", "iq3_s", "iq3_m", "iq4_nl", "iq4_xs",
    }
    shipped_iq = {"iq4_nl", "iq4_xs"}
    assert set(_GRID_CODEBOOK_QUANTS) | shipped_iq == \
        reference_imatrix_quants
    assert set(_GRID_CODEBOOK_QUANTS) & shipped_iq == set()
