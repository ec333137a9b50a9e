"""Pre-quantized bnb-4bit checkpoint loading (VERDICT r1 missing #1).

The oracle below is an independent implementation of bitsandbytes'
4-bit serialization semantics (interleaved nibble packing + dynamic-8-bit
double-quantized absmax + JSON quant_state), written from the on-disk
format spec. Loader dequantization must match the oracle's double-dequant
(reference semantics: kernels/utils.py:567-679) BIT-EXACTLY.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from unsloth_tpu.models.bnb import (bnb_to_nf4, decode_absmax,
                                    is_bnb_quantized, load_bnb_tensor,
                                    parse_quant_state,
                                    repack_interleaved_to_split_half)
from unsloth_tpu.ops.nf4 import NF4_CODE, dequantize_nf4


# A strictly increasing 256-entry code table standing in for bnb's dynamic
# map — the loader must use whatever table the checkpoint stores, so any
# monotonic table exercises the same code path.
DYN_MAP = np.sort(np.tanh(np.linspace(-3.0, 3.0, 256))).astype(np.float32)


def bnb_quantize_4bit(w, blocksize=64, nested_blocksize=256):
    """Quantize [out, in] fp32 -> the bnb-4bit on-disk tensor set."""
    out_f, in_f = w.shape
    flat = w.reshape(-1).astype(np.float32)
    blocks = flat.reshape(-1, blocksize)
    absmax = np.abs(blocks).max(axis=1).astype(np.float32)
    safe = np.where(absmax == 0, 1.0, absmax)
    norm = blocks / safe[:, None]
    idx = np.abs(norm[..., None] - NF4_CODE).argmin(-1).astype(np.uint8)
    flat_idx = idx.reshape(-1)
    # interleaved packing: element 2j in the high nibble of byte j
    packed = ((flat_idx[0::2] << 4) | flat_idx[1::2]).astype(np.uint8)
    weight = packed.reshape(-1, 1)

    # dynamic-8-bit double quantization of absmax
    offset = np.float32(absmax.mean())
    centered = absmax - offset
    n = centered.shape[0]
    pad = (-n) % nested_blocksize
    cpad = np.pad(centered, (0, pad))
    groups = cpad.reshape(-1, nested_blocksize)
    a2 = np.abs(groups).max(axis=1).astype(np.float32)
    a2 = np.where(a2 == 0, 1.0, a2)
    codes = np.abs((groups / a2[:, None])[..., None]
                   - DYN_MAP).argmin(-1).astype(np.uint8)
    state = {
        "quant_type": "nf4", "blocksize": blocksize, "dtype": "float32",
        "shape": [out_f, in_f], "nested_blocksize": nested_blocksize,
        "nested_offset": float(offset), "nested_dtype": "float32",
    }
    return {
        "weight": weight,
        "absmax": codes.reshape(-1)[:n],
        "quant_map": NF4_CODE.copy(),
        "nested_absmax": a2,
        "nested_quant_map": DYN_MAP.copy(),
        "quant_state": np.frombuffer(
            json.dumps(state).encode(), np.uint8).copy(),
    }, state


def oracle_dequant(t, state):
    """The bnb double-dequant, straight from the kernel semantics."""
    absmax = (DYN_MAP[t["absmax"]]
              * np.repeat(t["nested_absmax"],
                          state["nested_blocksize"])[:t["absmax"].size]
              + np.float32(state["nested_offset"]))
    flat = t["weight"].reshape(-1)
    vals = np.empty(flat.size * 2, np.float32)
    vals[0::2] = NF4_CODE[flat >> 4]
    vals[1::2] = NF4_CODE[flat & 0xF]
    blocks = vals.reshape(-1, state["blocksize"]) * absmax[:, None]
    return blocks.reshape(state["shape"]).astype(np.float32)


def test_repack_round_trip():
    rng = np.random.RandomState(0)
    idx = rng.randint(0, 16, (8, 128)).astype(np.uint8)
    flat = idx.reshape(-1)
    interleaved = ((flat[0::2] << 4) | flat[1::2]).reshape(-1, 1)
    ours = repack_interleaved_to_split_half(interleaved, (8, 128))
    # decode split-half: hi nibble = first half, lo = second half
    half = 64
    assert (ours >> 4 == idx[:, :half]).all()
    assert (ours & 0xF == idx[:, half:]).all()


def test_bit_exact_dequant_vs_oracle():
    rng = np.random.RandomState(1)
    w = (rng.randn(16, 256) * 0.05).astype(np.float32)
    tensors, state = bnb_quantize_4bit(w)
    q = bnb_to_nf4(tensors["weight"], state, tensors["absmax"],
                   quant_map=tensors["quant_map"],
                   nested_absmax=tensors["nested_absmax"],
                   nested_quant_map=tensors["nested_quant_map"],
                   dtype=jnp.float32)
    got = np.asarray(dequantize_nf4(q, jnp.float32))
    want = oracle_dequant(tensors, state)
    np.testing.assert_array_equal(got, want)  # bit-exact
    # and it's actually close to the original weight
    assert np.sqrt(np.mean((got - w) ** 2)) < 0.01


def test_plain_fp32_absmax_supported():
    rng = np.random.RandomState(2)
    w = (rng.randn(8, 128) * 0.1).astype(np.float32)
    tensors, state = bnb_quantize_4bit(w)
    # non-nested variant: fp32 absmax straight in the file
    absmax = decode_absmax(tensors["absmax"], tensors["nested_absmax"],
                           tensors["nested_quant_map"],
                           state["nested_blocksize"],
                           state["nested_offset"])
    q = bnb_to_nf4(tensors["weight"], state, absmax.astype(np.float32),
                   dtype=jnp.float32)
    got = np.asarray(dequantize_nf4(q, jnp.float32))
    np.testing.assert_array_equal(got, oracle_dequant(tensors, state))


def test_fp4_rejected():
    rng = np.random.RandomState(3)
    w = (rng.randn(8, 128) * 0.1).astype(np.float32)
    tensors, state = bnb_quantize_4bit(w)
    state = dict(state, quant_type="fp4")
    with pytest.raises(NotImplementedError):
        bnb_to_nf4(tensors["weight"], state, tensors["absmax"])


def _make_bnb_checkpoint(path, hf_config, seed=0):
    """Fabricate a tiny unsloth/*-bnb-4bit-style checkpoint: linears stored
    as bnb 4-bit tensor sets, embeddings/norms fp32. Returns the dense fp32
    oracle weights."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(seed)
    d = hf_config["hidden_size"]
    v = hf_config["vocab_size"]
    f = hf_config["intermediate_size"]
    n_heads = hf_config["num_attention_heads"]
    n_kv = hf_config["num_key_value_heads"]
    dh = d // n_heads

    def w(*shape, scale=0.02):
        return (rng.randn(*shape) * scale).astype(np.float32)

    dense = {}
    tensors = {
        "model.embed_tokens.weight": w(v, d),
        "model.norm.weight": np.ones(d, np.float32),
        "lm_head.weight": w(v, d),
    }
    for i in range(hf_config["num_hidden_layers"]):
        p = f"model.layers.{i}."
        linears = {
            "self_attn.q_proj": w(n_heads * dh, d),
            "self_attn.k_proj": w(n_kv * dh, d),
            "self_attn.v_proj": w(n_kv * dh, d),
            "self_attn.o_proj": w(d, n_heads * dh),
            "mlp.gate_proj": w(f, d),
            "mlp.up_proj": w(f, d),
            "mlp.down_proj": w(d, f),
        }
        for name, dw in linears.items():
            t, state = bnb_quantize_4bit(dw)
            dense[p + name] = oracle_dequant(t, state)
            base = p + name + ".weight"
            tensors[base] = t["weight"]
            tensors[base + ".absmax"] = t["absmax"]
            tensors[base + ".quant_map"] = t["quant_map"]
            tensors[base + ".nested_absmax"] = t["nested_absmax"]
            tensors[base + ".nested_quant_map"] = t["nested_quant_map"]
            tensors[base + ".quant_state.bitsandbytes__nf4"] = \
                t["quant_state"]
        tensors[p + "input_layernorm.weight"] = np.ones(d, np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(
            d, np.float32)
    save_file(tensors, os.path.join(path, "model.safetensors"),
              metadata={"format": "pt"})
    cfg = dict(hf_config)
    cfg["quantization_config"] = {
        "quant_method": "bitsandbytes", "load_in_4bit": True,
        "bnb_4bit_quant_type": "nf4", "bnb_4bit_use_double_quant": True,
    }
    with open(os.path.join(path, "config.json"), "w") as fh:
        json.dump(cfg, fh)
    return dense


@pytest.mark.slow
def test_load_bnb_checkpoint_end_to_end(tmp_path):
    """from_pretrained on a bnb-4bit dir: every linear arrives as an
    NF4Tensor whose dequant is bit-exact with bnb's, and the model runs."""
    from helpers import TINY_LLAMA
    from unsloth_tpu.models.hf_loader import CheckpointReader, load_params
    from unsloth_tpu.models.config import ModelConfig
    from unsloth_tpu.models.loader import FastLanguageModel
    from unsloth_tpu.ops.nf4 import NF4Tensor

    path = str(tmp_path / "bnb4")
    dense = _make_bnb_checkpoint(path, TINY_LLAMA)

    reader = CheckpointReader(path)
    assert is_bnb_quantized(
        reader, "model.layers.0.self_attn.q_proj.weight")
    q = load_bnb_tensor(
        reader, "model.layers.0.self_attn.q_proj.weight",
        dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(dequantize_nf4(q, jnp.float32)),
        dense["model.layers.0.self_attn.q_proj"])
    reader.close()

    model, tok = FastLanguageModel.from_pretrained(
        path, load_in_4bit=True, dtype=jnp.float32)
    for name in ("q", "k", "v", "o", "gate", "up", "down"):
        leaf = model.params["layers"][0][name]
        assert isinstance(leaf, NF4Tensor), name
    hf = "model.layers.1.mlp.down_proj"
    np.testing.assert_array_equal(
        np.asarray(dequantize_nf4(model.params["layers"][1]["down"],
                                  jnp.float32)),
        dense[hf])
    ids = jnp.asarray(np.arange(8)[None, :])
    logits = model.logits(ids)
    assert np.isfinite(np.asarray(logits)).all()


def test_mxfp4_dequant_matches_transformers():
    """MXFP4 host dequant vs transformers' convert_moe_packed_tensors
    (the oracle the real gpt-oss checkpoints are decoded with)."""
    torch = pytest.importorskip("torch")
    from transformers.integrations.mxfp4 import convert_moe_packed_tensors

    from unsloth_tpu.models.mxfp4 import dequantize_mxfp4

    rng = np.random.RandomState(0)
    e, two_f, g, bts = 2, 8, 4, 16
    blocks = rng.randint(0, 256, (e, two_f, g, bts)).astype(np.uint8)
    scales = rng.randint(110, 140, (e, two_f, g)).astype(np.uint8)

    want = convert_moe_packed_tensors(
        torch.tensor(blocks), torch.tensor(scales),
        dtype=torch.float32).numpy()          # [E, D, 2F]
    ours = dequantize_mxfp4(blocks, scales)   # [E, 2F, D]
    np.testing.assert_array_equal(ours.transpose(0, 2, 1), want)


@pytest.mark.slow
def test_gpt_oss_mxfp4_checkpoint_loads(tmp_path):
    """A gpt-oss checkpoint with MXFP4 expert tensors loads and matches a
    checkpoint with the equivalent dequantized bf16 experts."""
    pytest.importorskip("torch")
    import shutil
    from safetensors.numpy import save_file
    from transformers import GptOssConfig, GptOssForCausalLM
    import torch

    from unsloth_tpu.models.loader import FastLanguageModel

    cfg = GptOssConfig(
        vocab_size=96, hidden_size=64, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=2, num_experts_per_tok=1,
        sliding_window=8, max_position_embeddings=128,
        tie_word_embeddings=False, pad_token_id=0)
    torch.manual_seed(0)
    m = GptOssForCausalLM(cfg)
    base = str(tmp_path / "dense")
    m.save_pretrained(base, safe_serialization=True)

    # build the MXFP4 variant: replace expert tensors with blocks/scales
    # whose dequantization is exactly representable (values k * 0.5 with
    # scale 2^0), so both checkpoints decode to identical weights
    from safetensors import safe_open

    rng = np.random.RandomState(1)
    with safe_open(base + "/model.safetensors", framework="numpy") as f:
        tensors = {k: f.get_tensor(k) for k in f.keys()}
    quant = str(tmp_path / "mxfp4")
    shutil.copytree(base, quant)
    from unsloth_tpu.models.mxfp4 import dequantize_mxfp4

    p = "model.layers.0.mlp.experts."
    for name, fdim in (("gate_up_proj", 128), ("down_proj", 64)):
        arr = tensors.pop(p + name)              # [E, in, out]
        e_dim, in_dim, out_dim = arr.shape
        blocks = rng.randint(0, 256, (e_dim, out_dim, in_dim // 32, 16)
                             ).astype(np.uint8)
        scales = np.full((e_dim, out_dim, in_dim // 32), 126, np.uint8)
        tensors[p + name + "_blocks"] = blocks
        tensors[p + name + "_scales"] = scales
    save_file(tensors, quant + "/model.safetensors",
              metadata={"format": "pt"})

    model, _ = FastLanguageModel.from_pretrained(quant, load_in_4bit=False,
                                                 dtype="float32")
    experts = model.params["layers"][0]["experts"]
    # gate weight [E, F, D] must equal our dequant of the fabricated blocks
    want_gup = dequantize_mxfp4(
        tensors[p + "gate_up_proj_blocks"],
        tensors[p + "gate_up_proj_scales"]).transpose(0, 2, 1)  # [E,D,2F]
    np.testing.assert_allclose(
        np.asarray(experts["gate"]),
        want_gup[:, :, 0::2].transpose(0, 2, 1), rtol=1e-6)
    ids = jnp.asarray(np.arange(8)[None, :], jnp.int32)
    assert np.isfinite(np.asarray(model.logits(ids, remat=False))).all()


def test_cpp_reference_bit_exact():
    """The independent C++ oracle (csrc/nf4_ref.cpp, SURVEY 2k.2)
    matches the numpy double-dequant and the JAX split-half decode
    BIT-EXACTLY (same fp32 op order)."""
    import pytest

    from unsloth_tpu.models.bnb import (bnb_to_nf4, native_bnb_dequantize,
                                        native_decode_absmax, native_ref,
                                        native_splithalf_dequantize)
    from unsloth_tpu.ops.nf4 import _decode_absmax

    if native_ref() is None:
        pytest.skip("g++ unavailable")

    rng = np.random.RandomState(0)
    w = (rng.randn(64, 128) * 0.1).astype(np.float32)
    tensors, state = bnb_quantize_4bit(w)

    # absmax double-dequant: C++ == numpy bitwise
    am_np = decode_absmax(tensors["absmax"], tensors["nested_absmax"],
                          tensors["nested_quant_map"],
                          state["nested_blocksize"],
                          state["nested_offset"])
    am_cpp = native_decode_absmax(tensors["absmax"],
                                  tensors["nested_absmax"],
                                  tensors["nested_quant_map"],
                                  state["nested_blocksize"],
                                  state["nested_offset"])
    np.testing.assert_array_equal(am_np.view(np.uint32),
                                  am_cpp.view(np.uint32))

    # flat interleaved dequant: C++ == the oracle used by the repo tests
    want = oracle_dequant(tensors, state)
    got = native_bnb_dequantize(tensors["weight"], w.size,
                                tensors["quant_map"], am_np,
                                state["blocksize"]).reshape(w.shape)
    np.testing.assert_array_equal(want.astype(np.float32).view(np.uint32),
                                  got.view(np.uint32))

    # split-half layout: C++ == the JAX decode path bitwise
    q = bnb_to_nf4(tensors["weight"], state, absmax=tensors["absmax"],
                   quant_map=tensors["quant_map"],
                   nested_absmax=tensors["nested_absmax"],
                   nested_quant_map=tensors["nested_quant_map"],
                   dtype=jnp.float32)
    jax_deq = np.asarray(dequantize_nf4(q, jnp.float32))
    cpp_deq = native_splithalf_dequantize(
        np.asarray(q.packed), q.shape[0], q.shape[1],
        np.asarray(NF4_CODE, np.float32), np.asarray(_decode_absmax(q)),
        q.block_size)
    np.testing.assert_array_equal(jax_deq.view(np.uint32),
                                  cpp_deq.view(np.uint32))
