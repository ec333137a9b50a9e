"""GGUF decode independence (VERDICT r3 #4).

Every quant tier the writer ships must round-trip through TWO separately
implemented + separately compiled decoders bit-exactly:
  1. the decoder in csrc/gguf_quant.cpp (transcribed with the quantizer)
  2. the fresh wire-format implementation in csrc/gguf_dequant_ref.cpp

plus the python GGUF loader on a real exported checkpoint file. A
transcription bug in either side breaks the agreement. Also pins the
IQ1-3 refusal list to the reference's IMATRIX_QUANTS names exactly
(reference: unsloth/save.py:162-175).
"""

import numpy as np
import pytest

from unsloth_tpu.export.gguf_dequant_ref import _native_lib, ref_dequantize
from unsloth_tpu.export.gguf_writer import (GGMLType, dequantize_tensor,
                                            quantize_tensor)

ALL_TIERS = [
    GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0,
    GGMLType.Q5_1, GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
    GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.IQ4_NL, GGMLType.IQ4_XS,
]


@pytest.fixture(scope="module", autouse=True)
def _needs_native():
    if _native_lib() is None:
        pytest.skip("reference decoder .so failed to build")


@pytest.mark.parametrize("ggml_type", ALL_TIERS, ids=lambda t: t.name)
def test_two_decoders_agree_bit_exact(ggml_type):
    rng = np.random.RandomState(int(ggml_type))
    # several rows, mixed magnitudes, exact zeros, negatives
    x = rng.randn(4, 512).astype(np.float32)
    x[0] *= 1e-3
    x[1] *= 30.0
    x[2, :17] = 0.0
    raw = quantize_tensor(x, ggml_type, n_per_row=512)
    a = dequantize_tensor(raw, ggml_type, x.size)
    b = ref_dequantize(raw, ggml_type, x.size)
    # bit-exact: both decode the same bytes with the same arithmetic
    np.testing.assert_array_equal(
        a.view(np.uint32), b.view(np.uint32),
        err_msg=f"{ggml_type.name}: decoders disagree")


@pytest.mark.parametrize("ggml_type", ALL_TIERS, ids=lambda t: t.name)
def test_imatrix_weighted_decode_agrees(ggml_type):
    if ggml_type in (GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1,
                     GGMLType.Q5_0, GGMLType.Q5_1):
        pytest.skip("imatrix weights only steer K-quant/IQ searches")
    rng = np.random.RandomState(7)
    x = rng.randn(4, 512).astype(np.float32)
    qw = np.abs(rng.randn(512)).astype(np.float32) + 0.1
    raw = quantize_tensor(x, ggml_type, n_per_row=512, quant_weights=qw)
    a = dequantize_tensor(raw, ggml_type, x.size)
    b = ref_dequantize(raw, ggml_type, x.size)
    np.testing.assert_array_equal(a.view(np.uint32), b.view(np.uint32))


def test_exported_checkpoint_decodes_identically(tmp_path):
    """A real save_pretrained_gguf artifact, every tensor through both
    decoders (not just synthetic buffers)."""
    from tests.helpers import TINY_LLAMA, make_hf_checkpoint
    from unsloth_tpu.export.gguf import save_pretrained_gguf
    from unsloth_tpu.export.gguf_writer import read_gguf
    from unsloth_tpu.models.loader import FastLanguageModel

    # K-quants need 256-divisible rows; the default tiny dims fall back
    # to f16 and would exercise nothing
    cfg = dict(TINY_LLAMA, hidden_size=256, intermediate_size=256,
               vocab_size=256)
    ckpt = str(tmp_path / "m")
    make_hf_checkpoint(ckpt, cfg)
    model, _ = FastLanguageModel.from_pretrained(
        ckpt, load_in_4bit=False, max_seq_length=128)
    out = save_pretrained_gguf(model, str(tmp_path / "g"),
                               quantization_method="q4_k_m")
    md, tensors, raws = read_gguf(out, return_raw=True)
    checked = 0
    for name, arr in tensors.items():
        raw, ggml_type = raws[name]
        if GGMLType(ggml_type) not in ALL_TIERS:
            continue
        b = ref_dequantize(np.frombuffer(raw, np.uint8),
                           GGMLType(ggml_type), arr.size)
        np.testing.assert_array_equal(
            arr.reshape(-1).astype(np.float32).view(np.uint32),
            b.view(np.uint32), err_msg=name)
        checked += 1
    assert checked >= 3  # quantized attn/mlp tensors actually exercised


def test_refusal_list_mirrors_reference_imatrix_quants():
    """The IQ tier names must track the reference's menu exactly: IQ1-3
    refused (grid codebooks unreproducible offline), IQ4 shipped."""
    from unsloth_tpu.export.gguf import (_GRID_CODEBOOK_QUANTS,
                                         QUANT_ALIASES, save_to_gguf)

    reference_imatrix_quants = [
        "iq1_s", "iq1_m", "iq2_xxs", "iq2_xs", "iq2_s", "iq2_m",
        "iq3_xxs", "iq3_s", "iq3_m", "iq4_nl", "iq4_xs",
    ]  # unsloth/save.py:162-175
    refused = [q for q in reference_imatrix_quants if q.startswith(
        ("iq1", "iq2", "iq3"))]
    assert list(_GRID_CODEBOOK_QUANTS) == refused
    for q in refused:
        with pytest.raises(ValueError, match="E8-lattice"):
            save_to_gguf(None, "/tmp/x.gguf", quantization_method=q)
    for q in ("iq4_nl", "iq4_xs"):
        assert q in QUANT_ALIASES
