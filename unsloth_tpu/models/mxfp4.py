"""MXFP4 checkpoint interop (gpt-oss).

OpenAI ships gpt-oss MoE expert weights MXFP4-quantized: 32-element blocks
of fp4 (e2m1) values sharing one e8m0 exponent scale. On-disk tensors
(HF serialization, see transformers integrations/mxfp4.py
``convert_moe_packed_tensors`` for the semantics matched here):

  ``...gate_up_proj_blocks``  uint8 [E, 2F, D/32, 16] — element 2j in the
                              LOW nibble of byte j, 2j+1 in the HIGH nibble
                              (note: opposite nibble order from bnb-4bit)
  ``...gate_up_proj_scales``  uint8 [E, 2F, D/32] — exponent + 127

  value = FP4_VALUES[nibble] * 2^(scale - 127)

Dequantization happens once on the host at load time; the result feeds the
same NF4 quantize-on-load / bf16 path as any dense checkpoint. The
reference handles these checkpoints by deferring to HF's Mxfp4 integration
(reference: models/loader.py gpt-oss special-casing around :1087-1094).
"""

from __future__ import annotations

import numpy as np

# The 16 e2m1 values, sign bit high (public format constants).
FP4_VALUES = np.array(
    [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
     -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0], dtype=np.float32)


def dequantize_mxfp4(blocks: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """[*P, G, B] uint8 blocks + [*P, G] uint8 scales -> [*P, G*B*2] fp32."""
    blocks = np.asarray(blocks, np.uint8)
    scales = np.asarray(scales, np.uint8).astype(np.int32) - 127
    assert blocks.shape[:-1] == scales.shape, (blocks.shape, scales.shape)
    *prefix, g, b = blocks.shape
    vals = np.empty((*prefix, g, b * 2), np.float32)
    vals[..., 0::2] = FP4_VALUES[blocks & 0x0F]
    vals[..., 1::2] = FP4_VALUES[blocks >> 4]
    vals *= np.exp2(scales.astype(np.float32))[..., None]
    return vals.reshape(*prefix, g * b * 2)


def is_mxfp4_quantized(reader, base: str) -> bool:
    return base + "_blocks" in reader and base + "_scales" in reader


def load_mxfp4_tensor(reader, base: str) -> np.ndarray:
    """Dequantize ``<base>_blocks``/``<base>_scales``. For the gpt-oss
    expert tensors the result matches HF's bf16 layout: gate_up [E, D, 2F]
    (input-major, transposed from the dequant's row-major [E, 2F, D]),
    down [E, F, D] likewise from [E, D, F]."""
    vals = dequantize_mxfp4(reader.get(base + "_blocks"),
                            reader.get(base + "_scales"))
    # rows are the OUTPUT dim in the quantized layout; HF's bf16 layout for
    # these tensors is input-major, hence the transpose
    # (convert_moe_packed_tensors ends with .transpose(1, 2)).
    return np.ascontiguousarray(vals.transpose(0, 2, 1))
