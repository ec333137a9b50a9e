"""Independent GGUF decoder (csrc/gguf_dequant_ref.cpp via ctypes).

Second decode path for every quant tier the writer ships, implemented and
compiled separately from the quantizer (csrc/gguf_quant.cpp) so a
transcription bug there cannot self-validate (VERDICT r3 #4; north-star
"bit-exact GGUF parity"). tests/test_gguf_ref_decode.py asserts both
decoders agree bit-exactly on every tier.
"""

import ctypes
import os
import subprocess

import numpy as np

from .gguf_writer import GGMLType

_LIB = None
_LIB_TRIED = False

_FUNCS = {
    GGMLType.Q8_0: "ref_dequant_q8_0",
    GGMLType.Q4_0: "ref_dequant_q4_0",
    GGMLType.Q4_1: "ref_dequant_q4_1",
    GGMLType.Q5_0: "ref_dequant_q5_0",
    GGMLType.Q5_1: "ref_dequant_q5_1",
    GGMLType.Q2_K: "ref_dequant_q2_K",
    GGMLType.Q3_K: "ref_dequant_q3_K",
    GGMLType.Q4_K: "ref_dequant_q4_K",
    GGMLType.Q5_K: "ref_dequant_q5_K",
    GGMLType.Q6_K: "ref_dequant_q6_K",
    GGMLType.IQ4_NL: "ref_dequant_iq4_nl",
    GGMLType.IQ4_XS: "ref_dequant_iq4_xs",
}


def _native_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(root, "csrc", "gguf_dequant_ref.cpp")
    so = os.path.join(root, "csrc", "libgguf_dequant_ref.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        for name in _FUNCS.values():
            getattr(lib, name).restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def ref_dequantize(raw: np.ndarray, ggml_type: GGMLType,
                   n: int) -> np.ndarray:
    """Decode raw GGUF tensor bytes with the independent decoder."""
    if ggml_type == GGMLType.F32:
        return raw.view(np.float32)[:n].copy()
    if ggml_type == GGMLType.F16:
        return raw.view(np.float16)[:n].astype(np.float32)
    if ggml_type == GGMLType.BF16:
        u = raw.view(np.uint16)[:n].astype(np.uint32) << 16
        return u.view(np.float32).copy()
    fn_name = _FUNCS.get(ggml_type)
    if fn_name is None:
        raise ValueError(f"no reference decoder for {ggml_type}")
    lib = _native_lib()
    if lib is None:
        raise RuntimeError("csrc/libgguf_dequant_ref.so failed to build")
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    out = np.empty(n, np.float32)
    getattr(lib, fn_name)(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n))
    return out
