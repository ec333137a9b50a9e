"""bitsandbytes 4-bit checkpoint interop.

The reference's main distribution channel is pre-quantized
``unsloth/*-bnb-4bit`` repos (reference: models/loader.py:580-610 remaps
full-precision names onto them; kernels/utils.py:567-679 is the CUDA
double-dequant those checkpoints need). This module reads that on-disk
format directly — no bitsandbytes, no torch — and repacks it into our
split-half :class:`~unsloth_tpu.ops.nf4.NF4Tensor` layout on the host.

bnb serialization (``Linear4bit`` via ``quant_state.as_dict(packed=True)``):

  ``<p>.weight``                   uint8 [N/2, 1]; flat row-major nibbles,
                                   element 2j in the HIGH nibble of byte j,
                                   element 2j+1 in the LOW nibble
  ``<p>.weight.absmax``            uint8 codes (double-quant) or fp32
  ``<p>.weight.quant_map``         fp32 [16] NF4 codebook
  ``<p>.weight.nested_absmax``     fp32 per-group scales (double-quant)
  ``<p>.weight.nested_quant_map``  fp32 [256] dynamic-8-bit code table
  ``<p>.weight.quant_state.bitsandbytes__nf4``
                                   uint8 blob of JSON metadata: blocksize,
                                   dtype, shape, nested_blocksize,
                                   nested_offset, quant_type

Double-dequant semantics (must match kernels/utils.py:656-662 bit-exactly):

    absmax_fp32[i] = nested_quant_map[absmax[i]]
                     * nested_absmax[i // nested_blocksize] + nested_offset
    w[k] = quant_map[nibble_k] * absmax_fp32[k // blocksize]

We keep the decoded fp32 absmax (no re-double-quantization): dequantized
values stay bit-identical to what bitsandbytes would produce, at a cost of
3 extra bits/param of scale storage.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.nf4 import NF4_CODE, NF4Tensor

QUANT_STATE_SUFFIXES = (
    ".quant_state.bitsandbytes__nf4",
    ".quant_state.bitsandbytes__fp4",
)


def is_bnb_quantized(reader, name: str) -> bool:
    """True if tensor ``name`` has bnb 4-bit companion tensors."""
    return any(name + s in reader for s in QUANT_STATE_SUFFIXES) or (
        name + ".absmax" in reader and name + ".quant_map" in reader)


def parse_quant_state(blob: np.ndarray) -> Dict[str, Any]:
    """The quant_state companion is a uint8 tensor of JSON bytes."""
    return json.loads(bytes(np.asarray(blob, dtype=np.uint8)).decode())


def decode_absmax(
    absmax: np.ndarray,
    nested_absmax: Optional[np.ndarray],
    nested_quant_map: Optional[np.ndarray],
    nested_blocksize: int,
    nested_offset: float,
) -> np.ndarray:
    """Undo bnb's 8-bit double quantization of the block scales (fp32,
    same op order as cdequantize_blockwise_fp32 + offset add)."""
    if absmax.dtype != np.uint8:
        return absmax.astype(np.float32)
    codes = np.asarray(nested_quant_map, np.float32)[absmax]
    n = absmax.shape[0]
    scales = np.repeat(np.asarray(nested_absmax, np.float32),
                       nested_blocksize)[:n]
    return codes * scales + np.float32(nested_offset)


def repack_interleaved_to_split_half(packed: np.ndarray,
                                     shape) -> np.ndarray:
    """bnb interleaved nibbles -> our split-half [out, in/2] layout.

    Host-side numpy only: the [N, 2]-style interleave intermediate that is
    catastrophic on TPU (tiling pads it 64x) is free here.
    """
    out_f, in_f = shape
    flat = np.asarray(packed, np.uint8).reshape(-1)
    idx = np.empty(flat.size * 2, np.uint8)
    idx[0::2] = flat >> 4
    idx[1::2] = flat & 0xF
    idx = idx.reshape(out_f, in_f)
    half = in_f // 2
    return (idx[:, :half] << 4) | (idx[:, half:])


_DTYPES = {"bfloat16": jnp.bfloat16, "float16": jnp.float16,
           "float32": jnp.float32}


def bnb_to_nf4(
    weight: np.ndarray,
    quant_state: Dict[str, Any],
    absmax: np.ndarray,
    quant_map: Optional[np.ndarray] = None,
    nested_absmax: Optional[np.ndarray] = None,
    nested_quant_map: Optional[np.ndarray] = None,
    dtype=None,
) -> NF4Tensor:
    """Build an NF4Tensor from raw bnb-serialized arrays."""
    qt = quant_state.get("quant_type", "nf4")
    if qt != "nf4":
        raise NotImplementedError(
            f"bnb quant_type {qt!r} is not supported (nf4 only); fp4 "
            f"checkpoints should be re-quantized")
    if quant_map is not None and not np.allclose(
            np.asarray(quant_map, np.float32), NF4_CODE, atol=1e-6):
        raise ValueError("checkpoint quant_map is not the NF4 codebook")
    shape = tuple(int(s) for s in quant_state["shape"])
    blocksize = int(quant_state.get("blocksize", 64))
    if shape[1] % blocksize != 0:
        raise ValueError(
            f"in_features {shape[1]} not divisible by blocksize "
            f"{blocksize}: blocks would span rows")
    absmax_f = decode_absmax(
        np.asarray(absmax),
        nested_absmax, nested_quant_map,
        int(quant_state.get("nested_blocksize", 256)),
        float(quant_state.get("nested_offset", 0.0)))
    packed = repack_interleaved_to_split_half(weight, shape)
    dtype = dtype or _DTYPES.get(str(quant_state.get("dtype", "bfloat16")),
                                 jnp.bfloat16)
    return NF4Tensor(
        packed=jnp.asarray(packed),
        absmax=jnp.asarray(absmax_f, dtype=jnp.float32),
        absmax_scale=None,
        absmax_offset=None,
        shape=shape,
        block_size=blocksize,
        dtype=dtype,
    )


def load_bnb_tensor(reader, name: str, dtype=None) -> NF4Tensor:
    """Read ``name`` plus its bnb companion tensors from a checkpoint."""
    state = None
    for s in QUANT_STATE_SUFFIXES:
        if name + s in reader:
            state = parse_quant_state(reader.get(name + s))
            break
    if state is None:
        raise ValueError(f"{name}: no bnb quant_state companion tensor")

    def opt(suffix):
        return reader.get(name + suffix) if name + suffix in reader else None

    return bnb_to_nf4(
        reader.get(name),
        state,
        absmax=reader.get(name + ".absmax"),
        quant_map=opt(".quant_map"),
        nested_absmax=opt(".nested_absmax"),
        nested_quant_map=opt(".nested_quant_map"),
        dtype=dtype,
    )


# ---------------------------------------------------------------------------
# Native C++ reference (SURVEY 2k.2: independent oracle for parity tests)
# ---------------------------------------------------------------------------

_NATIVE = None
_NATIVE_TRIED = False


def native_ref():
    """ctypes handle to csrc/libnf4_ref.so (built on demand), or None.

    The C++ file reimplements bnb's double-dequant (reference:
    kernels/utils.py:656-662) and our split-half NF4 layout with the
    same single-rounding fp32 op order, so tests can assert the Python
    and JAX decoders BIT-EXACTLY against an independent implementation."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    import ctypes
    import os
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(root, "csrc", "nf4_ref.cpp")
    so = os.path.join(root, "csrc", "libnf4_ref.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", so,
                            src], check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        for fn in ("bnb_decode_absmax", "bnb_nf4_dequantize",
                   "splithalf_nf4_dequantize"):
            getattr(lib, fn).restype = None
        _NATIVE = lib
    except Exception:  # noqa: BLE001 — tests skip when unavailable
        _NATIVE = None
    return _NATIVE


def native_decode_absmax(codes, nested_absmax, nested_quant_map,
                         nested_blocksize: int, offset: float):
    import ctypes

    lib = native_ref()
    codes = np.ascontiguousarray(codes, np.uint8)
    na = np.ascontiguousarray(nested_absmax, np.float32)
    nqm = np.ascontiguousarray(nested_quant_map, np.float32)
    out = np.empty(codes.shape[0], np.float32)
    lib.bnb_decode_absmax(
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(codes.shape[0]),
        na.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nqm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(nested_blocksize), ctypes.c_float(offset),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def native_bnb_dequantize(packed, n_elems: int, quant_map, absmax,
                          blocksize: int):
    import ctypes

    lib = native_ref()
    packed = np.ascontiguousarray(packed, np.uint8).reshape(-1)
    qm = np.ascontiguousarray(quant_map, np.float32)
    am = np.ascontiguousarray(absmax, np.float32)
    out = np.empty(n_elems, np.float32)
    lib.bnb_nf4_dequantize(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n_elems),
        qm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        am.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(blocksize),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def native_splithalf_dequantize(packed, rows: int, cols: int, quant_map,
                                absmax, blocksize: int):
    import ctypes

    lib = native_ref()
    packed = np.ascontiguousarray(packed, np.uint8)
    qm = np.ascontiguousarray(quant_map, np.float32)
    am = np.ascontiguousarray(absmax, np.float32).reshape(-1)
    out = np.empty((rows, cols), np.float32)
    lib.splithalf_nf4_dequantize(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(rows), ctypes.c_int64(cols),
        qm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        am.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(blocksize),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
