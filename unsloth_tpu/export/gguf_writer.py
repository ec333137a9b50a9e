"""GGUF v3 file writer + minimal reader.

Replaces the reference's llama.cpp `convert_hf_to_gguf.py` + `llama-quantize`
subprocess pipeline (reference: save.py:1856-2250 `save_to_gguf`
orchestration, :1445-1814 llama.cpp build) with a native writer: the GGUF
container format (public GGML spec) is written directly and block
quantization runs in C++ (csrc/gguf_quant.cpp, ctypes) with a numpy
fallback.

Supported tensor types: F32, F16, BF16, Q8_0, Q4_0.
"""

from __future__ import annotations

import ctypes
import enum
import os
import struct
import subprocess
from typing import Any, BinaryIO, Dict, List, Sequence, Tuple, Union

import numpy as np

GGUF_MAGIC = 0x46554747  # "GGUF" little-endian
GGUF_VERSION = 3
DEFAULT_ALIGNMENT = 32


class GGUFValueType(enum.IntEnum):
    UINT8 = 0
    INT8 = 1
    UINT16 = 2
    INT16 = 3
    UINT32 = 4
    INT32 = 5
    FLOAT32 = 6
    BOOL = 7
    STRING = 8
    ARRAY = 9
    UINT64 = 10
    INT64 = 11
    FLOAT64 = 12


class GGMLType(enum.IntEnum):
    F32 = 0
    F16 = 1
    Q4_0 = 2
    Q4_1 = 3
    Q5_0 = 6
    Q5_1 = 7
    Q8_0 = 8
    Q2_K = 10
    Q3_K = 11
    Q4_K = 12
    Q5_K = 13
    Q6_K = 14
    IQ4_NL = 20
    IQ4_XS = 23
    BF16 = 30


# bytes per block, elements per block
_TYPE_TRAITS = {
    GGMLType.F32: (4, 1),
    GGMLType.F16: (2, 1),
    GGMLType.BF16: (2, 1),
    GGMLType.Q8_0: (34, 32),
    GGMLType.Q4_0: (18, 32),
    GGMLType.Q4_1: (20, 32),
    GGMLType.Q5_0: (22, 32),
    GGMLType.Q5_1: (24, 32),
    GGMLType.Q2_K: (84, 256),
    GGMLType.Q3_K: (110, 256),
    GGMLType.Q4_K: (144, 256),
    GGMLType.Q5_K: (176, 256),
    GGMLType.Q6_K: (210, 256),
    GGMLType.IQ4_NL: (18, 32),
    GGMLType.IQ4_XS: (136, 256),
}

# Simple 32-element blocks with a native (src, dst, n) API.
_NATIVE_SIMPLE = {GGMLType.Q8_0: ("quantize_q8_0", "dequantize_q8_0"),
                  GGMLType.Q4_0: ("quantize_q4_0", "dequantize_q4_0"),
                  GGMLType.Q4_1: ("quantize_q4_1", "dequantize_q4_1"),
                  GGMLType.Q5_0: ("quantize_q5_0", "dequantize_q5_0"),
                  GGMLType.Q5_1: ("quantize_q5_1", "dequantize_q5_1")}

# K-quants and IQ types take (src, dst, nrow, n_per_row, qw-or-NULL) —
# the llama.cpp row API; qw = per-column imatrix importance weights.
_NATIVE_ROWS = {GGMLType.Q2_K: ("quantize_q2_K", "dequantize_q2_K"),
                GGMLType.Q3_K: ("quantize_q3_K", "dequantize_q3_K"),
                GGMLType.Q4_K: ("quantize_q4_K", "dequantize_q4_K"),
                GGMLType.Q5_K: ("quantize_q5_K", "dequantize_q5_K"),
                GGMLType.Q6_K: ("quantize_q6_K", "dequantize_q6_K"),
                GGMLType.IQ4_NL: ("quantize_iq4_nl", "dequantize_iq4_nl"),
                GGMLType.IQ4_XS: ("quantize_iq4_xs", "dequantize_iq4_xs")}


# ---------------------------------------------------------------------------
# Native quantizer (C++ via ctypes), numpy fallback
# ---------------------------------------------------------------------------

_LIB = None
_LIB_TRIED = False


def _native_lib():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(root, "csrc", "gguf_quant.cpp")
    so = os.path.join(root, "csrc", "libgguf_quant.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        names = ["fp32_to_fp16_buffer"]
        for q, d in list(_NATIVE_SIMPLE.values()) + list(
                _NATIVE_ROWS.values()):
            names += [q, d]
        for name in names:
            getattr(lib, name).restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _q8_0_numpy(x: np.ndarray) -> np.ndarray:
    blocks = x.reshape(-1, 32).astype(np.float32)
    amax = np.abs(blocks).max(axis=1)
    d = amax / 127.0
    id_ = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    # roundf = round-half-away-from-zero (numpy rounds half-to-even)
    scaled = blocks * id_[:, None]
    q = np.trunc(scaled + np.copysign(0.5, scaled)).astype(np.int8)
    out = np.empty((blocks.shape[0], 34), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = q.view(np.uint8)
    return out.reshape(-1)


def _q4_0_numpy(x: np.ndarray) -> np.ndarray:
    blocks = x.reshape(-1, 32).astype(np.float32)
    idx = np.abs(blocks).argmax(axis=1)
    maxv = blocks[np.arange(blocks.shape[0]), idx]
    d = maxv / -8.0
    id_ = np.where(d != 0, 1.0 / np.where(d == 0, 1, d), 0.0)
    q = np.clip(blocks * id_[:, None] + 8.5, 0, 15).astype(np.uint8)
    lo, hi = q[:, :16], q[:, 16:]
    packed = (lo | (hi << 4)).astype(np.uint8)
    out = np.empty((blocks.shape[0], 18), np.uint8)
    out[:, 0:2] = d.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = packed
    return out.reshape(-1)


def quantize_tensor(x: np.ndarray, ggml_type: GGMLType,
                    n_per_row: int = 0,
                    quant_weights: np.ndarray = None) -> np.ndarray:
    """fp32 array -> raw GGUF tensor bytes.

    n_per_row + quant_weights: per-row imatrix importance weights for the
    K-quant / IQ4 searches (llama.cpp's imatrix-weighted quantization;
    reference: save.py:3806 runs llama-imatrix + llama-quantize)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    n = x.size
    if ggml_type == GGMLType.F32:
        return x.view(np.uint8).reshape(-1)
    if ggml_type == GGMLType.F16:
        lib = _native_lib()
        if lib is not None:
            out = np.empty(n, np.uint16)
            lib.fp32_to_fp16_buffer(
                x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                ctypes.c_int64(n))
            return out.view(np.uint8)
        return x.astype(np.float16).view(np.uint8).reshape(-1)
    if ggml_type == GGMLType.BF16:
        as_u32 = x.view(np.uint32)
        rounded = ((as_u32 + 0x7FFF + ((as_u32 >> 16) & 1)) >> 16).astype(
            np.uint16)
        return rounded.view(np.uint8)
    if ggml_type in _NATIVE_SIMPLE:
        assert n % 32 == 0, "quantized tensors need row size % 32 == 0"
        lib = _native_lib()
        if lib is not None:
            bpb, epb = _TYPE_TRAITS[ggml_type]
            out = np.empty(n // epb * bpb, np.uint8)
            fn = getattr(lib, _NATIVE_SIMPLE[ggml_type][0])
            fn(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
               out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
               ctypes.c_int64(n))
            return out
        if ggml_type == GGMLType.Q8_0:
            return _q8_0_numpy(x)
        if ggml_type == GGMLType.Q4_0:
            return _q4_0_numpy(x)
        raise RuntimeError(
            f"{ggml_type.name} requires the native quantizer "
            f"(csrc/libgguf_quant.so failed to build)")
    if ggml_type in _NATIVE_ROWS:
        return _quantize_rows(x, ggml_type, n_per_row, quant_weights)
    raise ValueError(f"unsupported ggml type {ggml_type}")


def _quantize_rows(x: np.ndarray, ggml_type: GGMLType, n_per_row: int,
                   quant_weights) -> np.ndarray:
    """K-quant / IQ row API: (src, dst, nrow, n_per_row, qw-or-NULL)."""
    lib = _native_lib()
    if lib is None:
        raise RuntimeError(
            f"{ggml_type.name} requires the native quantizer "
            f"(csrc/libgguf_quant.so failed to build)")
    x = np.ascontiguousarray(x, dtype=np.float32)
    n = x.size
    if not n_per_row:
        n_per_row = x.shape[-1] if x.ndim > 1 else n
    bpb, epb = _TYPE_TRAITS[ggml_type]
    assert n_per_row % epb == 0, \
        f"{ggml_type.name} needs row size % {epb} == 0"
    nrow = n // n_per_row
    out = np.empty(n // epb * bpb, np.uint8)
    if quant_weights is not None:
        qw = np.ascontiguousarray(quant_weights, dtype=np.float32)
        assert qw.size == n_per_row, (qw.size, n_per_row)
        qw_ptr = qw.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    else:
        qw_ptr = None
    fn = getattr(lib, _NATIVE_ROWS[ggml_type][0])
    fn(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
       ctypes.c_int64(nrow), ctypes.c_int64(n_per_row), qw_ptr)
    return out


def dequantize_tensor(raw: np.ndarray, ggml_type: GGMLType, n: int
                      ) -> np.ndarray:
    if ggml_type == GGMLType.F32:
        return raw.view(np.float32)[:n].copy()
    if ggml_type == GGMLType.F16:
        return raw.view(np.float16)[:n].astype(np.float32)
    if ggml_type == GGMLType.BF16:
        u = raw.view(np.uint16)[:n].astype(np.uint32) << 16
        return u.view(np.float32).copy()
    lib = _native_lib()
    if ggml_type in _NATIVE_ROWS:
        if lib is None:
            raise RuntimeError(f"{ggml_type.name} needs the native lib")
        out = np.empty(n, np.float32)
        fn = getattr(lib, _NATIVE_ROWS[ggml_type][1])
        fn(np.ascontiguousarray(raw).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)),
           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
           ctypes.c_int64(n))
        return out
    if ggml_type in _NATIVE_SIMPLE:
        if lib is not None:
            out = np.empty(n, np.float32)
            fn = getattr(lib, _NATIVE_SIMPLE[ggml_type][1])
            fn(raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
               out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
               ctypes.c_int64(n))
            return out
        bpb, epb = _TYPE_TRAITS[ggml_type]
        blocks = raw.reshape(-1, bpb)
        d = blocks[:, 0:2].copy().view(np.float16).astype(np.float32)
        if ggml_type == GGMLType.Q8_0:
            q = blocks[:, 2:].view(np.int8).astype(np.float32)
            return (q * d).reshape(-1)[:n]
        if ggml_type == GGMLType.Q4_0:
            packed = blocks[:, 2:]
            lo = (packed & 0xF).astype(np.int32) - 8
            hi = (packed >> 4).astype(np.int32) - 8
            vals = np.concatenate([lo, hi], axis=1).astype(np.float32)
            return (vals * d).reshape(-1)[:n]
        raise RuntimeError(f"{ggml_type.name} needs the native lib")
    raise ValueError(f"unsupported ggml type {ggml_type}")


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

def _write_string(f: BinaryIO, s: str):
    b = s.encode("utf-8")
    f.write(struct.pack("<Q", len(b)))
    f.write(b)


def _write_value(f: BinaryIO, value: Any, vtype: GGUFValueType = None):
    if vtype is None:
        vtype = _infer_type(value)
    f.write(struct.pack("<I", int(vtype)))
    _write_value_data(f, value, vtype)


_SCALAR_FMT = {
    GGUFValueType.UINT8: "<B", GGUFValueType.INT8: "<b",
    GGUFValueType.UINT16: "<H", GGUFValueType.INT16: "<h",
    GGUFValueType.UINT32: "<I", GGUFValueType.INT32: "<i",
    GGUFValueType.FLOAT32: "<f", GGUFValueType.UINT64: "<Q",
    GGUFValueType.INT64: "<q", GGUFValueType.FLOAT64: "<d",
}


def _write_value_data(f: BinaryIO, value: Any, vtype: GGUFValueType):
    if vtype == GGUFValueType.STRING:
        _write_string(f, value)
    elif vtype == GGUFValueType.BOOL:
        f.write(struct.pack("<?", bool(value)))
    elif vtype == GGUFValueType.ARRAY:
        elem_type = _infer_type(value[0]) if value else GGUFValueType.INT32
        f.write(struct.pack("<I", int(elem_type)))
        f.write(struct.pack("<Q", len(value)))
        for v in value:
            _write_value_data(f, v, elem_type)
    else:
        f.write(struct.pack(_SCALAR_FMT[vtype], value))


def _infer_type(v: Any) -> GGUFValueType:
    if isinstance(v, bool):
        return GGUFValueType.BOOL
    if isinstance(v, str):
        return GGUFValueType.STRING
    if isinstance(v, float):
        return GGUFValueType.FLOAT32
    if isinstance(v, int):
        return GGUFValueType.INT64 if (v > 2**31 - 1 or v < -(2**31)) \
            else GGUFValueType.INT32
    if isinstance(v, (list, tuple)):
        return GGUFValueType.ARRAY
    if isinstance(v, np.floating):
        return GGUFValueType.FLOAT32
    if isinstance(v, np.integer):
        return GGUFValueType.INT32
    raise TypeError(f"cannot infer GGUF type for {type(v)}")


class GGUFWriter:
    """Streams a GGUF v3 file: metadata first, then aligned tensor data."""

    def __init__(self, path: str, alignment: int = DEFAULT_ALIGNMENT):
        self.path = path
        self.alignment = alignment
        self.metadata: List[Tuple[str, Any, Any]] = []
        self.tensors: List[Tuple[str, Tuple[int, ...], GGMLType,
                                 np.ndarray]] = []

    def add_metadata(self, key: str, value: Any, vtype=None):
        self.metadata.append((key, value, vtype))

    def add_tensor(self, name: str, array: np.ndarray,
                   ggml_type: GGMLType,
                   quant_weights: np.ndarray = None):
        """array: numpy fp32/any float, row-major [out..., in] — GGUF dims
        are written reversed (ne[0] = innermost). quant_weights: optional
        per-row imatrix importance weights (IQ4 search)."""
        array = np.asarray(array, dtype=np.float32)
        n_per_row = array.shape[-1] if array.ndim > 1 else array.size
        raw = quantize_tensor(array, ggml_type, n_per_row=n_per_row,
                              quant_weights=quant_weights)
        self.tensors.append((name, tuple(array.shape), ggml_type, raw))

    def write(self):
        self.add_metadata("general.alignment", self.alignment,
                          GGUFValueType.UINT32)
        with open(self.path, "wb") as f:
            f.write(struct.pack("<IIQQ", GGUF_MAGIC, GGUF_VERSION,
                                len(self.tensors), len(self.metadata)))
            for key, value, vtype in self.metadata:
                _write_string(f, key)
                _write_value(f, value, vtype)

            offset = 0
            offsets = []
            for name, shape, ggml_type, raw in self.tensors:
                offsets.append(offset)
                _write_string(f, name)
                dims = tuple(reversed(shape))
                f.write(struct.pack("<I", len(dims)))
                for d in dims:
                    f.write(struct.pack("<Q", d))
                f.write(struct.pack("<I", int(ggml_type)))
                f.write(struct.pack("<Q", offset))
                offset += _align(len(raw), self.alignment)

            pos = f.tell()
            f.write(b"\x00" * (_align(pos, self.alignment) - pos))
            for (name, shape, ggml_type, raw), off in zip(self.tensors,
                                                          offsets):
                f.write(raw.tobytes())
                pad = _align(len(raw), self.alignment) - len(raw)
                if pad:
                    f.write(b"\x00" * pad)
        return self.path


def _align(n: int, a: int) -> int:
    return -(-n // a) * a


# ---------------------------------------------------------------------------
# Minimal reader (for tests / round-trip validation)
# ---------------------------------------------------------------------------

def read_gguf(path: str, load_tensors: bool = False,
              return_raw: bool = False):
    """Parse header/metadata/tensor table; optionally tensor data.

    return_raw=True: returns (metadata, {name: decoded fp32 array},
    {name: (raw bytes, ggml type)}) — the raw view lets independent
    decoders (export/gguf_dequant_ref.py) cross-check the file."""
    with open(path, "rb") as f:
        magic, version, n_tensors, n_kv = struct.unpack(
            "<IIQQ", f.read(24))
        assert magic == GGUF_MAGIC, "not a GGUF file"
        assert version == GGUF_VERSION

        def read_string():
            (ln,) = struct.unpack("<Q", f.read(8))
            return f.read(ln).decode("utf-8")

        def read_value(vtype):
            vt = GGUFValueType(vtype)
            if vt == GGUFValueType.STRING:
                return read_string()
            if vt == GGUFValueType.BOOL:
                return struct.unpack("<?", f.read(1))[0]
            if vt == GGUFValueType.ARRAY:
                (et,) = struct.unpack("<I", f.read(4))
                (cnt,) = struct.unpack("<Q", f.read(8))
                return [read_value(et) for _ in range(cnt)]
            fmt = _SCALAR_FMT[vt]
            return struct.unpack(fmt, f.read(struct.calcsize(fmt)))[0]

        metadata = {}
        for _ in range(n_kv):
            key = read_string()
            (vtype,) = struct.unpack("<I", f.read(4))
            metadata[key] = read_value(vtype)

        tensors = []
        for _ in range(n_tensors):
            name = read_string()
            (n_dims,) = struct.unpack("<I", f.read(4))
            dims = struct.unpack(f"<{n_dims}Q", f.read(8 * n_dims))
            ttype, offset = struct.unpack("<IQ", f.read(12))
            tensors.append({"name": name,
                            "shape": tuple(reversed(dims)),
                            "type": GGMLType(ttype),
                            "offset": offset})

        data = {}
        raws = {}
        if load_tensors or return_raw:
            align = metadata.get("general.alignment", DEFAULT_ALIGNMENT)
            base = _align(f.tell(), align)
            for t in tensors:
                n = int(np.prod(t["shape"]))
                bpb, epb = _TYPE_TRAITS[t["type"]]
                nbytes = n // epb * bpb
                f.seek(base + t["offset"])
                raw = np.frombuffer(f.read(nbytes), np.uint8)
                if return_raw:
                    raws[t["name"]] = (raw, t["type"])
                data[t["name"]] = dequantize_tensor(
                    raw, t["type"], n).reshape(t["shape"])
    if return_raw:
        return metadata, data, raws
    return metadata, tensors, data
