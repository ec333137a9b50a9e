"""NF4 (NormalFloat-4) blockwise quantization.

Parity target: bitsandbytes NF4 double-dequant reached by the reference via
ctypes (reference: unsloth/kernels/utils.py:260-284 binds
``cdequantize_blockwise_{fp32,fp16,bf16}_nf4``; double-dequant math —
absmax itself 8-bit-quantized with a global offset — at :567-679).

TPU-native storage layout (a pytree, shardable like any other param):
  * ``packed``  uint8 [out, in/2] — two 4-bit codebook indices per byte in
    **split-half order**: the high nibble of byte [o, j] is element
    [o, j], the low nibble is element [o, j + in/2]. This differs from
    bitsandbytes' element-interleaved nibble order on purpose: unpacking
    split-half is two [out, in/2] planes + one concat — every
    intermediate is 2-D and lane-aligned — whereas interleaving creates a
    [N, 2] intermediate that TPU tiling pads 64x (observed 14GB HBM for
    one 8B-layer weight). bnb-ordered checkpoints are repacked once at
    load time on the host (models/bnb.py:repack_interleaved_to_split_half,
    wired into hf_loader.load_params).
  * ``absmax``  per-block scales for blocks of ``block_size`` elements along
    the flattened (row-major) weight. Either fp32 (plain) or, with double
    quantization: uint8 codes + fp32 per-group scale + global fp32 offset
    (groups of ``double_block_size`` absmax entries).

Dequantization is expressed as jnp gather + multiply so XLA can fuse it into
the consuming matmul; a dedicated Pallas dequant-inside-matmul kernel for the
training hot path lives in `qlora_matmul.py`.

The NF4 codebook constants are the 16 NormalFloat quantiles from the QLoRA
paper (public constants, identical across implementations).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NF4_CODE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], dtype=np.float32)

# Decision boundaries (midpoints) for nearest-value quantization.
_NF4_BOUNDARIES = (NF4_CODE[1:] + NF4_CODE[:-1]) / 2.0

DEFAULT_BLOCK = 64
DEFAULT_DOUBLE_BLOCK = 256


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class NF4Tensor:
    """Quantized 2-D weight [out_features, in_features]."""

    packed: jnp.ndarray            # uint8 [out, in//2]
    absmax: jnp.ndarray            # fp32 [n_blocks] or uint8 codes
    absmax_scale: Optional[jnp.ndarray]   # fp32 [n_groups] if double-quant
    absmax_offset: Optional[jnp.ndarray]  # fp32 scalar if double-quant
    shape: Tuple[int, int]
    block_size: int = DEFAULT_BLOCK
    dtype: jnp.dtype = jnp.bfloat16  # dequant target dtype
    double_block_size: int = DEFAULT_DOUBLE_BLOCK

    def tree_flatten(self):
        children = (self.packed, self.absmax, self.absmax_scale,
                    self.absmax_offset)
        aux = (self.shape, self.block_size, self.dtype,
               self.double_block_size)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        packed, absmax, absmax_scale, absmax_offset = children
        shape, block_size, dtype, double_block_size = aux
        return cls(packed, absmax, absmax_scale, absmax_offset, shape,
                   block_size, dtype, double_block_size)

    @property
    def is_double_quant(self) -> bool:
        return self.absmax_scale is not None

    @property
    def nbytes(self) -> int:
        n = self.packed.size + self.absmax.size * self.absmax.dtype.itemsize
        if self.absmax_scale is not None:
            n += self.absmax_scale.size * 4 + 4
        return n


def _nearest_code(x_norm):
    """Map normalized values [-1, 1] to codebook indices.

    Unrolled comparison sum instead of searchsorted: 15 VPU compares+adds,
    which XLA compiles in seconds (searchsorted's general lowering took
    >60 s to compile for ~60M-element weights on TPU)."""
    idx = jnp.zeros(x_norm.shape, jnp.int32)
    for b in _NF4_BOUNDARIES:
        idx = idx + (x_norm >= b).astype(jnp.int32)
    return idx.astype(jnp.uint8)


def quantize_nf4(
    w: jnp.ndarray,
    block_size: int = DEFAULT_BLOCK,
    double_quant: bool = True,
    double_block_size: int = DEFAULT_DOUBLE_BLOCK,
    dtype=jnp.bfloat16,
) -> NF4Tensor:
    """Quantize a 2-D weight to NF4. Row-major flattening; blocks never span
    a pad boundary because in-features of supported models are multiples of
    the block size."""
    out_f, in_f = w.shape
    n = out_f * in_f
    assert n % block_size == 0, "weight size must be divisible by block_size"
    assert in_f % block_size == 0, \
        "in_features must be divisible by block_size (blocks must not span rows)"
    assert in_f % 2 == 0

    flat = w.reshape(-1).astype(jnp.float32)
    blocks = flat.reshape(-1, block_size)
    absmax = jnp.max(jnp.abs(blocks), axis=-1)
    safe = jnp.where(absmax == 0, 1.0, absmax)
    norm = blocks / safe[:, None]
    idx = _nearest_code(norm).reshape(out_f, in_f)

    half = in_f // 2
    hi = idx[:, :half]
    lo = idx[:, half:]
    packed = (hi << 4) | lo

    if not double_quant:
        return NF4Tensor(packed, absmax, None, None, (out_f, in_f),
                         block_size, dtype)

    # Double quantization of absmax: subtract global mean, per-group int8
    # affine (bnb semantics: offset + dynamic 8-bit; we use symmetric int8
    # around the offset which dequantizes with the same formula shape).
    n_blocks = absmax.shape[0]
    pad = (-n_blocks) % double_block_size
    offset = jnp.mean(absmax)
    centered = absmax - offset
    cpad = jnp.pad(centered, (0, pad))
    groups = cpad.reshape(-1, double_block_size)
    gmax = jnp.max(jnp.abs(groups), axis=-1)
    gsafe = jnp.where(gmax == 0, 1.0, gmax)
    codes = jnp.round(groups / gsafe[:, None] * 127.0).astype(jnp.int8)
    return NF4Tensor(
        packed=packed,
        absmax=codes.reshape(-1)[:n_blocks],
        absmax_scale=(gsafe / 127.0).astype(jnp.float32),
        absmax_offset=offset.astype(jnp.float32),
        shape=(out_f, in_f),
        block_size=block_size,
        dtype=dtype,
        double_block_size=double_block_size,
    )


def _decode_absmax(q: NF4Tensor) -> jnp.ndarray:
    if not q.is_double_quant:
        return q.absmax.astype(jnp.float32)
    n_blocks = q.absmax.shape[0]
    codes = q.absmax.astype(jnp.float32)
    scale = jnp.repeat(q.absmax_scale, q.double_block_size)[:n_blocks]
    return codes * scale + q.absmax_offset


def dequantize_nf4(q: NF4Tensor, dtype=None) -> jnp.ndarray:
    """Full dequantization [out, in].

    All intermediates are 2-D with large lane-aligned trailing dims (see
    layout note in the module docstring)."""
    dtype = dtype or q.dtype
    out_f, in_f = q.shape
    packed = q.packed
    hi = (packed >> 4).astype(jnp.int32)        # [out, in/2]
    lo = (packed & 0xF).astype(jnp.int32)
    code = jnp.asarray(NF4_CODE)
    vals = jnp.concatenate([code[hi], code[lo]], axis=-1)  # [out, in]
    absmax = _decode_absmax(q).reshape(out_f, in_f // q.block_size)
    absmax_up = jnp.repeat(absmax, q.block_size, axis=-1)  # [out, in]
    return (vals * absmax_up).astype(dtype)


def nf4_matmul_ref(x: jnp.ndarray, q: NF4Tensor,
                   preferred_element_type=jnp.float32) -> jnp.ndarray:
    """x @ W^T with W stored NF4, W: [out, in], x: [..., in].

    Reference path: dequantize then matmul (XLA fuses the dequant into the
    HBM->VMEM pipeline reasonably well; the Pallas fused kernel replaces
    this on the hot path)."""
    w = dequantize_nf4(q, dtype=x.dtype)
    return jnp.dot(x, w.T, preferred_element_type=preferred_element_type)


def quantization_error(w: jnp.ndarray, q: NF4Tensor) -> float:
    wd = dequantize_nf4(q, dtype=jnp.float32)
    return float(jnp.sqrt(jnp.mean((w.astype(jnp.float32) - wd) ** 2)))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class NF4Stacked:
    """Stacked per-expert NF4 weights [E, out, in] (MoE QLoRA base).

    Same split-half packing as NF4Tensor, one leading expert axis; the
    reference reaches MoE QLoRA through bnb quantizing each expert Linear
    (gpt-oss enable: models/loader.py:1087-1094). Dequantization
    materializes ONE LAYER's experts transiently (recomputed under remat),
    which is what lets a 20B-class MoE fit a 16 GB chip: storage stays
    ~0.55 B/param."""

    packed: jnp.ndarray            # uint8 [E, out, in//2]
    absmax: jnp.ndarray            # fp32 [E, n_blocks]
    shape: Tuple[int, int, int]
    block_size: int = DEFAULT_BLOCK
    dtype: jnp.dtype = jnp.bfloat16

    def tree_flatten(self):
        return (self.packed, self.absmax), (self.shape, self.block_size,
                                            self.dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        packed, absmax = children
        shape, block_size, dtype = aux
        return cls(packed, absmax, shape, block_size, dtype)

    @property
    def ndim(self) -> int:
        return 3


def quantize_nf4_stacked(w: jnp.ndarray, block_size: int = DEFAULT_BLOCK,
                         dtype=jnp.bfloat16) -> NF4Stacked:
    """[E, out, in] -> stacked NF4 (plain fp32 absmax per expert).

    Implemented by flattening the expert axis into rows and reusing the
    2-D path (row-major blocks make the layouts identical); the vmap
    formulation lowered ~40x slower on TPU."""
    e, out_f, in_f = w.shape
    q = quantize_nf4(w.reshape(e * out_f, in_f), block_size=block_size,
                     double_quant=False, dtype=dtype)
    return NF4Stacked(q.packed.reshape(e, out_f, in_f // 2),
                      q.absmax, (e, out_f, in_f), block_size, dtype)


def dequantize_nf4_stacked(q: NF4Stacked, dtype=None) -> jnp.ndarray:
    dtype = dtype or q.dtype
    e, out_f, in_f = q.shape
    flat = NF4Tensor(q.packed.reshape(e * out_f, in_f // 2),
                     q.absmax.reshape(-1), None, None,
                     (e * out_f, in_f), q.block_size, dtype)
    return dequantize_nf4(flat, dtype).reshape(e, out_f, in_f)
