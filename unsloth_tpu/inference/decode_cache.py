"""Decode-time dequant cache: trade spare HBM for decode speed.

Reference analog: the dedicated 4-bit gemv the reference uses for
seq_len==1 inference (reference: unsloth/kernels/utils.py:765-982
``fast_gemv`` — its answer to "NF4 decode is slower than dense").

TPU-native form: on a v5e the answer is a MEMORY POLICY, not a kernel.
The VPU select-tree decode of NF4 nibbles costs ~24 vector ops per weight
element; at decode (m<=8 rows) that VPU time exceeds the HBM bytes NF4
saves by ~3-4x, so *no* exact in-kernel decode can reach dense speed
(measured roofline: bench_artifacts/r5/decode_roofline.jsonl,
BASELINE_notes.md). What the chip does have is HBM headroom whenever the
model is NF4-stored: an 8B model holds ~4.4 GB of NF4 weights in a 16 GB
chip. This module dequantizes as many NF4 weights as a budget allows into
persistent dense bf16 copies ONCE, so the decode loop streams dense
weights (no per-step VPU decode) for the cached layers and falls back to
NF4 for the rest. Training keeps the fused-NF4 path untouched (the cache
is a new params tree, not a mutation).

Granularity is one weight leaf; layers are converted in ascending order
(uniform benefit per byte: decode cost per element is constant, extra HBM
per element is constant). The returned tree is a drop-in for
``model.params`` — dense leaves dispatch to plain matmuls everywhere.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax

from ..ops.nf4 import (NF4Stacked, NF4Tensor, dequantize_nf4,
                       dequantize_nf4_stacked)

#: conservative usable-HBM default for one v5e chip (16 GB physical;
#: XLA reserves some, and serving needs KV-cache + activation room).
DEFAULT_USABLE_GB = 15.0
#: reserve for KV cache + decode activations when budget="auto".
DEFAULT_RESERVE_GB = 2.5


def _leaf_bytes(leaf) -> int:
    if isinstance(leaf, (NF4Tensor, NF4Stacked)):
        if isinstance(leaf, NF4Tensor):
            return leaf.nbytes
        return leaf.packed.size + leaf.absmax.size * 4
    if hasattr(leaf, "nbytes"):
        return int(leaf.nbytes)
    return 0


def params_bytes(params) -> int:
    """Total HBM bytes of a params tree (NF4 leaves at packed size)."""
    leaves = jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, (NF4Tensor, NF4Stacked)))
    return sum(_leaf_bytes(leaf) for leaf in leaves)


def _dense_extra_bytes(leaf) -> int:
    """Extra HBM a dense bf16 copy costs over the packed leaf."""
    import numpy as np

    n = int(np.prod(leaf.shape))
    return 2 * n - _leaf_bytes(leaf)


def apply_decode_cache(
    params: Dict[str, Any],
    *,
    hbm_budget_gb: Any = "auto",
    reserve_gb: float = DEFAULT_RESERVE_GB,
    usable_gb: float = DEFAULT_USABLE_GB,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Return (new_params, stats) with NF4 leaves dequantized to dense
    bf16 while the budget lasts.

    hbm_budget_gb: "auto" = usable_gb - current params bytes - reserve_gb
    (how much spare HBM dense copies may consume); a number = that many
    GB of EXTRA HBM; 0/negative = no-op. Leaves are converted whole, in
    tree order (layers ascending). Dequantization runs on device, one
    jitted program per unique (shape, block) — a few seconds one-time.
    """
    current = params_bytes(params)
    if hbm_budget_gb == "auto":
        budget = usable_gb * 1e9 - current - reserve_gb * 1e9
    else:
        budget = float(hbm_budget_gb) * 1e9
    stats = {
        "params_bytes_before": current,
        "budget_bytes": int(max(0, budget)),
        "converted": 0,
        "skipped": 0,
        "extra_bytes": 0,
    }
    if budget <= 0:
        return params, stats

    # jit per unique signature so repeated layer shapes reuse the program
    deq2 = jax.jit(dequantize_nf4, static_argnames=("dtype",))
    deq3 = jax.jit(dequantize_nf4_stacked, static_argnames=("dtype",))
    remaining = budget

    def convert(leaf):
        nonlocal remaining
        if not isinstance(leaf, (NF4Tensor, NF4Stacked)):
            return leaf
        extra = _dense_extra_bytes(leaf)
        if extra > remaining:
            stats["skipped"] += 1
            return leaf
        remaining -= extra
        stats["converted"] += 1
        stats["extra_bytes"] += extra
        if isinstance(leaf, NF4Tensor):
            return deq2(leaf, dtype=leaf.dtype)
        return deq3(leaf, dtype=leaf.dtype)

    new_params = jax.tree_util.tree_map(
        convert, params,
        is_leaf=lambda x: isinstance(x, (NF4Tensor, NF4Stacked)))
    stats["params_bytes_after"] = stats["params_bytes_before"] \
        + stats["extra_bytes"]
    return new_params, stats


def decode_cache_summary(stats: Dict[str, Any]) -> str:
    return (f"decode cache: {stats['converted']} weights dequantized "
            f"(+{stats['extra_bytes'] / 1e9:.2f} GB), "
            f"{stats['skipped']} kept NF4; params "
            f"{stats['params_bytes_before'] / 1e9:.2f} -> "
            f"{stats.get('params_bytes_after', 0) / 1e9:.2f} GB")
