"""Importance matrix (imatrix) collection + imatrix-weighted quantization.

Parity target: the reference shells out to llama.cpp's `llama-imatrix`
binary and passes the result to `llama-quantize` for the IQ/imatrix quant
types (reference: save.py:3806). Here both halves are native:

  * `collect_imatrix` runs calibration text through the model EAGERLY and
    accumulates, for every linear, the mean square of each input channel
    (exactly what llama.cpp's imatrix tool measures — the diagonal of
    E[x x^T]).
  * `save_imatrix` writes llama.cpp's imatrix .dat container so the file
    can also feed an external `llama-quantize`.
  * `quantize_q4k_weighted` uses the importance weights in the per-block
    (scale, min) search — weighted least squares instead of unweighted —
    which lowers IMPORTANCE-WEIGHTED error vs the plain search (this is
    the point of imatrix quantization; we do not claim bit-parity with
    llama.cpp's make_qkx3 search).
"""

from __future__ import annotations

import struct
from typing import Any, Dict, Iterable, List, Optional

import numpy as np

# our layer-local names -> llama.cpp imatrix tensor names
_IMATRIX_NAMES = {
    "q": "attn_q", "k": "attn_k", "v": "attn_v", "o": "attn_output",
    "gate": "ffn_gate", "up": "ffn_up", "down": "ffn_down",
}


class ImatrixCollector:
    """Accumulates sum(x^2) per input channel for every linear."""

    def __init__(self):
        self.layer = 0
        self.sums: Dict[str, np.ndarray] = {}
        self.counts: Dict[str, int] = {}

    def record(self, name: str, x) -> None:
        gguf = _IMATRIX_NAMES.get(name)
        if gguf is None:
            return
        key = f"blk.{self.layer}.{gguf}.weight"
        arr = np.asarray(x, dtype=np.float32).reshape(-1, x.shape[-1])
        sq = (arr * arr).sum(axis=0)
        if key in self.sums:
            self.sums[key] += sq
            self.counts[key] += arr.shape[0]
        else:
            self.sums[key] = sq
            self.counts[key] = arr.shape[0]

    def result(self) -> Dict[str, np.ndarray]:
        """Mean squared activation per channel (llama.cpp semantics)."""
        return {k: v / max(self.counts[k], 1)
                for k, v in self.sums.items()}


def collect_imatrix(model, token_batches: Iterable) -> Dict[str, np.ndarray]:
    """Run calibration batches ([B, T] int arrays / lists) through the
    model eagerly with the decoder tap active."""
    import jax.numpy as jnp

    from ..models import decoder

    tap = ImatrixCollector()
    prev = decoder._IMATRIX_TAP
    decoder._IMATRIX_TAP = tap
    try:
        for ids in token_batches:
            ids = jnp.asarray(np.atleast_2d(np.asarray(ids, np.int32)))
            model.forward(ids, remat=False)
    finally:
        decoder._IMATRIX_TAP = prev
    return tap.result()


def save_imatrix(path: str, imatrix: Dict[str, np.ndarray],
                 n_calls: int = 1, dataset: str = "unsloth_tpu") -> str:
    """Write llama.cpp's imatrix .dat container (legacy format:
    n_entries, then per entry name/ncall/nval/values, then last_call and
    the dataset string)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<i", len(imatrix)))
        for name, vals in imatrix.items():
            nb = name.encode()
            f.write(struct.pack("<i", len(nb)))
            f.write(nb)
            f.write(struct.pack("<i", n_calls))
            v = np.asarray(vals, np.float32) * n_calls  # stored as sums
            f.write(struct.pack("<i", v.size))
            f.write(v.tobytes())
        f.write(struct.pack("<i", n_calls))
        db = dataset.encode()
        f.write(struct.pack("<i", len(db)))
        f.write(db)
    return path


def load_imatrix(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        def i32():
            return struct.unpack("<i", f.read(4))[0]

        out = {}
        for _ in range(i32()):
            name = f.read(i32()).decode()
            ncall = i32()
            nval = i32()
            vals = np.frombuffer(f.read(4 * nval), np.float32).copy()
            out[name] = vals / max(ncall, 1)
        return out


# ---------------------------------------------------------------------------
# Weighted 4-bit (scale+min) quantization
# ---------------------------------------------------------------------------

def _weighted_scale_min(x, w, nmax: int, iters: int = 8):
    """Per-row weighted (d, m) for q = clip(round((x + m)/d), 0, nmax):
    minimizes sum w * (d*q - m' ...)^2 by alternating assignment and a
    weighted least-squares refit. x, w: [rows, block]."""
    wmin = -np.minimum(x.min(axis=-1), 0.0)
    d = (x.max(axis=-1) + wmin) / nmax
    d = np.where(d == 0, 1.0, d)
    m = wmin
    for _ in range(iters):
        q = np.clip(np.round((x + m[:, None]) / d[:, None]), 0,
                    nmax)
        # refit (d, m): x ~= d*q - m, weighted LS over each row
        sw = w.sum(-1)
        swq = (w * q).sum(-1)
        swq2 = (w * q * q).sum(-1)
        swx = (w * x).sum(-1)
        swxq = (w * x * q).sum(-1)
        det = sw * swq2 - swq * swq
        ok = det > 1e-12
        d_new = np.where(ok, (sw * swxq - swq * swx) / np.where(ok, det, 1),
                         d)
        m_new = np.where(ok, (d_new * swq - swx) / np.where(sw > 0, sw, 1),
                         m)
        d = np.where(d_new > 1e-12, d_new, d)
        m = m_new
    q = np.clip(np.round((x + m[:, None]) / d[:, None]), 0, nmax)
    return d, m, q


def quantize_q4k_weighted(x: np.ndarray,
                          weights: Optional[np.ndarray] = None,
                          block: int = 32):
    """4-bit scale+min quantization of a [rows, in] weight with optional
    per-input-channel importance. Returns (dequantized, weighted_mse).
    Used by the GGUF export when an imatrix is supplied; unweighted it
    degenerates to the plain least-squares search."""
    rows, nin = x.shape
    assert nin % block == 0
    xb = x.reshape(-1, block).astype(np.float64)
    if weights is None:
        wb = np.ones_like(xb)
    else:
        w = np.broadcast_to(np.asarray(weights, np.float64)[None, :],
                            x.shape)
        wb = w.reshape(-1, block)
        wb = wb + 1e-9
    d, m, q = _weighted_scale_min(xb, wb, nmax=15)
    deq = (d[:, None] * q - m[:, None]).reshape(rows, nin)
    wmse = float((wb * (xb - (d[:, None] * q - m[:, None])) ** 2).sum()
                 / wb.sum())
    return deq.astype(np.float32), wmse
