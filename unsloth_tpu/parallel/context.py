"""Context-parallel (sequence-sharded) activation plumbing.

A trainer (or user code) that wants long-context training sharded over the
mesh's "sp" axis wraps its jitted step in `context_parallel(mesh)`; the
attention dispatch (ops/attention.py) reads the active setting at trace
time and routes self-attention through ring attention
(parallel/ring_attention.py) instead of a single-device kernel. Everything
else in the decoder is token-parallel, so GSPMD handles the sequence
sharding transparently; attention is the only op that needs the explicit
ring.

The reference has no analog (it has no context parallelism at all,
SURVEY §2j); this is the beyond-parity long-context lever.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

_STACK = []


@contextlib.contextmanager
def context_parallel(mesh, axis_name: str = "sp"):
    """Activate ring attention over `mesh`'s `axis_name` for any attention
    traced inside this context. No-op if the axis has size 1."""
    _STACK.append((mesh, axis_name))
    try:
        yield
    finally:
        _STACK.pop()


def current_context_parallel() -> Optional[Tuple[object, str]]:
    """(mesh, axis_name) when an sp axis of size > 1 is active, else None."""
    if not _STACK:
        return None
    mesh, axis_name = _STACK[-1]
    if axis_name not in mesh.shape or mesh.shape[axis_name] <= 1:
        return None
    return mesh, axis_name
