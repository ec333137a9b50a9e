"""Training-state checkpoint/resume via Orbax.

Parity target: the reference delegates resume to HF Trainer's
``resume_from_checkpoint`` with safety validation of checkpoint dirs
(reference: studio core/training/resume.py:32-62 scans checkpoint-* dirs;
rl.py:127-148 adds a memory guard). TPU-native: Orbax handles sharded
arrays natively, so multi-chip resume needs no gather.

Layout per checkpoint: ``{output_dir}/checkpoint-{step}/state/`` (orbax
tree: trainables + opt_state + step) alongside the peft-format adapter
written by the trainer for portability.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_train_state(ckpt_dir: str, step: int, trainables, opt_state):
    """Write orbax state under ckpt_dir/state."""
    path = os.path.abspath(os.path.join(ckpt_dir, "state"))
    ckptr = _checkpointer()
    state = {"step": step, "trainables": trainables, "opt_state": opt_state}
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def restore_train_state(ckpt_dir: str, trainables_like, opt_state_like,
                        retries: int = 1) -> Tuple[int, Any, Any]:
    """Restore (step, trainables, opt_state) using templates for structure.

    Transient I/O failures (NFS hiccup, fd exhaustion, a reader racing the
    writer) are retried once after freeing the failed attempt's partial
    state — the TPU-native analog of the reference's retry-once load guard
    (reference: models/loader_utils.py:1183 _offline_aware_load, which
    frees partial models between attempts for the same reason)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, "state"))
    template = {
        "step": 0,
        "trainables": jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, trainables_like),
        "opt_state": jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, opt_state_like),
    }
    last_err = None
    for attempt in range(retries + 1):
        ckptr = _checkpointer()
        try:
            state = ckptr.restore(path, template)
            ckptr.close()
            return (int(state["step"]), state["trainables"],
                    state["opt_state"])
        except OSError as e:  # transient I/O only; structure errors raise
            last_err = e
            try:
                ckptr.close()
            except Exception:
                pass
            import gc

            gc.collect()  # free the partial restore before reallocating
    raise last_err


def restore_latest(output_dir: str, trainables_like, opt_state_like
                   ) -> Optional[Tuple[str, int, Any, Any]]:
    """Restore from the newest checkpoint that actually loads, walking
    newest -> oldest past corrupt/truncated ones (reference:
    studio core/training/resume.py:32-62 validates before resuming; here
    the restore itself is the validation). Returns
    (ckpt_dir, step, trainables, opt_state) or None."""
    if not os.path.isdir(output_dir):
        return None
    steps = []
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if m and os.path.isdir(os.path.join(output_dir, name, "state")):
            steps.append((int(m.group(1)), os.path.join(output_dir, name)))
    for step, path in sorted(steps, reverse=True):
        try:
            s, t, o = restore_train_state(path, trainables_like,
                                          opt_state_like)
            return path, s, t, o
        except Exception:
            continue  # corrupt checkpoint: fall back to the previous one
    return None


_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Find the newest valid checkpoint dir (reference: resume.py:32
    scans checkpoint-* and validates before resuming)."""
    if not os.path.isdir(output_dir):
        return None
    best = None
    best_step = -1
    for name in os.listdir(output_dir):
        m = _CKPT_RE.match(name)
        if not m:
            continue
        step = int(m.group(1))
        path = os.path.join(output_dir, name)
        if not os.path.isdir(os.path.join(path, "state")):
            continue  # incomplete checkpoint: skip (validation)
        if step > best_step:
            best, best_step = path, step
    return best
