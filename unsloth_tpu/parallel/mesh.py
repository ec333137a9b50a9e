"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's distributed story (SURVEY §2j):
the reference reaches multi-GPU only via torchrun/accelerate DDP with
per-rank ``device_map`` (reference: models/loader_utils.py:73-106). Here we
own the mesh: a single `jax.sharding.Mesh` with named axes

    ("dp", "fsdp", "tp")

  * dp    — pure data parallel (gradient all-reduce over ICI/DCN)
  * fsdp  — parameter/optimizer sharding (ZeRO-3 style; XLA inserts
            all-gathers on use and reduce-scatters on grads)
  * sp    — context/sequence sharding axis (reserved; collapsed into fsdp
            for now)
  * tp    — tensor parallel (attention heads / MLP hidden sharded)

Logical axis names used in parameter PartitionSpecs:

    "embed"   — model dim D
    "vocab"   — vocabulary dim V
    "heads"   — attention head dim (num_heads)
    "kv_heads"— kv head dim
    "mlp"     — MLP hidden dim F
    "layers"  — stacked-layer leading axis (scan over layers)
    "batch"   — batch dim of activations
    "seq"     — sequence dim

The default rules shard vocab/mlp/heads over "tp" and everything big over
"fsdp", which is the standard TPU recipe (mesh-and-annotate, let GSPMD insert
collectives).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


MESH_AXES = ("dp", "fsdp", "sp", "tp")


def create_mesh(
    dp: int = 1,
    fsdp: int = -1,
    tp: int = 1,
    sp: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ("dp", "fsdp", "sp", "tp") mesh.

    One axis may be -1 (inferred from device count). Defaults put all devices
    on the fsdp axis — the right default for LoRA/QLoRA fine-tuning where
    params dominate HBM and activations are modest. sp is the
    sequence/context-parallel axis (ring attention rotates KV around it).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    sizes = [dp, fsdp, sp, tp]
    n_infer = sum(1 for s in sizes if s == -1)
    if n_infer > 1:
        raise ValueError("At most one mesh axis may be -1")
    if n_infer == 1:
        known = int(np.prod([s for s in sizes if s != -1]))
        if n % known != 0:
            raise ValueError(f"{n} devices not divisible by {known}")
        sizes = [n // known if s == -1 else s for s in sizes]
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {sizes} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, MESH_AXES)


def single_device_mesh() -> Mesh:
    return create_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host initialization (SURVEY §2j: `jax.distributed` + one
    mesh over ICI/DCN replaces the reference's per-rank torchrun
    device_map, loader_utils.py:73-106).

    On TPU pods `jax.distributed.initialize()` auto-detects everything;
    explicit args (or JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env) override for CPU/GPU clusters. Idempotent; a
    single-process run is a no-op. Returns this host's process index.
    """
    import os

    if jax.process_count() > 1 or getattr(
            jax.distributed, "is_initialized", lambda: False)():
        return jax.process_index()
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if coordinator_address is None and env_np is None:
        # single host (or a TPU pod where initialize() self-detects);
        # only auto-call on real TPU pods to keep CPU tests cheap
        return jax.process_index()
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=(num_processes if num_processes is not None
                           else int(env_np) if env_np else None),
            process_id=(process_id if process_id is not None
                        else int(env_pid) if env_pid else None))
    except RuntimeError:
        pass  # already initialized
    return jax.process_index()


def host_local_batch(mesh: Mesh, batch: Dict[str, "np.ndarray"],
                     rules: Optional[ShardingRules] = None):
    """Turn per-HOST numpy batch shards into global sharded arrays
    (multi-host data loading: every host tokenizes its own slice of the
    dataset; `jax.make_array_from_process_local_data` assembles the
    global batch over the ("dp","fsdp") axes without gathering to one
    host). Works unchanged single-process."""
    sharding = batch_sharding(mesh, rules)
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }


# ---------------------------------------------------------------------------
# Logical-axis rules
# ---------------------------------------------------------------------------

# logical axis -> mesh axis (or None = replicated)
DEFAULT_RULES: Dict[str, Optional[Tuple[str, ...]]] = {
    "embed": None,               # model dim replicated (activations flow here)
    "vocab": ("tp",),
    "heads": ("tp",),
    "kv_heads": ("tp",),
    "mlp": ("tp",),
    "layers": None,
    "experts": ("tp",),          # expert-parallel rides the tp axis for now
    "batch": ("dp", "fsdp"),     # data sharded over dp×fsdp
    "seq": None,
    # fsdp parameter sharding: applied to the *largest* dim of each param
    # via the "fsdp_shard" marker below.
    "fsdp_shard": ("fsdp",),
}


@dataclasses.dataclass(frozen=True)
class ShardingRules:
    rules: Dict[str, Optional[Tuple[str, ...]]] = dataclasses.field(
        default_factory=lambda: dict(DEFAULT_RULES)
    )

    def spec(self, *logical_axes: Optional[str]) -> P:
        """Translate logical axis names into a PartitionSpec."""
        parts = []
        for ax in logical_axes:
            if ax is None:
                parts.append(None)
            else:
                mesh_axes = self.rules.get(ax)
                if mesh_axes is None:
                    parts.append(None)
                elif len(mesh_axes) == 1:
                    parts.append(mesh_axes[0])
                else:
                    parts.append(tuple(mesh_axes))
        return P(*parts)

    def sharding(self, mesh: Mesh, *logical_axes: Optional[str]) -> NamedSharding:
        return NamedSharding(mesh, self.spec(*logical_axes))


def batch_sharding(mesh: Mesh, rules: Optional[ShardingRules] = None) -> NamedSharding:
    rules = rules or ShardingRules()
    return rules.sharding(mesh, "batch", "seq")
