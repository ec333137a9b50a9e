"""Pipeline parallelism: GPipe-style microbatch pipelining over a "pp" mesh axis.

The reference has NO pipeline parallelism (its multi-GPU story is
torchrun/accelerate DDP, reference models/loader_utils.py:73-106); this
exceeds it. TPU-native design:

  * The decoder's stacked-layer layout ([L, ...] leaves, `stack_params`)
    is sharded over the "pp" mesh axis on the leading (layer) axis, so
    each device holds a contiguous stage of L/S layers and the weights
    never move.
  * Activations flow stage-to-stage with `jax.lax.ppermute` (XLA lowers
    it to ICI RDMA on TPU). The schedule is the classic GPipe rotation:
    M microbatches over S stages in M+S-1 steps (bubble fraction
    (S-1)/(M+S-1)); the whole schedule is ONE `lax.scan`, so the program
    is a single compiled loop, not an unrolled graph.
  * Backward is free: ppermute/scan/where are all differentiable, so
    `jax.grad` through the shard_map yields the reverse pipeline
    (gradients ppermute backwards) automatically — no hand-written
    send/recv schedule as in GPU frameworks. Each stage rematerializes
    per layer (`jax.checkpoint`) so the reverse schedule holds one
    microbatch's boundary activations, not every layer's.
  * Composes with data parallelism: the mesh is ("dp", "pp"); microbatch
    rows are sharded over dp, layers over pp.

Microbatching splits the BATCH dim (rows), which keeps causal attention
exact. A batch of B rows runs as M microbatches of B/M rows; B must be
divisible by M*dp. (Sequence-axis scale-out is the sp axis / ring
attention, `parallel/ring_attention.py` — the two compose at the mesh
level, not inside this schedule.)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def create_pp_mesh(pp: int, dp: int = 1, *,
                   devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A ("dp", "pp") mesh. pp should map to an ICI-adjacent device line
    so stage handoffs ride ICI (on a physical torus, keep pp innermost)."""
    if devices is None:
        devices = jax.devices()
    devices = list(devices)[: dp * pp]
    if len(devices) != dp * pp:
        raise ValueError(f"need {dp * pp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices).reshape(dp, pp), ("dp", "pp"))


def _shard_map(body, mesh, in_specs, out_specs):
    try:
        return shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax spells it check_rep
        return shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def pipeline_layers(mesh: Mesh, layer_apply, num_layers: int,
                    num_microbatches: int, *, axis: str = "pp",
                    dp_axis: Optional[str] = "dp", remat: bool = True):
    """Build the pipelined stacked-layer executor.

    layer_apply(h, layer_p, lora_p, aux) -> h applies ONE layer;
    `aux` is a pytree of per-microbatch tensors (rope tables, segment
    ids, ...) with the same leading [mb, ...] batch dim as h.

    Returns run(stacked_layers, stacked_lora_or_None, x_mb, aux_mb) -> y_mb
    where x_mb is [M, mb, T, D] and aux_mb leaves are [M, mb, ...].
    """
    S = mesh.shape[axis]
    M = num_microbatches
    if num_layers % S != 0:
        raise ValueError(f"num_layers {num_layers} not divisible by "
                         f"pp={S} stages")
    perm = [(i, (i + 1) % S) for i in range(S)]

    def per_device(local_layers, local_lora, has_lora, x_mb, aux_mb):
        idx = jax.lax.axis_index(axis)

        def one_layer(h, per_layer, aux):
            layer_p, lora_p = per_layer
            return layer_apply(h, layer_p, lora_p if has_lora else None,
                               aux)

        def apply_stage(h, aux):
            def body(carry, per_layer):
                return one_layer(carry, per_layer, aux), None
            if remat:
                body = jax.checkpoint(body)
            h, _ = jax.lax.scan(body, h, (local_layers, local_lora))
            return h

        def step(carry, s):
            recv, out = carry
            # stage `idx` processes microbatch m = s - idx at step s
            m = jnp.clip(s - idx, 0, M - 1)
            aux = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, m, 0, keepdims=False), aux_mb)
            x0 = jax.lax.dynamic_index_in_dim(x_mb, m, 0, keepdims=False)
            cur = jnp.where(idx == 0, x0, recv)
            y = apply_stage(cur, aux)
            # last stage writes finished microbatch s-(S-1)
            oidx = jnp.clip(s - (S - 1), 0, M - 1)
            wmask = jnp.logical_and(idx == S - 1, s >= S - 1)
            prev = jax.lax.dynamic_index_in_dim(out, oidx, 0,
                                                keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(wmask, y, prev), oidx, 0)
            send = jax.lax.ppermute(y, axis, perm)
            return (send, out), None

        recv0 = jnp.zeros_like(x_mb[0])
        out0 = jnp.zeros_like(x_mb)
        (_, out), _ = jax.lax.scan(step, (recv0, out0),
                                   jnp.arange(M + S - 1))
        # result lives on the last stage; mask+psum broadcasts it (the
        # loss/lm_head then runs replicated over pp — cheap next to the
        # stack, and it keeps the train step SPMD-uniform)
        out = jax.lax.psum(
            jnp.where(idx == S - 1, out, jnp.zeros_like(out)), axis)
        return out

    def run(stacked_layers, stacked_lora, x_mb, aux_mb):
        has_lora = stacked_lora is not None
        if not has_lora:
            stacked_lora = jnp.zeros((num_layers, 0), jnp.float32)
        body = functools.partial(per_device)
        layer_spec = P(axis)
        mb_spec = P(None, dp_axis) if dp_axis else P()
        mapped = _shard_map(
            lambda l, lo, x, a: body(l, lo, has_lora, x, a),
            mesh,
            in_specs=(layer_spec, layer_spec, mb_spec, mb_spec),
            out_specs=mb_spec)
        return mapped(stacked_layers, stacked_lora, x_mb, aux_mb)

    return run


def place_pipeline_tree(tree, mesh: Mesh, *, axis: str = "pp"):
    """device_put: layers_stacked leaves sharded over pp on the leading
    (layer) axis, everything else replicated."""
    def place(path, x):
        names = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        if "layers_stacked" in names:
            return jax.device_put(x, NamedSharding(mesh, P(axis)))
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map_with_path(place, tree)


def pipeline_loss_fn(params: Dict[str, Any], lora: Optional[Dict[str, Any]],
                     batch: Dict[str, jnp.ndarray], cfg,
                     mesh: Mesh, *, num_microbatches: int = 4,
                     n_items=None, remat: bool = True,
                     lm_head_trainable: bool = False) -> jnp.ndarray:
    """SFT loss with the layer stack executed as a pp pipeline.

    Requires the stacked (`stack_params`) layout with homogeneous layers;
    embed/final-norm/lm-head+CE run replicated over pp (sharded over dp).
    Matches `decoder.loss_fn` exactly on the same batch.
    """
    from ..models.decoder import (_loss_from_hidden, _normp, _rope_tables,
                                  decoder_layer)

    if "layers_stacked" not in params:
        raise ValueError("pipeline_loss_fn requires stack_params layout")
    kinds = {cfg.layer_kind(i) for i in range(cfg.num_layers)}
    if len(kinds) > 1:
        raise ValueError("pipeline requires a uniform layer kind")

    input_ids = batch["input_ids"]
    labels = batch["labels"]
    b, t = input_ids.shape
    M = num_microbatches
    dp = mesh.shape.get("dp", 1)
    if b % (M * dp) != 0:
        raise ValueError(
            f"batch {b} must divide into num_microbatches={M} x dp={dp} "
            "(pipeline microbatching splits rows; for single-row "
            "long-context use the sp axis instead)")

    positions = batch.get("positions")
    if positions is None:
        positions = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32)[None], (b, t))
    segment_ids = batch.get("segment_ids")

    embed_w = (lora or {}).get("embed")
    if embed_w is None:
        embed_w = params["embed"]
    x = jnp.take(embed_w, input_ids, axis=0)
    if cfg.embed_scale is not None:
        x = x * jnp.asarray(cfg.embed_scale, dtype=x.dtype)

    cos, sin, _, _ = _rope_tables(cfg, positions)

    def mb(a):
        return a.reshape(M, b // M, *a.shape[1:])

    aux_mb = {"cos": mb(cos), "sin": mb(sin), "positions": mb(positions)}
    if segment_ids is not None:
        aux_mb["segment_ids"] = mb(segment_ids)

    def layer_apply(h, layer_p, lora_p, aux):
        return decoder_layer(h, layer_p, lora_p, cfg, 0,
                             aux["cos"], aux["sin"], None, None,
                             aux.get("segment_ids"), aux["positions"],
                             None)

    run = pipeline_layers(mesh, layer_apply, cfg.num_layers, M,
                          remat=remat)
    lora_stacked = (lora or {}).get("layers_stacked")
    y_mb = run(params["layers_stacked"], lora_stacked, mb(x), aux_mb)
    h = y_mb.reshape(b, t, -1)
    h = _normp(h, params, "final_norm", cfg)
    return _loss_from_hidden(params, lora, h, labels, cfg,
                             n_items=n_items,
                             lm_head_trainable=lm_head_trainable)


def enable_pipeline(model, pp: int, dp: int = 1, *,
                    num_microbatches: int = 4,
                    devices: Optional[Sequence[jax.Device]] = None):
    """Switch a loaded model to pipeline-parallel execution.

    Stacks the layer params (`stack_params` layout), shards them over a
    fresh ("dp", "pp") mesh, and tags the model so `SFTTrainer` routes
    its loss through `pipeline_loss_fn`. Per-step batch rows must divide
    num_microbatches * dp.
    """
    from ..models.decoder import stack_lora, stack_params

    mesh = create_pp_mesh(pp, dp, devices=devices)
    params = model.params
    if "layers" in params:
        params = stack_params(params)
    model.params = place_pipeline_tree(params, mesh)
    lora = getattr(model, "lora", None)
    if lora is not None:
        if "layers" in lora:
            lora = stack_lora(lora)
        model.lora = place_pipeline_tree(lora, mesh)
    model.mesh = None  # the GSPMD rules mesh does not apply
    model.pp_mesh = mesh
    model.pp_microbatches = num_microbatches
    return model
