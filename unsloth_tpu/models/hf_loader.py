"""HF safetensors checkpoint <-> parameter pytree.

Replaces the reference's load path (reference: models/loader.py:403-1106
`FastLanguageModel.from_pretrained` -> HF `AutoModelForCausalLM` with a
BitsAndBytes NF4 config) with a direct safetensors reader:

  * shard-aware (model.safetensors.index.json or single file)
  * quantize-on-load: each large linear is NF4-quantized as it is read, so
    peak host/device memory stays ~0.55 bytes/param instead of 2
    (the analog of bnb's on-the-fly 4-bit load)
  * optional sharding: tensors are `jax.device_put` directly to their mesh
    sharding so multi-chip loads never materialize a replicated copy

Save goes the other way for merged/16-bit export (reference: save.py:811
`unsloth_save_model(save_method="merged_16bit")`).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nf4 import NF4Tensor, quantize_nf4
from .config import ModelConfig, load_hf_config
from . import hf_names

_QUANTIZABLE = ("q", "k", "v", "o", "gate", "up", "down")


def validate_checkpoint(path: str, timeout: float = 120.0) -> dict:
    """Validate a checkpoint's safetensors headers in a KILLABLE child
    process before the trainer touches it.

    Reference behavior: the reference prefetches HF snapshots in a
    killable child so a hung/corrupt file can't wedge the trainer
    (reference: models/_utils.py:1368 maybe_prefetch_hf_snapshot), and
    the Studio validates resume checkpoints before spawning a worker
    (core/training/resume.py:32-62). Offline analog: parse every shard's
    safetensors header (length-prefixed JSON) + check declared tensor
    byte-ranges fit the file, inside a subprocess with a hard timeout —
    a truncated shard or a pathological header dies in the child, not in
    the training process.

    Returns {"ok": bool, "shards": int, "tensors": int, "error": ...}.
    """
    import subprocess
    import sys

    code = r"""
import json, os, struct, sys
path = sys.argv[1]
index = os.path.join(path, "model.safetensors.index.json")
if os.path.exists(index):
    with open(index) as f:
        files = sorted(set(json.load(f)["weight_map"].values()))
else:
    files = ["model.safetensors"]
n_tensors = 0
for fn in files:
    full = os.path.join(path, fn)
    size = os.path.getsize(full)
    with open(full, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        if hlen > size - 8 or hlen > 500_000_000:
            raise ValueError(f"{fn}: header length {hlen} exceeds file")
        header = json.loads(f.read(hlen))
    data_size = size - 8 - hlen
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        lo, hi = meta["data_offsets"]
        if not (0 <= lo <= hi <= data_size):
            raise ValueError(f"{fn}: {name} offsets [{lo},{hi}) "
                             f"outside data region {data_size}")
        n_tensors += 1
print(json.dumps({"shards": len(files), "tensors": n_tensors}))
"""
    try:
        r = subprocess.run([sys.executable, "-c", code, path],
                           capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"ok": False, "error": f"validation timed out "
                                      f"({timeout}s) — hung IO?"}
    if r.returncode != 0:
        return {"ok": False,
                "error": (r.stderr or r.stdout).strip()[-500:]}
    out = json.loads(r.stdout.strip().splitlines()[-1])
    return {"ok": True, **out}


class CheckpointReader:
    """Random access to tensors across safetensors shards."""

    def __init__(self, path: str):
        self.path = path
        index_file = os.path.join(path, "model.safetensors.index.json")
        self._name_to_file: Dict[str, str] = {}
        if os.path.exists(index_file):
            with open(index_file) as f:
                index = json.load(f)
            self._name_to_file = dict(index["weight_map"])
        else:
            single = os.path.join(path, "model.safetensors")
            if not os.path.exists(single):
                raise FileNotFoundError(
                    f"No model.safetensors(.index.json) under {path}")
            from safetensors import safe_open

            with safe_open(single, framework="numpy") as f:
                for name in f.keys():
                    self._name_to_file[name] = "model.safetensors"
        self._open_files: Dict[str, Any] = {}
        self._aliases: Dict[str, str] = {}
        for name in list(self._name_to_file):
            # gemma-3n-style checkpoints nest the text tower under
            # model.language_model.* (and HF's key-mapping regex mangles
            # per_layer_model_projection); alias back to model.* names.
            alias = name
            if "per_layer_model.language_model_projection" in alias:
                alias = alias.replace(
                    "per_layer_model.language_model_projection",
                    "per_layer_model_projection")
            if alias.startswith("model.language_model."):
                alias = "model." + alias[len("model.language_model."):]
            if alias != name and alias not in self._name_to_file:
                self._aliases[alias] = name

    def names(self) -> Iterable[str]:
        return self._name_to_file.keys()

    def __contains__(self, name: str) -> bool:
        return name in self._name_to_file or name in self._aliases

    def get(self, name: str) -> np.ndarray:
        from safetensors import safe_open

        name = self._aliases.get(name, name)
        fname = self._name_to_file[name]
        if fname not in self._open_files:
            self._open_files[fname] = safe_open(
                os.path.join(self.path, fname), framework="numpy")
        return self._open_files[fname].get_tensor(name)

    def close(self):
        self._open_files.clear()


def _to_jnp(arr: np.ndarray, dtype) -> jnp.ndarray:
    # numpy has no bfloat16; safetensors returns ml_dtypes bfloat16 arrays,
    # which jnp.asarray handles.
    return jnp.asarray(arr).astype(dtype)


def load_params(
    path: str,
    cfg: Optional[ModelConfig] = None,
    *,
    dtype=jnp.bfloat16,
    load_in_4bit: bool = False,
    quant_block_size: int = 64,
    double_quant: bool = True,
    put: Optional[Callable[[str, jnp.ndarray], jnp.ndarray]] = None,
) -> Dict[str, Any]:
    """Load an HF causal-LM checkpoint directory into our param tree.

    ``put(tree_path, array)`` lets the caller place/shard each tensor
    (e.g. device_put with a NamedSharding) as it streams in.
    """
    if cfg is None:
        cfg = ModelConfig.from_hf_config(load_hf_config(path))
    if os.environ.get("UNSLOTH_VALIDATE_CHECKPOINT", "1") != "0":
        v = validate_checkpoint(path)
        if not v.get("ok"):
            raise ValueError(
                f"checkpoint validation failed for {path!r}: "
                f"{v.get('error')}")
    reader = CheckpointReader(path)
    put = put or (lambda _, x: x)

    def load_one(hf_name: str, tree_path: str, quantize: bool):
        from .bnb import is_bnb_quantized, load_bnb_tensor

        if is_bnb_quantized(reader, hf_name):
            # pre-quantized bnb-4bit checkpoint (unsloth/*-bnb-4bit): decode
            # the quant_state + repack nibbles on host, bit-exact with bnb's
            # double-dequant (reference: kernels/utils.py:567-679)
            q = load_bnb_tensor(reader, hf_name, dtype=dtype)
            return jax.tree_util.tree_map(
                lambda leaf: put(tree_path, leaf), q)
        arr = _to_jnp(reader.get(hf_name), dtype)
        if quantize and arr.ndim == 2:
            q = quantize_nf4(arr, block_size=quant_block_size,
                             double_quant=double_quant, dtype=dtype)
            return jax.tree_util.tree_map(
                lambda leaf: put(tree_path, leaf), q)
        return put(tree_path, arr)

    params: Dict[str, Any] = {"layers": []}
    for ours, hf in hf_names.top_level_map(cfg).items():
        if ours == "lm_head" and hf not in reader:
            # some checkpoints tie without setting the config flag
            continue
        params[ours] = load_one(hf, ours, quantize=False)

    if cfg.zamba is not None:
        _load_zamba2_layers(reader, cfg, params, dtype, put)
        reader.close()
        return params

    for i in range(cfg.num_layers):
        layer: Dict[str, Any] = {}
        for ours, hf in hf_names.layer_name_map(cfg, i).items():
            if hf not in reader:
                continue
            quantize = load_in_4bit and ours in _QUANTIZABLE
            layer[ours] = load_one(hf, f"layers.{i}.{ours}", quantize)
        _load_fused_projections(reader, cfg, i, layer, dtype,
                                load_in_4bit, put)
        if cfg.layer_is_moe(i):
            if "router" not in layer:
                # mixtral layout: block_sparse_moe.gate
                alt = f"model.layers.{i}.block_sparse_moe.gate.weight"
                if alt in reader:
                    layer["router"] = load_one(alt, f"layers.{i}.router",
                                               quantize=False)
            layer["experts"] = _load_experts(reader, cfg, i, dtype, put)
        params["layers"].append(layer)

    reader.close()
    return params


def _load_fused_projections(reader, cfg, i, layer, dtype, load_in_4bit,
                            put):
    """phi-3-style fused qkv_proj / gate_up_proj: split at load time so
    the runtime tree stays uniform."""
    from ..ops.nf4 import quantize_nf4

    def store(name, arr):
        if load_in_4bit and arr.ndim == 2:
            arr = quantize_nf4(arr, dtype=dtype)
        layer[name] = jax.tree_util.tree_map(
            lambda leaf: put(f"layers.{i}.{name}", leaf), arr) \
            if hasattr(arr, "packed") else put(f"layers.{i}.{name}", arr)

    qkv_name = f"model.layers.{i}.self_attn.qkv_proj.weight"
    if qkv_name in reader and "q" not in layer and \
            cfg.layer_kind(i) != "linear":
        # (minimax lightning layers keep qkv_proj FUSED as lightn_qkv —
        # its per-head [q|k|v] row order differs from the phi-3 layout)
        w = _to_jnp(reader.get(qkv_name), dtype)
        nq = cfg.num_heads * cfg.head_dim
        nkv = cfg.num_kv_heads * cfg.head_dim
        store("q", w[:nq])
        store("k", w[nq:nq + nkv])
        store("v", w[nq + nkv:nq + 2 * nkv])
    gu_name = f"model.layers.{i}.mlp.gate_up_proj.weight"
    if gu_name in reader and "gate" not in layer:
        w = _to_jnp(reader.get(gu_name), dtype)
        f = w.shape[0] // 2
        store("gate", w[:f])
        store("up", w[f:])
    sm_name = f"model.layers.{i}.shared_mlp.input_linear.weight"
    if sm_name in reader and "gate" not in layer:
        # granitemoeshared / granitemoehybrid: fused [2F, D] shared MLP
        # (first F rows gate/activated, last F rows up — HF
        # GraniteMoeSharedMLP.chunk(2)); output_linear is the down proj
        w = _to_jnp(reader.get(sm_name), dtype)
        f = w.shape[0] // 2
        store("gate", w[:f])
        store("up", w[f:])
        store("down", _to_jnp(reader.get(
            f"model.layers.{i}.shared_mlp.output_linear.weight"), dtype))


def _load_zamba2_layers(reader, cfg, params, dtype, put):
    """Zamba2: shared transformer blocks are TIED torch modules — the
    checkpoint stores one physical copy whose name is the FIRST hybrid
    layer using that block (blocks cycle, so block b first appears at
    hybrid_ids[b]); per-hybrid-layer adapters live inside the owning
    block's adapter lists at global hybrid index g. Mamba weights sit
    under `mamba.` (plain layers) or `mamba_decoder.mamba.` (hybrid)."""
    z = cfg.zamba

    def get(name):
        return put(name, _to_jnp(reader.get(name), dtype))

    params["blocks"] = []
    for b in range(z.num_mem_blocks):
        pre = f"model.layers.{z.hybrid_ids[b]}.shared_transformer."
        params["blocks"].append({
            "q": get(pre + "self_attn.q_proj.weight"),
            "k": get(pre + "self_attn.k_proj.weight"),
            "v": get(pre + "self_attn.v_proj.weight"),
            "o": get(pre + "self_attn.o_proj.weight"),
            "gate_up": get(pre + "feed_forward.gate_up_proj.weight"),
            "down": get(pre + "feed_forward.down_proj.weight"),
            "input_norm": get(pre + "input_layernorm.weight"),
            "pre_ff_norm": get(pre + "pre_ff_layernorm.weight"),
        })

    mamba_names = dict(hf_names._MAMBA_MAP)
    if not cfg.mamba.conv_bias:
        mamba_names.pop("mamba_conv_b")
    for i in range(cfg.num_layers):
        hybrid = i in z.hybrid_ids
        mp = f"model.layers.{i}." + ("mamba_decoder." if hybrid else "")
        layer = {"input_norm": get(mp + "input_layernorm.weight")}
        for ours, hf in mamba_names.items():
            layer[ours] = get(mp + hf)
        if hybrid:
            g = z.hybrid_ids.index(i)
            layer["linear"] = get(f"model.layers.{i}.linear.weight")
            ap = (f"model.layers.{z.hybrid_ids[g % z.num_mem_blocks]}"
                  ".shared_transformer.")
            if z.use_attn_adapter:
                for nm in ("q", "k", "v"):
                    base = ap + f"self_attn.linear_{nm}_adapter_list.{g}"
                    layer[f"adapter_{nm}_a"] = get(base + ".0.weight")
                    layer[f"adapter_{nm}_b"] = get(base + ".1.weight")
            base = ap + f"feed_forward.gate_up_proj_adapter_list.{g}"
            layer["adapter_gu_a"] = get(base + ".0.weight")
            layer["adapter_gu_b"] = get(base + ".1.weight")
        params["layers"].append(layer)


def _load_experts(reader, cfg, layer_idx, dtype, put):
    """Stack per-expert projections into [E, ...] tensors."""
    gup = f"model.layers.{layer_idx}.mlp.experts.gate_up_proj"
    if gup in reader and gup + "_bias" not in reader \
            and cfg.model_type != "gpt_oss":
        # qwen3-vl-moe: fused [E, D, 2F] input-major, gate/up CHUNKED
        # (first F columns gate — HF Qwen3VLMoeTextExperts.chunk(2)),
        # biasless; down [E, F, D] input-major
        import numpy as _np

        w = _np.asarray(reader.get(gup), _np.float32)
        f = w.shape[-1] // 2
        down = _np.asarray(reader.get(
            f"model.layers.{layer_idx}.mlp.experts.down_proj"),
            _np.float32)
        out = {"gate": w[..., :f].transpose(0, 2, 1),
               "up": w[..., f:].transpose(0, 2, 1),
               "down": down.transpose(0, 2, 1)}
        return {k: put(f"layers.{layer_idx}.experts.{k}",
                       jnp.asarray(_np.ascontiguousarray(v)).astype(dtype))
                for k, v in out.items()}
    if gup in reader or gup + "_blocks" in reader:
        return _load_gpt_oss_experts(reader, cfg, layer_idx, dtype, put)
    l4 = f"model.layers.{layer_idx}.feed_forward.experts.gate_up_proj"
    if l4 in reader:
        return _load_llama4_experts(reader, cfg, layer_idx, dtype, put)
    gm = f"model.layers.{layer_idx}.block_sparse_moe.input_linear.weight"
    if gm in reader:
        # granitemoe: input_linear [E, 2F, D] (gate rows then up rows),
        # output_linear [E, D, F] — already out-major, just split
        import numpy as _np

        w = _np.asarray(reader.get(gm), _np.float32)
        f = w.shape[1] // 2
        down = _np.asarray(reader.get(
            f"model.layers.{layer_idx}.block_sparse_moe."
            "output_linear.weight"), _np.float32)
        out = {"gate": w[:, :f, :], "up": w[:, f:, :], "down": down}
        return {k: put(f"layers.{layer_idx}.experts.{k}",
                       jnp.asarray(_np.ascontiguousarray(v)).astype(dtype))
                for k, v in out.items()}
    namer = hf_names.expert_name
    if hf_names.mixtral_expert_name(layer_idx, 0, "gate") in reader:
        namer = hf_names.mixtral_expert_name
    out = {}
    for proj in ("gate", "up", "down"):
        ws = [reader.get(namer(layer_idx, e, proj))
              for e in range(cfg.num_experts)]
        stacked = jnp.stack([jnp.asarray(w) for w in ws]).astype(dtype)
        out[proj] = put(f"layers.{layer_idx}.experts.{proj}", stacked)
    return out


def _load_gpt_oss_experts(reader, cfg, layer_idx, dtype, put):
    """gpt-oss stores all experts as single stacked tensors with gate/up
    INTERLEAVED on the last dim and input-major weight layout
    (HF GptOssExperts: gate_up_proj [E, D, 2F] used as x @ W, biases
    [E, 2F]; down_proj [E, F, D], bias [E, D]). De-interleave and
    transpose on host into our [E, F, D] / [E, D, F] out-major layout."""
    from .mxfp4 import is_mxfp4_quantized, load_mxfp4_tensor

    p = f"model.layers.{layer_idx}.mlp.experts."
    if is_mxfp4_quantized(reader, p + "gate_up_proj"):
        gup = load_mxfp4_tensor(reader, p + "gate_up_proj")
        down = load_mxfp4_tensor(reader, p + "down_proj")
    else:
        gup = np.asarray(reader.get(p + "gate_up_proj"), np.float32)
        down = np.asarray(reader.get(p + "down_proj"), np.float32)
    out = {
        "gate": gup[:, :, 0::2].transpose(0, 2, 1),   # [E, F, D]
        "up": gup[:, :, 1::2].transpose(0, 2, 1),
        "down": down.transpose(0, 2, 1),              # [E, D, F]
    }
    if p + "gate_up_proj_bias" in reader:
        gub = np.asarray(reader.get(p + "gate_up_proj_bias"), np.float32)
        out["gate_bias"] = gub[:, 0::2]
        out["up_bias"] = gub[:, 1::2]
    if p + "down_proj_bias" in reader:
        out["down_bias"] = np.asarray(
            reader.get(p + "down_proj_bias"), np.float32)
    return {
        k: put(f"layers.{layer_idx}.experts.{k}",
               jnp.asarray(np.ascontiguousarray(v)).astype(dtype))
        for k, v in out.items()
    }


def _load_llama4_experts(reader, cfg, layer_idx, dtype, put):
    """llama4 stacked experts: gate_up_proj [E, D, 2F] with gate/up
    CHUNKED on the last dim (HF Llama4TextExperts: gate, up =
    gate_up.chunk(2, dim=-1)); down_proj [E, F, D]. Both input-major —
    transpose on host into our [E, F, D] / [E, D, F] out-major layout."""
    p = f"model.layers.{layer_idx}.feed_forward.experts."
    gup = np.asarray(reader.get(p + "gate_up_proj"), np.float32)
    down = np.asarray(reader.get(p + "down_proj"), np.float32)
    f = gup.shape[-1] // 2
    out = {
        "gate": gup[:, :, :f].transpose(0, 2, 1),     # [E, F, D]
        "up": gup[:, :, f:].transpose(0, 2, 1),
        "down": down.transpose(0, 2, 1),              # [E, D, F]
    }
    return {
        k: put(f"layers.{layer_idx}.experts.{k}",
               jnp.asarray(np.ascontiguousarray(v)).astype(dtype))
        for k, v in out.items()
    }


def save_params(
    params: Dict[str, Any],
    cfg: ModelConfig,
    path: str,
    *,
    dtype=jnp.bfloat16,
    max_shard_bytes: int = 4 * 1024**3,
    hf_config: Optional[Dict[str, Any]] = None,
) -> None:
    """Write the param tree back as an HF-layout safetensors checkpoint
    (sharded, with index). NF4 tensors are dequantized. Mirrors the
    RAM-aware sharded merge-save of the reference (save.py:811+)."""
    from safetensors.numpy import save_file

    from ..ops.nf4 import dequantize_nf4

    os.makedirs(path, exist_ok=True)

    def materialize(x):
        if isinstance(x, NF4Tensor):
            x = dequantize_nf4(x, dtype)
        # ascontiguousarray is load-bearing: device_get from TPU can return
        # Fortran-order views, and safetensors serializes raw bytes without
        # consulting strides.
        return np.ascontiguousarray(np.asarray(jax.device_get(
            x.astype(dtype))))

    entries = []  # (hf_name, getter)
    for ours, hf in hf_names.top_level_map(cfg).items():
        if ours not in params:
            continue
        entries.append((hf, params[ours]))
    for i, layer in enumerate(params["layers"]):
        for ours, hf in hf_names.layer_name_map(cfg, i).items():
            if ours in layer:
                entries.append((hf, layer[ours]))
        if "experts" in layer:
            for proj in ("gate", "up", "down"):
                stacked = layer["experts"][proj]
                for e in range(cfg.num_experts):
                    entries.append(
                        (hf_names.expert_name(i, e, proj), stacked[e]))

    # Shard greedily under max_shard_bytes.
    shards: list = [[]]
    shard_bytes = [0]
    for name, tensor in entries:
        nbytes = int(np.prod(_shape_of(tensor))) * jnp.dtype(dtype).itemsize
        if shard_bytes[-1] + nbytes > max_shard_bytes and shards[-1]:
            shards.append([])
            shard_bytes.append(0)
        shards[-1].append((name, tensor))
        shard_bytes[-1] += nbytes

    weight_map = {}
    n = len(shards)
    for si, shard in enumerate(shards):
        fname = ("model.safetensors" if n == 1
                 else f"model-{si + 1:05d}-of-{n:05d}.safetensors")
        data = {name: materialize(t) for name, t in shard}
        save_file(data, os.path.join(path, fname),
                  metadata={"format": "pt"})
        for name, _ in shard:
            weight_map[name] = fname
    if n > 1:
        index = {"metadata": {"total_size": sum(shard_bytes)},
                 "weight_map": weight_map}
        with open(os.path.join(path, "model.safetensors.index.json"),
                  "w") as f:
            json.dump(index, f, indent=2)

    if hf_config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(hf_config, f, indent=2)


def _shape_of(t) -> tuple:
    if isinstance(t, NF4Tensor):
        return t.shape
    return t.shape
