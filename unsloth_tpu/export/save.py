"""Save / merge / export.

Parity target: reference save.py — `unsloth_save_model` with save_method in
{lora, merged_16bit, merged_4bit} (:811+), fp32 LoRA merge `_merge_lora`
(:608), tokenizer/config asset preservation (:504), and the peft-format
adapter layout the reference delegates to peft's save_pretrained.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import hf_names
from ..models.hf_loader import save_params
from ..ops.lora import LoRAWeights, merge_lora
from ..ops.nf4 import NF4Tensor

_TOKENIZER_FILES = (
    "tokenizer.json", "tokenizer_config.json", "special_tokens_map.json",
    "tokenizer.model", "vocab.json", "merges.txt", "added_tokens.json",
    "generation_config.json", "chat_template.jinja",
)


def _copy_assets(src: Optional[str], dst: str):
    """Preserve tokenizer/config assets (reference: save.py:504)."""
    if not src or not os.path.isdir(src):
        return
    for fname in _TOKENIZER_FILES:
        p = os.path.join(src, fname)
        if os.path.exists(p):
            shutil.copy(p, os.path.join(dst, fname))


def merged_params(model) -> Dict[str, Any]:
    """Dequantize + merge LoRA into every targeted projection in fp32,
    cast back (reference: save.py:608 `_merge_lora`)."""
    params = model.params
    lora = model.lora
    if "layers_stacked" in params:
        from ..models.decoder import unstack_lora

        params = _unstack_params(params, model.cfg.num_layers)
        if lora is not None and "layers_stacked" in lora:
            lora = unstack_lora(lora, model.cfg.num_layers)
    lora_layers = (lora or {}).get("layers")
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = []
    for i, layer in enumerate(params["layers"]):
        lora_p = lora_layers[i] if lora_layers else {}
        new_layer = {}
        for name, w in layer.items():
            lw = lora_p.get(name) if isinstance(lora_p, dict) else None
            if isinstance(lw, LoRAWeights):
                new_layer[name] = merge_lora(w, lw, dtype=jnp.bfloat16)
            elif isinstance(w, NF4Tensor):
                from ..ops.nf4 import dequantize_nf4

                new_layer[name] = dequantize_nf4(w, jnp.bfloat16)
            elif name == "experts" and isinstance(w, dict):
                # MoE QLoRA keeps experts as stacked per-expert NF4
                from ..ops.nf4 import NF4Stacked, dequantize_nf4_stacked

                new_layer[name] = {
                    k: (dequantize_nf4_stacked(v, jnp.bfloat16)
                        if isinstance(v, NF4Stacked) else v)
                    for k, v in w.items()}
            else:
                new_layer[name] = w
        out["layers"].append(new_layer)
    return out


def _unstack_params(params, num_layers):
    import jax

    stacked = params["layers_stacked"]
    layers = [jax.tree_util.tree_map(lambda x: x[i], stacked)
              for i in range(num_layers)]
    out = {k: v for k, v in params.items() if k != "layers_stacked"}
    out["layers"] = layers
    return out


def save_pretrained_merged(model, path: str, tokenizer=None,
                           save_method: str = "merged_16bit",
                           max_shard_bytes: int = 4 * 1024**3):
    """Merged 16-bit HF-layout export (reference: save.py:2253
    `unsloth_save_pretrained_merged`)."""
    if save_method == "lora":
        return save_lora(model, path)
    if save_method not in ("merged_16bit", "merged_4bit",
                           "merged_4bit_forced"):
        raise ValueError(f"Unknown save_method: {save_method!r}")
    os.makedirs(path, exist_ok=True)
    params = merged_params(model)
    save_params(params, model.cfg, path, dtype=jnp.bfloat16,
                max_shard_bytes=max_shard_bytes,
                hf_config=model.hf_config)
    _copy_assets(model.model_path, path)
    if tokenizer is not None and hasattr(tokenizer, "save_pretrained"):
        tokenizer.save_pretrained(path)
    return path


# ---------------------------------------------------------------------------
# Hub push (reference: save.py:2368 unsloth_push_to_hub_merged,
# :3395 unsloth_push_to_hub_gguf, :2529-2679 repo create/upload)
# ---------------------------------------------------------------------------


def _hub_upload(repo_id: str, folder: str, token=None,
                private: bool = False):
    """Create the repo and upload `folder`. Module-level so tests (and
    offline users) can stub it; raises with the staged path preserved."""
    from huggingface_hub import HfApi

    api = HfApi(token=token)
    api.create_repo(repo_id, private=private, exist_ok=True)
    api.upload_folder(repo_id=repo_id, folder_path=folder)


def _staging_dir(repo_id: str) -> str:
    base = os.path.join(
        os.path.expanduser(os.environ.get("UNSLOTH_CACHE_DIR",
                                          "~/.cache/unsloth_tpu")),
        "hub_staging", repo_id.replace("/", "--"))
    os.makedirs(base, exist_ok=True)
    return base


def _push_staged(repo_id: str, staged: str, token, private) -> str:
    try:
        _hub_upload(repo_id, staged, token=token, private=private)
    except Exception as e:  # noqa: BLE001 — offline/auth failures
        raise RuntimeError(
            f"Upload to '{repo_id}' failed ({type(e).__name__}: {e}). "
            f"The export itself succeeded and is staged at: {staged}"
        ) from e
    return staged


def push_to_hub_merged(model, repo_id: str, tokenizer=None,
                       save_method: str = "merged_16bit",
                       token=None, private: bool = False, **kw):
    """Merge + upload to the Hub (reference: save.py:2368). The artifact
    is always materialized locally first (staging dir), so a failed
    upload never loses the merge."""
    staged = _staging_dir(repo_id)
    save_pretrained_merged(model, staged, tokenizer=tokenizer,
                           save_method=save_method, **kw)
    return _push_staged(repo_id, staged, token, private)


def push_to_hub_gguf(model, repo_id: str, tokenizer=None,
                     quantization_method: str = "q8_0",
                     token=None, private: bool = False, **kw):
    """GGUF quantize + upload (reference: save.py:3395)."""
    from .gguf import save_pretrained_gguf

    staged = _staging_dir(repo_id)
    save_pretrained_gguf(model, staged,
                         quantization_method=quantization_method,
                         tokenizer=tokenizer, **kw)
    return _push_staged(repo_id, staged, token, private)


def push_to_hub_lora(model, repo_id: str, token=None,
                     private: bool = False):
    """Adapter-only upload (reference: save.py push_to_hub with
    save_method='lora')."""
    staged = _staging_dir(repo_id)
    save_lora(model, staged)
    return _push_staged(repo_id, staged, token, private)


# ---------------------------------------------------------------------------
# peft-format LoRA adapter
# ---------------------------------------------------------------------------

_PEFT_MODULE_NAMES = {
    "q": "self_attn.q_proj", "k": "self_attn.k_proj",
    "v": "self_attn.v_proj", "o": "self_attn.o_proj",
    "gate": "mlp.gate_proj", "up": "mlp.up_proj", "down": "mlp.down_proj",
}


def save_lora(model, path: str):
    """Write a peft-compatible adapter (adapter_model.safetensors +
    adapter_config.json) so merged-elsewhere workflows keep working."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    lora = model.lora
    if lora is not None and "layers_stacked" in lora:
        from ..models.decoder import unstack_lora

        lora = unstack_lora(lora, model.cfg.num_layers)
    lora_layers = (lora or {}).get("layers", [])
    tensors = {}
    for i, layer in enumerate(lora_layers):
        for name, lw in layer.items():
            if not isinstance(lw, LoRAWeights):
                continue
            base = (f"base_model.model.model.layers.{i}."
                    f"{_PEFT_MODULE_NAMES[name]}")
            # ascontiguousarray: TPU device_get may return Fortran-order
            # views; safetensors writes raw bytes ignoring strides.
            tensors[f"{base}.lora_A.weight"] = np.ascontiguousarray(
                np.asarray(jax.device_get(lw.a.astype(jnp.float32))))
            tensors[f"{base}.lora_B.weight"] = np.ascontiguousarray(
                np.asarray(jax.device_get(lw.b.astype(jnp.float32))))
            if getattr(lw, "m", None) is not None:
                # peft DoRA magnitude param name
                tensors[f"{base}.lora_magnitude_vector.weight"] = \
                    np.ascontiguousarray(np.asarray(
                        jax.device_get(lw.m.astype(jnp.float32))))
    save_file(tensors, os.path.join(path, "adapter_model.safetensors"))

    lc = model.lora_config or {}
    target_modules = sorted({
        _PEFT_MODULE_NAMES[n].split(".")[-1]
        for layer in lora_layers for n in layer})
    adapter_config = {
        "peft_type": "LORA",
        "base_model_name_or_path": model.cfg.name or model.model_path,
        "r": lc.get("r", 16),
        "lora_alpha": lc.get("lora_alpha", 16),
        "lora_dropout": lc.get("lora_dropout", 0.0),
        "bias": lc.get("bias", "none"),
        "use_rslora": lc.get("use_rslora", False),
        "use_dora": lc.get("use_dora", False),
        "target_modules": target_modules,
        "task_type": "CAUSAL_LM",
        "fan_in_fan_out": False,
        "inference_mode": False,
    }
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump(adapter_config, f, indent=2)
    return path


def load_lora_tree(path: str, num_layers: int):
    """Read a peft adapter directory into a (lora_tree, lora_config)
    pair without touching any model — the unit multi-adapter serving
    loads per name (reference: vLLM LoRARequest adapters behind
    model.load_lora, _utils.py:3681-3690)."""
    from safetensors import safe_open

    lc_path = os.path.join(path, "adapter_config.json")
    with open(lc_path) as f:
        lc = json.load(f)
    scale = (lc["lora_alpha"] / (lc["r"] ** 0.5) if lc.get("use_rslora")
             else lc["lora_alpha"] / lc["r"])
    inv = {v.split(".")[-1]: k for k, v in _PEFT_MODULE_NAMES.items()}

    layers = [dict() for _ in range(num_layers)]
    with safe_open(os.path.join(path, "adapter_model.safetensors"),
                   framework="numpy") as f:
        names = list(f.keys())
        for name in names:
            if not name.endswith(".lora_A.weight"):
                continue
            stem = name[: -len(".lora_A.weight")]
            parts = stem.split(".")
            layer_idx = int(parts[parts.index("layers") + 1])
            ours = inv[parts[-1]]
            a = jnp.asarray(f.get_tensor(name))
            b = jnp.asarray(f.get_tensor(stem + ".lora_B.weight"))
            mkey = stem + ".lora_magnitude_vector.weight"
            if mkey in names:
                from ..ops.lora import DoRAWeights

                layers[layer_idx][ours] = DoRAWeights(
                    a=a, b=b, scale=scale,
                    m=jnp.asarray(f.get_tensor(mkey)))
            else:
                layers[layer_idx][ours] = LoRAWeights(a=a, b=b,
                                                      scale=scale)
    return {"layers": layers}, lc


def load_lora(model, path: str):
    """Load a peft adapter back into the model's LoRA tree."""
    model.lora, model.lora_config = load_lora_tree(path,
                                                   model.cfg.num_layers)
    return model
