"""Parameter-tree construction: random init, LoRA injection, quantization.

The LoRA target-module selection mirrors the reference's defaults
(reference: models/llama.py:3044 `get_peft_model` — default target_modules
q/k/v/o/gate/up/down; embedding/lm_head trainable via
`modules_to_save`)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.lora import LoRAWeights, init_lora
from ..ops.nf4 import NF4Tensor, quantize_nf4, quantize_nf4_stacked
from .config import ModelConfig

DEFAULT_TARGET_MODULES = ("q", "k", "v", "o", "gate", "up", "down")

# HF peft naming <-> our short names
HF_MODULE_NAMES = {
    "q_proj": "q", "k_proj": "k", "v_proj": "v", "o_proj": "o",
    "gate_proj": "gate", "up_proj": "up", "down_proj": "down",
}


def normalize_target_modules(mods: Sequence[str]) -> tuple:
    out = []
    for m in mods:
        out.append(HF_MODULE_NAMES.get(m, m))
    return tuple(out)


def _linear_dims(cfg: ModelConfig, name: str):
    d, f = cfg.hidden_size, cfg.intermediate_size
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q_out = hq * dh * (2 if cfg.gated_attention else 1)
    return {
        "q": (q_out, d), "k": (hkv * dh, d), "v": (hkv * dh, d),
        "o": (d, hq * dh),
        "gate": (f, d), "up": (f, d), "down": (d, f),
    }[name]


def init_params(cfg: ModelConfig, key, dtype=jnp.float32,
                init_scale: float = 0.02) -> Dict[str, Any]:
    """Random-init a full parameter tree (tests / tiny models)."""
    keys = jax.random.split(key, 4 + cfg.num_layers)

    def rand(k, shape, scale=init_scale):
        return (jax.random.normal(k, shape, dtype=jnp.float32) * scale).astype(dtype)

    d = cfg.hidden_size
    params: Dict[str, Any] = {
        "embed": rand(keys[0], (cfg.vocab_size, d)),
        "final_norm": jnp.zeros((d,), dtype) if cfg.gemma_norm
        else jnp.ones((d,), dtype),
        "layers": [],
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = rand(keys[1], (cfg.vocab_size, d))

    def norm_init():
        return jnp.zeros((d,), dtype) if cfg.gemma_norm else jnp.ones((d,), dtype)

    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[4 + i], 16)
        layer: Dict[str, Any] = {
            "input_norm": norm_init(),
            "post_attn_norm": norm_init(),
        }
        if cfg.use_post_norms:
            layer["post_attn_out_norm"] = norm_init()
            layer["pre_ffw_norm"] = norm_init()
            layer["post_ffw_norm"] = norm_init()
        if cfg.post_norm_only:  # olmo2
            layer["post_ffw_norm"] = norm_init()
        for j, name in enumerate(("q", "k", "v", "o")):
            layer[name] = rand(lk[j], _linear_dims(cfg, name))
            if cfg.attention_bias and name != "o":
                layer[f"{name}_bias"] = jnp.zeros(
                    (_linear_dims(cfg, name)[0],), dtype)
            if cfg.o_proj_bias and name == "o":
                layer["o_bias"] = jnp.zeros((d,), dtype)
        if cfg.qk_norm:
            qd = cfg.num_heads * cfg.head_dim if cfg.qk_norm == "full" \
                else cfg.head_dim
            kd = cfg.num_kv_heads * cfg.head_dim \
                if cfg.qk_norm == "full" else cfg.head_dim
            layer["q_norm"] = jnp.zeros((qd,), dtype) if cfg.gemma_norm \
                else jnp.ones((qd,), dtype)
            layer["k_norm"] = jnp.zeros((kd,), dtype) if cfg.gemma_norm \
                else jnp.ones((kd,), dtype)
        if cfg.attn_sinks:
            layer["sinks"] = rand(lk[12], (cfg.num_heads,), scale=1.0)
        if cfg.layer_is_moe(i):
            e = cfg.num_experts
            f = cfg.moe_intermediate_size or cfg.intermediate_size
            layer["router"] = rand(lk[8], (e, d))
            if cfg.router_bias:
                layer["router_bias"] = jnp.zeros((e,), dtype)
            layer["experts"] = {
                "gate": rand(lk[9], (e, f, d)),
                "up": rand(lk[10], (e, f, d)),
                "down": rand(lk[11], (e, d, f)),
            }
            if cfg.moe_mlp_bias:
                layer["experts"]["gate_bias"] = jnp.zeros((e, f), dtype)
                layer["experts"]["up_bias"] = jnp.zeros((e, f), dtype)
                layer["experts"]["down_bias"] = jnp.zeros((e, d), dtype)
        else:
            mlp_projs = ("gate", "up", "down") if cfg.mlp_gated \
                else ("up", "down")
            for j, name in enumerate(mlp_projs):
                layer[name] = rand(lk[4 + j], _linear_dims(cfg, name))
                if cfg.mlp_bias:
                    layer[f"{name}_bias"] = jnp.zeros(
                        (_linear_dims(cfg, name)[0],), dtype)
        if cfg.norm_bias:
            for nk in list(layer):
                if nk.endswith("_norm") and nk not in ("q_norm", "k_norm"):
                    layer[nk + "_bias"] = jnp.zeros((d,), dtype)
        params["layers"].append(layer)
    return params


def quantize_params(params: Dict[str, Any], cfg: ModelConfig,
                    block_size: int = 64, double_quant: bool = True,
                    dtype=jnp.bfloat16,
                    skip: Sequence[str] = ()) -> Dict[str, Any]:
    """Quantize the big linear weights to NF4 (QLoRA base). Norms, biases,
    embeddings and lm_head stay dense (matching the reference's bnb config:
    llm_int8_skip_modules keeps embed/lm_head/router in 16-bit)."""
    quantizable = {"q", "k", "v", "o", "gate", "up", "down"}
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = []
    for layer in params["layers"]:
        new_layer = {}
        for name, w in layer.items():
            if name in quantizable and name not in skip \
                    and isinstance(w, jnp.ndarray) and w.ndim == 2:
                new_layer[name] = quantize_nf4(
                    w, block_size=block_size, double_quant=double_quant,
                    dtype=dtype)
            elif name == "experts" and "experts" not in skip:
                # MoE QLoRA: stacked per-expert NF4 (gpt-oss-class MoE is
                # mostly expert params — this is what fits it on a chip).
                # The fused nf4_gmm kernel needs quant blocks aligned to
                # the split-half packing boundary (in/2 % bs == 0); drop
                # to a 32-elem block when 64 doesn't align (e.g. gpt-oss
                # 2880 -> half 1440 = 45*32).
                def _bs(in_f: int) -> int:
                    for b in (block_size, 32):
                        if in_f % b == 0 and (in_f // 2) % b == 0:
                            return b
                    return 0

                new_layer[name] = {
                    en: (quantize_nf4_stacked(ew, block_size=_bs(
                        ew.shape[-1]), dtype=dtype)
                         if hasattr(ew, "ndim") and ew.ndim == 3
                         and _bs(ew.shape[-1]) else ew)
                    for en, ew in w.items()
                }
            else:
                new_layer[name] = w
        out["layers"].append(new_layer)
    return out


def init_lora_tree(
    cfg: ModelConfig, key, r: int = 16, alpha: float = 16.0,
    target_modules: Sequence[str] = DEFAULT_TARGET_MODULES,
    dtype=jnp.float32, use_rslora: bool = False,
) -> Dict[str, Any]:
    """Build the trainable LoRA tree matching the params schema."""
    targets = set(normalize_target_modules(target_modules))
    if cfg.mla is not None:
        # MLA has no plain q/k/v linears; LoRA lands on o + the MLP
        targets &= {"o", "gate", "up", "down"}
    if cfg.zamba is not None:
        # zamba2: per-layer weights are mamba mixers; the fine-tuning
        # surface is the SHARED transformer blocks (q/k/v/o + fused
        # gate_up + down) — few blocks, reused every hybrid layer
        z = cfg.zamba
        d = cfg.hidden_size
        dims = {
            "q": (cfg.num_heads * cfg.head_dim, 2 * d),
            "k": (cfg.num_kv_heads * cfg.head_dim, 2 * d),
            "v": (cfg.num_kv_heads * cfg.head_dim, 2 * d),
            "o": (d, cfg.num_heads * cfg.head_dim),
            "gate_up": (2 * cfg.intermediate_size, d),
            "down": (d, cfg.intermediate_size),
        }
        wanted = [n for n in dims
                  if n in targets or (n == "gate_up"
                                      and {"gate", "up"} & targets)]
        blocks = []
        keys_b = jax.random.split(key, max(1, cfg.zamba.num_mem_blocks))
        for b in range(z.num_mem_blocks):
            ks = jax.random.split(keys_b[b], len(dims))
            blk = {}
            for j, name in enumerate(dims):
                if name not in wanted:
                    continue
                out_f, in_f = dims[name]
                blk[name] = init_lora(ks[j], in_f, out_f, r, alpha,
                                      dtype, use_rslora)
            blocks.append(blk)
        return {"layers": [{} for _ in range(cfg.num_layers)],
                "blocks": blocks}
    layers: List[Dict[str, Optional[LoRAWeights]]] = []
    keys = jax.random.split(key, cfg.num_layers)
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[i], len(DEFAULT_TARGET_MODULES))
        layer = {}
        for j, name in enumerate(DEFAULT_TARGET_MODULES):
            if name not in targets:
                continue
            if name in ("gate", "up", "down") and cfg.layer_is_moe(i):
                continue  # MoE expert LoRA comes later
            if name == "gate" and not cfg.mlp_gated:
                continue  # starcoder2/nemotron: no gate projection
            if name in ("q", "k", "v", "o") and \
                    cfg.layer_kind(i) == "linear":
                continue  # GDN layers have no q/k/v/o linears
            out_f, in_f = _linear_dims(cfg, name)
            layer[name] = init_lora(lk[j], in_f, out_f, r, alpha, dtype,
                                    use_rslora)
        layers.append(layer)
    return {"layers": layers}


def count_params(tree) -> int:
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(x.size for x in leaves if hasattr(x, "size"))
