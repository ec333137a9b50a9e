"""HF checkpoint name mapping: safetensors tensor names <-> our param tree.

The reference keeps HF models as live torch modules and monkey-patches them;
we instead map checkpoint tensors into a functional pytree at load time and
back at save time (reference analog: the name logic embedded in
models/mapper.py + save.py's merged save which walks HF state_dict names).

All weights keep the HF [out, in] orientation — no transposition happens at
load, so a round-trip load->save is bit-exact.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from .config import ModelConfig

# our layer-local name -> HF suffix (relative to model.layers.{i}.)
_LAYER_MAP = {
    "q": "self_attn.q_proj.weight",
    "k": "self_attn.k_proj.weight",
    "v": "self_attn.v_proj.weight",
    "o": "self_attn.o_proj.weight",
    "q_bias": "self_attn.q_proj.bias",
    "k_bias": "self_attn.k_proj.bias",
    "v_bias": "self_attn.v_proj.bias",
    "o_bias": "self_attn.o_proj.bias",
    "q_norm": "self_attn.q_norm.weight",
    "k_norm": "self_attn.k_norm.weight",
    "gate": "mlp.gate_proj.weight",
    "up": "mlp.up_proj.weight",
    "down": "mlp.down_proj.weight",
    "gate_bias": "mlp.gate_proj.bias",
    "up_bias": "mlp.up_proj.bias",
    "down_bias": "mlp.down_proj.bias",
    "input_norm": "input_layernorm.weight",
}

# post-norm architectures (gemma2/3) name the sandwich norms differently
_POST_NORM_MAP = {
    "post_attn_out_norm": "post_attention_layernorm.weight",
    "pre_ffw_norm": "pre_feedforward_layernorm.weight",
    "post_ffw_norm": "post_feedforward_layernorm.weight",
}
_PLAIN_NORM_MAP = {
    "post_attn_norm": "post_attention_layernorm.weight",
}

_TOP_MAP = {
    "embed": "model.embed_tokens.weight",
    "final_norm": "model.norm.weight",
    "lm_head": "lm_head.weight",
}

# MoE (qwen3_moe / mixtral layout)
_MOE_ROUTER = "mlp.gate.weight"
_MOE_ROUTER_BIAS = "mlp.gate.bias"


_GDN_MAP = {
    "gdn_qkvz": "linear_attn.in_proj_qkvz.weight",
    "gdn_ba": "linear_attn.in_proj_ba.weight",
    "gdn_conv_w": "linear_attn.conv1d.weight",
    "gdn_conv_b": "linear_attn.conv1d.bias",
    "gdn_dt_bias": "linear_attn.dt_bias",
    "gdn_A_log": "linear_attn.A_log",
    "gdn_norm": "linear_attn.norm.weight",
    "gdn_out": "linear_attn.out_proj.weight",
}


_MLA_MAP = {
    "q_a": "self_attn.q_a_proj.weight",
    "q_a_norm": "self_attn.q_a_layernorm.weight",
    "q_b": "self_attn.q_b_proj.weight",
    "kv_a": "self_attn.kv_a_proj_with_mqa.weight",
    "kv_a_norm": "self_attn.kv_a_layernorm.weight",
    "kv_b": "self_attn.kv_b_proj.weight",
}


# gemma-3n per-layer extras (HF Gemma3nTextDecoderLayer / AltUp / Laurel)
_GEMMA3N_LAYER_MAP = {
    "altup_correct_scale": "altup.correct_output_scale",
    "altup_corr_coefs": "altup.correction_coefs.weight",
    "altup_pred_coefs": "altup.prediction_coefs.weight",
    "altup_router": "altup.modality_router.weight",
    "altup_router_norm": "altup.router_norm.weight",
    "laurel_left": "laurel.linear_left.weight",
    "laurel_right": "laurel.linear_right.weight",
    "laurel_norm": "laurel.post_laurel_norm.weight",
    "pli_gate": "per_layer_input_gate.weight",
    "pli_proj": "per_layer_projection.weight",
    "pli_norm": "post_per_layer_input_norm.weight",
}

# gemma-3n top-level extras (HF Gemma3nTextModel)
_GEMMA3N_TOP_MAP = {
    "embed_per_layer": "model.embed_tokens_per_layer.weight",
    "per_layer_model_proj": "model.per_layer_model_projection.weight",
    "per_layer_proj_norm": "model.per_layer_projection_norm.weight",
}


def layer_name_map(cfg: ModelConfig, layer_idx: int) -> Dict[str, str]:
    """our name -> HF name for one decoder layer (non-expert tensors)."""
    prefix = f"model.layers.{layer_idx}."
    m = dict(_LAYER_MAP)
    if cfg.mla is not None:  # deepseek-v3 MLA replaces q/k/v
        for name in ("k", "v", "q_bias", "k_bias", "v_bias",
                     "q_norm", "k_norm"):
            m.pop(name, None)
        m.update(_MLA_MAP)
        if cfg.mla.q_lora_rank is None:
            for name in ("q_a", "q_a_norm", "q_b"):
                m.pop(name)
        else:
            m.pop("q")
    if cfg.use_post_norms:
        m.update(_POST_NORM_MAP)
    else:
        m.update(_PLAIN_NORM_MAP)
    if cfg.model_type in ("llama4", "falcon_h1", "bamba"):
        # llama4/falcon-h1/bamba name the MLP module "feed_forward"
        m = {ours: hf.replace("mlp.", "feed_forward.", 1)
             for ours, hf in m.items()}
    if cfg.gdn is not None and cfg.layer_kind(layer_idx) == "linear":
        # qwen3-next linear-attention layer: GDN mixer replaces attention
        for name in ("q", "k", "v", "o", "q_bias", "k_bias", "v_bias",
                     "o_bias", "q_norm", "k_norm"):
            m.pop(name, None)
        m.update(_GDN_MAP)
    if cfg.post_norm_only:  # olmo2
        m.pop("input_norm", None)
        m["post_ffw_norm"] = "post_feedforward_layernorm.weight"
    if cfg.hybrid_mamba:
        m["post_attn_norm"] = "pre_ff_layernorm.weight"
        m.update(_MAMBA_MAP)
        if not (cfg.mamba and cfg.mamba.rms_norm):
            m.pop("mamba_norm")
        if not (cfg.mamba and cfg.mamba.conv_bias):
            m.pop("mamba_conv_b")
    if cfg.model_type in ("bamba", "granitemoehybrid"):
        # serial hybrid: per-layer mamba OR attention (granitemoehybrid
        # keeps the standard post_attention_layernorm name)
        if cfg.model_type == "bamba":
            m["post_attn_norm"] = "pre_ff_layernorm.weight"
        if cfg.layer_kind(layer_idx) == "mamba":
            for nm in ("q", "k", "v", "o", "q_bias", "k_bias", "v_bias",
                       "o_bias", "q_norm", "k_norm"):
                m.pop(nm, None)
            m.update(_MAMBA_MAP)
            if not cfg.mamba.rms_norm:
                m.pop("mamba_norm")
            if not cfg.mamba.conv_bias:
                m.pop("mamba_conv_b")
    if cfg.altup is not None:
        m.update(_GEMMA3N_LAYER_MAP)
    if cfg.lightning is not None and \
            cfg.layer_kind(layer_idx) == "linear":
        # minimax lightning layer: fused qkv + gate + head norm replace
        # the standard attention projections
        for nm in ("q", "k", "v", "o", "q_bias", "k_bias", "v_bias",
                   "o_bias", "q_norm", "k_norm"):
            m.pop(nm, None)
        m["lightn_qkv"] = "self_attn.qkv_proj.weight"
        m["lightn_out"] = "self_attn.out_proj.weight"
        m["lightn_gate"] = "self_attn.output_gate.weight"
        m["lightn_norm"] = "self_attn.norm.weight"
    if cfg.model_type == "hunyuan_v1_dense":
        m["q_norm"] = "self_attn.query_layernorm.weight"
        m["k_norm"] = "self_attn.key_layernorm.weight"
    if cfg.model_type == "apertus":
        m["input_norm"] = "attention_layernorm.weight"
        m["post_attn_norm"] = "feedforward_layernorm.weight"
        m.pop("gate", None)
        # learnable xIELU scalars (HF XIELUActivation parameters)
        m["act_alpha_p"] = "mlp.act_fn.alpha_p"
        m["act_alpha_n"] = "mlp.act_fn.alpha_n"
    if cfg.model_type == "lfm2":
        m.update({
            "o": "self_attn.out_proj.weight",
            "q_norm": "self_attn.q_layernorm.weight",
            "k_norm": "self_attn.k_layernorm.weight",
            "gate": "feed_forward.w1.weight",
            "up": "feed_forward.w3.weight",
            "down": "feed_forward.w2.weight",
            "input_norm": "operator_norm.weight",
            "post_attn_norm": "ffn_norm.weight",
        })
        if cfg.layer_kind(layer_idx) == "conv":
            for nm in ("q", "k", "v", "o", "q_bias", "k_bias", "v_bias",
                       "o_bias", "q_norm", "k_norm"):
                m.pop(nm, None)
            m["conv_in"] = "conv.in_proj.weight"
            m["conv_w"] = "conv.conv.weight"
            m["conv_out"] = "conv.out_proj.weight"
            if cfg.short_conv_bias:
                m["conv_in_bias"] = "conv.in_proj.bias"
                m["conv_b"] = "conv.conv.bias"
                m["conv_out_bias"] = "conv.out_proj.bias"
    if not cfg.mlp_gated:
        m.pop("gate", None)
        m.pop("gate_bias", None)
        if cfg.model_type == "starcoder2":
            m["up"] = "mlp.c_fc.weight"
            m["up_bias"] = "mlp.c_fc.bias"
            m["down"] = "mlp.c_proj.weight"
            m["down_bias"] = "mlp.c_proj.bias"
    if cfg.norm_bias:
        for key in ("input_norm", "post_attn_norm", "post_attn_out_norm",
                    "pre_ffw_norm", "post_ffw_norm"):
            if key in m:
                m[key + "_bias"] = m[key][:-len(".weight")] + ".bias"
    out = {ours: prefix + hf for ours, hf in m.items()}
    if cfg.attn_sinks:
        out["sinks"] = prefix + "self_attn.sinks"
    if cfg.layer_is_moe(layer_idx):
        if cfg.model_type == "gpt_oss":
            # gpt-oss names its router "mlp.router"
            out["router"] = prefix + "mlp.router.weight"
            out["router_bias"] = prefix + "mlp.router.bias"
        elif cfg.model_type == "llama4":
            out["router"] = prefix + "feed_forward.router.weight"
        elif cfg.model_type in ("granitemoe", "granitemoeshared",
                                "granitemoehybrid"):
            out["router"] = prefix + "block_sparse_moe.router.layer.weight"
        else:
            out["router"] = prefix + _MOE_ROUTER
            out["router_bias"] = prefix + _MOE_ROUTER_BIAS
        for name in ("gate", "up", "down", "gate_bias", "up_bias",
                     "down_bias"):
            out.pop(name, None)
        if cfg.moe_shared_expert and cfg.model_type == "llama4":
            # the always-on shared expert reuses the dense gate/up/down
            # slots inside MoE layers
            for ours in ("gate", "up", "down"):
                out[ours] = (prefix + "feed_forward.shared_expert."
                             + ours + "_proj.weight")
        if cfg.moe_shared_gate:
            # qwen3-next / qwen2-moe shared expert with sigmoid gate
            out["shared_gate"] = prefix + "mlp.shared_expert_gate.weight"
            for ours in ("gate", "up", "down"):
                out[ours] = (prefix + "mlp.shared_expert."
                             + ours + "_proj.weight")
        if cfg.moe_routing == "deepseek":  # deepseek-v3 / glm4-moe
            out.pop("router_bias", None)
            out["router_correction"] = (
                prefix + "mlp.gate.e_score_correction_bias")
            if cfg.moe_shared_expert:
                for ours in ("gate", "up", "down"):
                    out[ours] = (prefix + "mlp.shared_experts."
                                 + ours + "_proj.weight")
    return out


def expert_name(layer_idx: int, expert_idx: int, proj: str) -> str:
    """HF name for one expert projection (qwen3_moe/mixtral layout:
    mlp.experts.{e}.{gate,up,down}_proj.weight; mixtral uses w1/w3/w2)."""
    return (f"model.layers.{layer_idx}.mlp.experts.{expert_idx}."
            f"{proj}_proj.weight")


_MIXTRAL_PROJ = {"gate": "w1", "up": "w3", "down": "w2"}


def mixtral_expert_name(layer_idx: int, expert_idx: int, proj: str) -> str:
    return (f"model.layers.{layer_idx}.block_sparse_moe.experts."
            f"{expert_idx}.{_MIXTRAL_PROJ[proj]}.weight")


_MAMBA_MAP = {
    "mamba_in_proj": "mamba.in_proj.weight",
    "mamba_conv_w": "mamba.conv1d.weight",
    "mamba_conv_b": "mamba.conv1d.bias",
    "mamba_dt_bias": "mamba.dt_bias",
    "mamba_A_log": "mamba.A_log",
    "mamba_D": "mamba.D",
    "mamba_out_proj": "mamba.out_proj.weight",
    "mamba_norm": "mamba.norm.weight",
}


def top_level_map(cfg: ModelConfig) -> Dict[str, str]:
    m = dict(_TOP_MAP)
    if cfg.tie_word_embeddings:
        m.pop("lm_head")
    if cfg.hybrid_mamba or cfg.model_type in ("bamba", "zamba2"):
        m["final_norm"] = "model.final_layernorm.weight"
    if cfg.model_type == "lfm2":
        m["final_norm"] = "model.embedding_norm.weight"
    if cfg.norm_bias:
        m["final_norm_bias"] = "model.norm.bias"
    if cfg.altup is not None:
        m.update(_GEMMA3N_TOP_MAP)
        for i in range(1, cfg.altup.num_inputs):
            m[f"altup_proj_{i}"] = f"model.altup_projections.{i - 1}.weight"
            m[f"altup_unembed_{i}"] = \
                f"model.altup_unembed_projections.{i - 1}.weight"
    return m


def all_expected_names(cfg: ModelConfig) -> List[str]:
    """Every HF tensor name this config implies (for validation)."""
    names = list(top_level_map(cfg).values())
    for i in range(cfg.num_layers):
        for ours, hf in layer_name_map(cfg, i).items():
            if ours.endswith("_bias"):
                base = ours[:-5]
                if base in ("q", "k", "v") and not cfg.attention_bias:
                    continue
                if base == "o" and not cfg.o_proj_bias:
                    continue
                if base in ("gate", "up", "down") and not cfg.mlp_bias:
                    continue
                if ours == "router_bias" and not cfg.router_bias:
                    continue
            if ours in ("q_norm", "k_norm") and not cfg.qk_norm:
                continue
            names.append(hf)
        if cfg.layer_is_moe(i):
            for e in range(cfg.num_experts):
                for proj in ("gate", "up", "down"):
                    names.append(expert_name(i, e, proj))
    return names
