"""Model -> GGUF export.

Parity target: reference save.py — `unsloth_save_pretrained_gguf` (:2940),
quant alias mapping like fast_quantized -> q8_0 and ALLOWED_QUANTS
(:1856-2250), Ollama Modelfile creation (:2714-2872) — done natively
(gguf_writer.py + csrc/gguf_quant.cpp) instead of building llama.cpp.

Covers the llama-family architectures (llama/mistral/qwen2/qwen3/gemma*).
Tokenizer metadata is extracted from the HF fast-tokenizer JSON (BPE ->
gguf "gpt2" tokenizer model).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..models.config import ModelConfig
from .gguf_writer import GGMLType, GGUFWriter
from .save import merged_params

# reference: save.py:132-157 ALLOWED_QUANTS — full llama-quantize menu.
QUANT_ALIASES = {
    "not_quantized": "f16",
    "fast_quantized": "q8_0",
    "quantized": "q4_k_m",
    "f32": "f32", "fp32": "f32",
    "f16": "f16", "fp16": "f16",
    "bf16": "bf16",
    "q8_0": "q8_0",
    "q4_0": "q4_0", "q4_1": "q4_1",
    "q5_0": "q5_0", "q5_1": "q5_1",
    "q4_k": "q4_k_m", "q4_k_m": "q4_k_m", "q4_k_s": "q4_k_s",
    "q5_k": "q5_k_m", "q5_k_m": "q5_k_m", "q5_k_s": "q5_k_s",
    "q6_k": "q6_k",
    "q3_k": "q3_k_m", "q3_k_l": "q3_k_l", "q3_k_m": "q3_k_m",
    "q3_k_s": "q3_k_s", "q3_k_xs": "q3_k_s",
    "q2_k": "q2_k", "q2_k_l": "q2_k_l",
    "iq4_nl": "iq4_nl", "iq4_xs": "iq4_xs",
}

_QUANT_TO_TYPE = {
    "f32": GGMLType.F32,
    "f16": GGMLType.F16,
    "bf16": GGMLType.BF16,
    "q8_0": GGMLType.Q8_0,
    "q4_0": GGMLType.Q4_0,
    "q4_1": GGMLType.Q4_1,
    "q5_0": GGMLType.Q5_0,
    "q5_1": GGMLType.Q5_1,
    "q2_k": GGMLType.Q2_K,
    "q2_k_l": GGMLType.Q2_K,
    "q3_k_l": GGMLType.Q3_K,
    "q3_k_m": GGMLType.Q3_K,
    "q3_k_s": GGMLType.Q3_K,
    "q4_k_m": GGMLType.Q4_K,
    "q4_k_s": GGMLType.Q4_K,
    "q5_k_m": GGMLType.Q5_K,
    "q5_k_s": GGMLType.Q5_K,
    "q6_k": GGMLType.Q6_K,
    "iq4_nl": GGMLType.IQ4_NL,
    "iq4_xs": GGMLType.IQ4_XS,
}

# Per-method tensor upgrades (reference: save.py:140-150 descriptions of
# llama.cpp's mixes). "more" applies on use_more_bits layers only; "all"
# on every layer.
_MIX_RULES = {
    "q4_k_m": ("more", ("attn_v.weight", "ffn_down.weight"),
               GGMLType.Q6_K),
    "q5_k_m": ("more", ("attn_v.weight", "ffn_down.weight"),
               GGMLType.Q6_K),
    "q3_k_l": ("all", ("attn_v.weight", "attn_output.weight",
                       "ffn_down.weight"), GGMLType.Q5_K),
    "q3_k_m": ("all", ("attn_v.weight", "attn_output.weight",
                       "ffn_down.weight"), GGMLType.Q4_K),
    "q2_k": ("all", ("attn_v.weight", "ffn_down.weight"), GGMLType.Q4_K),
    "q2_k_l": ("all", ("attn_v.weight", "ffn_down.weight"),
               GGMLType.Q4_K),
}


def _use_more_bits(i_layer: int, n_layer: int) -> bool:
    """llama.cpp's Q4_K_M layer selector for the 6-bit upgrades."""
    return (i_layer < n_layer // 8 or i_layer >= 7 * n_layer // 8
            or (i_layer - n_layer // 8) % 3 == 2)

ALLOWED_QUANTS = sorted(_QUANT_TO_TYPE)

# GGUF architecture string per model_type
_GGUF_ARCH = {
    "llama": "llama", "mistral": "llama", "qwen2": "qwen2",
    "qwen3": "qwen3", "gemma": "gemma", "gemma2": "gemma2",
    "gemma3": "gemma3", "gemma3_text": "gemma3", "cohere": "command-r",
    "qwen3_moe": "qwen3moe",
}


def _arch(cfg: ModelConfig) -> str:
    return _GGUF_ARCH.get(cfg.model_type, "llama")


def _np(x):
    import jax

    return np.ascontiguousarray(
        np.asarray(jax.device_get(x), dtype=np.float32))


def add_model_metadata(w: GGUFWriter, cfg: ModelConfig, name: str):
    arch = _arch(cfg)
    w.add_metadata("general.architecture", arch)
    w.add_metadata("general.name", name or cfg.name or "model")
    w.add_metadata(f"{arch}.context_length", cfg.max_position_embeddings)
    w.add_metadata(f"{arch}.embedding_length", cfg.hidden_size)
    w.add_metadata(f"{arch}.block_count", cfg.num_layers)
    w.add_metadata(f"{arch}.feed_forward_length", cfg.intermediate_size)
    w.add_metadata(f"{arch}.attention.head_count", cfg.num_heads)
    w.add_metadata(f"{arch}.attention.head_count_kv", cfg.num_kv_heads)
    w.add_metadata(f"{arch}.attention.layer_norm_rms_epsilon",
                   float(cfg.rms_norm_eps))
    w.add_metadata(f"{arch}.rope.freq_base", float(cfg.rope_theta))
    w.add_metadata(f"{arch}.rope.dimension_count",
                   int(cfg.head_dim * cfg.partial_rotary_factor))
    w.add_metadata(f"{arch}.attention.key_length", cfg.head_dim)
    w.add_metadata(f"{arch}.attention.value_length", cfg.head_dim)
    w.add_metadata(f"{arch}.vocab_size", cfg.vocab_size)
    if cfg.is_moe:
        # llama.cpp MoE keys (qwen3moe arch)
        w.add_metadata(f"{arch}.expert_count", cfg.num_experts)
        w.add_metadata(f"{arch}.expert_used_count",
                       cfg.num_experts_per_tok)
        w.add_metadata(f"{arch}.expert_feed_forward_length",
                       cfg.moe_intermediate_size
                       or cfg.intermediate_size)
    if cfg.sliding_window:
        w.add_metadata(f"{arch}.attention.sliding_window",
                       cfg.sliding_window)
    if cfg.attn_softcap:
        w.add_metadata(f"{arch}.attn_logit_softcapping",
                       float(cfg.attn_softcap))
    if cfg.final_softcap:
        w.add_metadata(f"{arch}.final_logit_softcapping",
                       float(cfg.final_softcap))
    if cfg.rope_scaling.rope_type == "linear":
        w.add_metadata(f"{arch}.rope.scaling.type", "linear")
        w.add_metadata(f"{arch}.rope.scaling.factor",
                       float(cfg.rope_scaling.factor))
    elif cfg.rope_scaling.rope_type == "yarn":
        w.add_metadata(f"{arch}.rope.scaling.type", "yarn")
        w.add_metadata(f"{arch}.rope.scaling.factor",
                       float(cfg.rope_scaling.factor))
        w.add_metadata(f"{arch}.rope.scaling.original_context_length",
                       cfg.rope_scaling.original_max_position_embeddings)


def add_tokenizer_metadata(w: GGUFWriter, model_path: Optional[str],
                           tokenizer=None, cfg: Optional[ModelConfig] = None):
    """Extract tokenizer into GGUF keys from the HF fast-tokenizer JSON
    (BPE -> gguf 'gpt2' model; sentencepiece-based repos also ship
    tokenizer.json). Fidelity check lives in tests (the reference validates
    GGUF tokenization parity, chat_templates.py:3019)."""
    tok_json = None
    if model_path:
        p = os.path.join(model_path, "tokenizer.json")
        if os.path.exists(p):
            with open(p, encoding="utf-8") as f:
                tok_json = json.load(f)
    if tok_json is None:
        return False

    model = tok_json.get("model", {})
    vocab: Dict[str, int] = model.get("vocab", {})
    merges = model.get("merges", [])
    added = tok_json.get("added_tokens", [])

    id_to_tok: Dict[int, str] = {}
    for tok, idx in vocab.items():
        id_to_tok[idx] = tok
    added_ids = set()
    for a in added:
        id_to_tok[a["id"]] = a["content"]
        added_ids.add(a["id"])

    n = (cfg.vocab_size if cfg else 0) or (max(id_to_tok) + 1)
    tokens, token_types = [], []
    for i in range(n):
        tok = id_to_tok.get(i)
        if tok is None:
            tokens.append(f"[PAD{i}]")
            token_types.append(2)  # UNUSED
        else:
            tokens.append(tok)
            token_types.append(3 if i in added_ids else 1)  # CONTROL/NORMAL

    w.add_metadata("tokenizer.ggml.model", "gpt2")
    w.add_metadata("tokenizer.ggml.pre", "llama-bpe")
    w.add_metadata("tokenizer.ggml.tokens", tokens)
    w.add_metadata("tokenizer.ggml.token_type", token_types)
    if merges:
        merge_strs = [m if isinstance(m, str) else " ".join(m)
                      for m in merges]
        w.add_metadata("tokenizer.ggml.merges", merge_strs)
    if cfg is not None:
        if cfg.bos_token_id is not None:
            w.add_metadata("tokenizer.ggml.bos_token_id",
                           int(cfg.bos_token_id))
        if cfg.eos_token_id is not None:
            w.add_metadata("tokenizer.ggml.eos_token_id",
                           int(cfg.eos_token_id))
    if tokenizer is not None and getattr(tokenizer, "chat_template", None):
        if isinstance(tokenizer.chat_template, str):
            w.add_metadata("tokenizer.chat_template",
                           tokenizer.chat_template)
    return True


def _tensor_entries(params: Dict[str, Any], cfg: ModelConfig
                    ) -> List[Tuple[str, Any]]:
    """(gguf_name, array) pairs in llama.cpp naming."""
    entries = [("token_embd.weight", params["embed"]),
               ("output_norm.weight", params["final_norm"])]
    if "lm_head" in params and not cfg.tie_word_embeddings:
        entries.append(("output.weight", params["lm_head"]))
    for i, layer in enumerate(params["layers"]):
        p = f"blk.{i}."
        entries.append((p + "attn_norm.weight", layer["input_norm"]))
        entries.append((p + "attn_q.weight", layer["q"]))
        entries.append((p + "attn_k.weight", layer["k"]))
        entries.append((p + "attn_v.weight", layer["v"]))
        entries.append((p + "attn_output.weight", layer["o"]))
        for ours, gguf in (("q_bias", "attn_q.bias"),
                           ("k_bias", "attn_k.bias"),
                           ("v_bias", "attn_v.bias")):
            if ours in layer:
                entries.append((p + gguf, layer[ours]))
        if "q_norm" in layer:
            entries.append((p + "attn_q_norm.weight", layer["q_norm"]))
            entries.append((p + "attn_k_norm.weight", layer["k_norm"]))
        if cfg.use_post_norms:
            entries.append((p + "post_attention_norm.weight",
                            layer["post_attn_out_norm"]))
            entries.append((p + "ffn_norm.weight", layer["pre_ffw_norm"]))
            entries.append((p + "post_ffw_norm.weight",
                            layer["post_ffw_norm"]))
        else:
            entries.append((p + "ffn_norm.weight", layer["post_attn_norm"]))
        if "experts" in layer:
            # llama.cpp MoE naming: router = ffn_gate_inp, stacked
            # per-expert projections = ffn_{gate,up,down}_exps [E, ...]
            entries.append((p + "ffn_gate_inp.weight", layer["router"]))
            entries.append((p + "ffn_gate_exps.weight",
                            layer["experts"]["gate"]))
            entries.append((p + "ffn_up_exps.weight",
                            layer["experts"]["up"]))
            entries.append((p + "ffn_down_exps.weight",
                            layer["experts"]["down"]))
        else:
            entries.append((p + "ffn_gate.weight", layer["gate"]))
            entries.append((p + "ffn_up.weight", layer["up"]))
            entries.append((p + "ffn_down.weight", layer["down"]))
    return entries


_LOW_BIT = (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q4_0,
            GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q5_K,
            GGMLType.IQ4_XS, GGMLType.IQ4_NL)


def _type_for(name: str, arr_shape, base_type: GGMLType,
              method: str = "", n_layer: int = 0) -> GGMLType:
    """Per-tensor type policy, mirroring llama.cpp quantize rules:
    1-D tensors (norms, biases) stay F32; token_embd/output get a
    higher-precision type; the *_m/*_l mixes upgrade attn_v /
    attn_output / ffn_down per _MIX_RULES."""
    if len(arr_shape) == 1:
        return GGMLType.F32
    if name.endswith("ffn_gate_inp.weight"):
        return GGMLType.F32          # llama.cpp keeps the router in F32
    if base_type in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
        return base_type
    from .gguf_writer import _TYPE_TRAITS

    if arr_shape[-1] % _TYPE_TRAITS[base_type][1] != 0:
        return GGMLType.F16
    if name == "output.weight":
        if method == "q2_k_l":
            return GGMLType.Q8_0
        # llama.cpp upgrades the output head: Q6_K for low-bit base types
        return (GGMLType.Q6_K if base_type in _LOW_BIT
                and arr_shape[-1] % 256 == 0 else GGMLType.Q8_0)
    if name == "token_embd.weight":
        if method == "q2_k_l":
            return GGMLType.Q8_0
        return base_type
    rule = _MIX_RULES.get(method)
    if rule and n_layer and name.startswith("blk."):
        when, suffixes, up_type = rule
        if any(name.endswith(s) for s in suffixes) \
                and arr_shape[-1] % 256 == 0:
            i_layer = int(name.split(".")[1])
            if when == "all" or _use_more_bits(i_layer, n_layer):
                return up_type
    return base_type


# Reference menu entries (save.py:140-173) that CANNOT be produced
# bit-compatibly here: llama.cpp's IQ1/IQ2/IQ3 decoders look values up in
# trained E8-lattice grid tables baked into ggml; without those exact
# tables an "iq2_xxs" file would parse but decode to garbage. We refuse
# loudly instead of writing a silently-wrong artifact.
_GRID_CODEBOOK_QUANTS = ("iq1_s", "iq1_m", "iq2_xxs", "iq2_xs", "iq2_s",
                         "iq2_m", "iq3_xxs", "iq3_s", "iq3_m")


def save_to_gguf(model, path: str, quantization_method: str = "q8_0",
                 name: Optional[str] = None,
                 imatrix: Optional[Dict[str, np.ndarray]] = None) -> str:
    """Merge (if LoRA present) + write one .gguf file. Returns file path.

    imatrix: per-tensor importance weights keyed by gguf tensor name
    (export/imatrix.py collect_imatrix output) — feeds the IQ4 weighted
    search (reference: save.py:3806 imatrix + IQ quants)."""
    if quantization_method.lower() in _GRID_CODEBOOK_QUANTS:
        raise ValueError(
            f"{quantization_method!r} needs llama.cpp's trained "
            "E8-lattice grid codebooks, which this native quantizer "
            "cannot reproduce bit-compatibly. Use q2_k / q3_k_* for "
            "similar sizes, or iq4_nl / iq4_xs (supported, "
            "imatrix-weighted).")
    method = QUANT_ALIASES.get(quantization_method.lower())
    if method is None:
        raise ValueError(
            f"Unsupported quantization {quantization_method!r}; "
            f"allowed: {sorted(QUANT_ALIASES)}")
    base_type = _QUANT_TO_TYPE[method]

    cfg = model.cfg
    params = merged_params(model)
    w = GGUFWriter(path)
    add_model_metadata(w, cfg, name or cfg.name)
    w.add_metadata("general.file_type",
                   int(_file_type_code(base_type, method)))
    add_tokenizer_metadata(w, model.model_path, model.tokenizer, cfg)

    for gguf_name, arr in _tensor_entries(params, cfg):
        arr = _np(arr)
        if gguf_name.endswith("norm.weight") and cfg.gemma_norm:
            pass  # gemma stores (1+w) convention; llama.cpp expects the
            # stored-form weight, which is what we have — no shift.
        t = _type_for(gguf_name, arr.shape, base_type,
                      method=method, n_layer=cfg.num_layers)
        qw = None
        if imatrix is not None and t in (
                GGMLType.IQ4_NL, GGMLType.IQ4_XS, GGMLType.Q2_K,
                GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K,
                GGMLType.Q6_K):
            # llama.cpp feeds the imatrix to the K-quant searches too
            # (weights = qw * sqrt(sigma2 + x^2)); see csrc/gguf_quant.cpp
            qw = imatrix.get(gguf_name)
        w.add_tensor(gguf_name, arr, t, quant_weights=qw)
    w.write()
    return path


def _file_type_code(t: GGMLType, method: str = "") -> int:
    """llama.cpp ftype codes (llama.h llama_ftype)."""
    by_method = {"q2_k": 10, "q2_k_l": 10, "q3_k_s": 11, "q3_k_m": 12,
                 "q3_k_l": 13, "q4_k_s": 14, "q4_k_m": 15, "q5_k_s": 16,
                 "q5_k_m": 17}
    if method in by_method:
        return by_method[method]
    return {GGMLType.F32: 0, GGMLType.F16: 1, GGMLType.Q4_0: 2,
            GGMLType.Q4_1: 3, GGMLType.Q5_0: 8, GGMLType.Q5_1: 9,
            GGMLType.Q8_0: 7, GGMLType.Q4_K: 15, GGMLType.Q5_K: 17,
            GGMLType.Q6_K: 18, GGMLType.IQ4_NL: 25, GGMLType.IQ4_XS: 30,
            GGMLType.BF16: 32}.get(t, 1)


def save_pretrained_gguf(model, save_dir: str,
                         quantization_method="q8_0",
                         tokenizer=None, **kwargs):
    """Reference-parity entry (reference: save.py:2940
    unsloth_save_pretrained_gguf; :1862 — quantization_method may be a
    LIST of tiers, e.g. ["q4_k_m", "q8_0", "q5_k_m"]). Writes
    {save_dir}/model-{quant}.gguf per tier + an Ollama Modelfile
    (pointing at the first tier); returns the path, or a list of paths
    for a list request."""
    if isinstance(quantization_method, (list, tuple)):
        paths = [save_pretrained_gguf(model, save_dir, q,
                                      tokenizer=tokenizer, **kwargs)
                 for q in quantization_method]
        _write_ollama_modelfile(model, save_dir,
                                os.path.basename(paths[0]))
        return paths
    os.makedirs(save_dir, exist_ok=True)
    method = QUANT_ALIASES.get(quantization_method.lower(),
                               quantization_method)
    out = os.path.join(save_dir, f"model-{method.upper()}.gguf")
    save_to_gguf(model, out, quantization_method=quantization_method,
                 imatrix=kwargs.get("imatrix"))
    _write_ollama_modelfile(model, save_dir, os.path.basename(out))
    return out


def _write_ollama_modelfile(model, save_dir: str, gguf_name: str):
    """Ollama Modelfile generation (reference: save.py:2714-2872
    create_ollama_modelfile; template pairing via the chat-template
    registry's ollama strings)."""
    template = None
    stop = None
    tok = model.tokenizer
    t = getattr(tok, "_unsloth_template", None) if tok else None
    if t is not None:
        template = t.ollama
        stop = t.stop_word
    lines = [f"FROM ./{gguf_name}"]
    if template:
        lines.append('TEMPLATE """' + template + '"""')
    if stop:
        lines.append(f'PARAMETER stop "{stop}"')
    lines.append("PARAMETER temperature 0.7")
    with open(os.path.join(save_dir, "Modelfile"), "w") as f:
        f.write("\n".join(lines) + "\n")


# ---------------------------------------------------------------------------
# LoRA adapter -> GGUF (llama.cpp adapter format)
# ---------------------------------------------------------------------------

_LORA_GGUF_NAMES = {
    "q": "attn_q", "k": "attn_k", "v": "attn_v", "o": "attn_output",
    "gate": "ffn_gate", "up": "ffn_up", "down": "ffn_down",
}


def save_lora_gguf(model, path: str, dtype=np.float32) -> str:
    """Write the LoRA adapter as a llama.cpp-loadable GGUF
    (convert_lora_to_gguf.py output format; reference behavior:
    save.py:3854-4054 converts peft adapters to GGML for llama.cpp's
    --lora flag).

    Layout: general.type="adapter", adapter.type="lora",
    adapter.lora.alpha; per-projection tensors named
    ``blk.<i>.<proj>.weight.lora_a`` [r, in] / ``.lora_b`` [out, r].
    llama.cpp applies W' = W + (alpha/r) * B @ A.
    """
    import jax

    lora = model.lora
    assert lora is not None, "model has no LoRA adapter"
    if "layers_stacked" in lora:
        from ..models.decoder import unstack_lora

        lora = unstack_lora(lora, model.cfg.num_layers)
    lc = model.lora_config or {}
    r = int(lc.get("r", 16))
    alpha = float(lc.get("lora_alpha", 16))

    w = GGUFWriter(path)
    w.add_metadata("general.architecture", _arch(model.cfg))
    w.add_metadata("general.type", "adapter")
    w.add_metadata("adapter.type", "lora")
    w.add_metadata("adapter.lora.alpha", alpha)
    w.add_metadata("general.name",
                   (model.cfg.name or "model") + "-lora")

    def host(x):
        return np.ascontiguousarray(
            np.asarray(jax.device_get(x)).astype(dtype))

    for i, layer in enumerate(lora.get("layers", [])):
        for ours, lw in layer.items():
            gguf_name = _LORA_GGUF_NAMES.get(ours)
            if gguf_name is None or not hasattr(lw, "a"):
                continue
            if getattr(lw, "m", None) is not None:
                raise ValueError(
                    "llama.cpp's GGUF adapter format cannot express DoRA "
                    "magnitudes; export a merged model "
                    "(save_pretrained_gguf) or a peft adapter "
                    "(save_lora) instead.")
            base = f"blk.{i}.{gguf_name}.weight"
            w.add_tensor(base + ".lora_a", host(lw.a), GGMLType.F32)
            w.add_tensor(base + ".lora_b", host(lw.b), GGMLType.F32)
    w.write()
    return path
