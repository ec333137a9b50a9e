"""GGUF -> model loader: a quantized export is also a runnable artifact.

The reference serves GGUF models through llama.cpp's ``llama-server``
(reference: studio/backend/core/inference/llama_cpp.py orchestrates the
C++ binary; save.py:1445-1814 builds it). TPU-natively there is no
separate C++ inference engine — this module loads a .gguf straight back
into the functional decoder (dequantize -> HF-shaped pytree), rebuilds
the tokenizer from the embedded vocab/merges, and hands the result to
the same generate/serving stack every other checkpoint uses
(``FastLanguageModel.from_pretrained("model.gguf")`` just works).

Inverse of export/gguf.py's ``save_to_gguf``: metadata -> ModelConfig
(via a synthesized HF config so all per-arch knob logic is reused),
llama.cpp tensor names -> params pytree, tokenizer.ggml.* -> a fast
BPE tokenizer.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .gguf_writer import read_gguf

# inverse of export/gguf.py _GGUF_ARCH (mistral exports as "llama";
# the sliding window survives in metadata either way)
_ARCH_TO_MODEL_TYPE = {
    "llama": "llama", "qwen2": "qwen2", "qwen3": "qwen3",
    "gemma": "gemma", "gemma2": "gemma2", "gemma3": "gemma3_text",
    "command-r": "cohere", "qwen3moe": "qwen3_moe",
}


def _hf_config_from_metadata(md: Dict[str, Any],
                             tensor_names: set) -> Dict[str, Any]:
    arch = md.get("general.architecture", "llama")
    mt = _ARCH_TO_MODEL_TYPE.get(arch, "llama")

    def g(key, default=None):
        return md.get(f"{arch}.{key}", default)

    n_heads = int(g("attention.head_count", 32))
    hidden = int(g("embedding_length", 4096))
    head_dim = int(g("attention.key_length", hidden // n_heads))
    hf: Dict[str, Any] = {
        "model_type": mt,
        "vocab_size": int(g("vocab_size",
                            len(md.get("tokenizer.ggml.tokens", [])))),
        "hidden_size": hidden,
        "intermediate_size": int(g("feed_forward_length", 4 * hidden)),
        "num_hidden_layers": int(g("block_count", 1)),
        "num_attention_heads": n_heads,
        "num_key_value_heads": int(g("attention.head_count_kv", n_heads)),
        "head_dim": head_dim,
        "max_position_embeddings": int(g("context_length", 2048)),
        "rms_norm_eps": float(g("attention.layer_norm_rms_epsilon", 1e-5)),
        "rope_theta": float(g("rope.freq_base", 10000.0)),
        "tie_word_embeddings": "output.weight" not in tensor_names,
        "attention_bias": "blk.0.attn_q.bias" in tensor_names,
    }
    if g("expert_count"):
        hf["num_experts"] = int(g("expert_count"))
        hf["num_local_experts"] = hf["num_experts"]   # mixtral key
        hf["num_experts_per_tok"] = int(g("expert_used_count", 8))
        hf["moe_intermediate_size"] = int(
            g("expert_feed_forward_length", hf["intermediate_size"]))
        if mt == "llama":
            # llama.cpp serves mixtral under the "llama" arch with
            # expert_count metadata — the MoE keys are the tell
            hf["model_type"] = "mixtral"
    if g("attention.sliding_window") is not None:
        hf["sliding_window"] = int(g("attention.sliding_window"))
        hf["use_sliding_window"] = True          # qwen2 builder gate
        if mt == "llama":
            # mistral exports under the "llama" arch; the window key is
            # the tell (the llama builder has no sliding path)
            hf["model_type"] = "mistral"
    if g("attn_logit_softcapping") is not None:
        hf["attn_logit_softcapping"] = float(g("attn_logit_softcapping"))
    if g("final_logit_softcapping") is not None:
        hf["final_logit_softcapping"] = float(g("final_logit_softcapping"))
    scaling_type = g("rope.scaling.type")
    if scaling_type == "linear":
        hf["rope_scaling"] = {"rope_type": "linear",
                              "factor": float(g("rope.scaling.factor", 1.0))}
    elif scaling_type == "yarn":
        hf["rope_scaling"] = {
            "rope_type": "yarn",
            "factor": float(g("rope.scaling.factor", 1.0)),
            "original_max_position_embeddings":
                int(g("rope.scaling.original_context_length", 2048))}
    if md.get("tokenizer.ggml.bos_token_id") is not None:
        hf["bos_token_id"] = int(md["tokenizer.ggml.bos_token_id"])
    if md.get("tokenizer.ggml.eos_token_id") is not None:
        hf["eos_token_id"] = int(md["tokenizer.ggml.eos_token_id"])
    return hf


def _params_from_tensors(data: Dict[str, np.ndarray], cfg, dtype,
                         load_in_4bit: bool = False) -> Dict[str, Any]:
    """Invert export/gguf.py ``_tensor_entries`` naming."""
    import jax.numpy as jnp

    def to_jnp(x, quantize=False):
        arr = jnp.asarray(np.ascontiguousarray(x)).astype(dtype)
        if quantize and load_in_4bit and arr.ndim == 2 \
                and arr.shape[-1] % 64 == 0:
            from ..ops.nf4 import quantize_nf4

            return quantize_nf4(arr, dtype=dtype)
        return arr

    params: Dict[str, Any] = {
        "embed": to_jnp(data["token_embd.weight"]),
        "final_norm": to_jnp(data["output_norm.weight"]),
        "layers": [],
    }
    if "output.weight" in data:
        params["lm_head"] = to_jnp(data["output.weight"])
    for i in range(cfg.num_layers):
        p = f"blk.{i}."
        layer: Dict[str, Any] = {
            "input_norm": to_jnp(data[p + "attn_norm.weight"])}
        moe = p + "ffn_gate_inp.weight" in data
        projs = [("q", "attn_q"), ("k", "attn_k"), ("v", "attn_v"),
                 ("o", "attn_output")]
        if not moe:
            projs += [("gate", "ffn_gate"), ("up", "ffn_up"),
                      ("down", "ffn_down")]
        for ours, gguf in projs:
            layer[ours] = to_jnp(data[p + gguf + ".weight"],
                                 quantize=True)
        for ours, gguf in (("q_bias", "attn_q.bias"),
                           ("k_bias", "attn_k.bias"),
                           ("v_bias", "attn_v.bias")):
            if p + gguf in data:
                layer[ours] = to_jnp(data[p + gguf])
        if p + "attn_q_norm.weight" in data:
            layer["q_norm"] = to_jnp(data[p + "attn_q_norm.weight"])
            layer["k_norm"] = to_jnp(data[p + "attn_k_norm.weight"])
        if cfg.use_post_norms:
            layer["post_attn_out_norm"] = to_jnp(
                data[p + "post_attention_norm.weight"])
            layer["pre_ffw_norm"] = to_jnp(data[p + "ffn_norm.weight"])
            layer["post_ffw_norm"] = to_jnp(
                data[p + "post_ffw_norm.weight"])
        else:
            layer["post_attn_norm"] = to_jnp(data[p + "ffn_norm.weight"])
        if moe:
            layer["router"] = to_jnp(data[p + "ffn_gate_inp.weight"])
            layer["experts"] = {
                k: to_jnp(data[p + f"ffn_{k}_exps.weight"])
                for k in ("gate", "up", "down")}
        params["layers"].append(layer)
    return params


def tokenizer_from_gguf(md: Dict[str, Any]):
    """Rebuild a fast BPE tokenizer from tokenizer.ggml.* metadata
    (the embedded form export/gguf.py writes: 'gpt2' model = byte-level
    BPE)."""
    tokens = md.get("tokenizer.ggml.tokens")
    if not tokens:
        return None
    try:
        from tokenizers import Tokenizer, decoders, models, pre_tokenizers
        from transformers import PreTrainedTokenizerFast
    except Exception:                                # pragma: no cover
        return None

    token_types = md.get("tokenizer.ggml.token_type",
                         [1] * len(tokens))
    merges = [tuple(m.split(" ", 1)) if isinstance(m, str) else tuple(m)
              for m in md.get("tokenizer.ggml.merges", [])]
    vocab = {t: i for i, t in enumerate(tokens)}
    tok = Tokenizer(models.BPE(vocab=vocab, merges=merges,
                               fuse_unk=False, byte_fallback=False))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False,
                                                 use_regex=True)
    tok.decoder = decoders.ByteLevel()

    kwargs: Dict[str, Any] = {}
    bos_id = md.get("tokenizer.ggml.bos_token_id")
    eos_id = md.get("tokenizer.ggml.eos_token_id")
    if bos_id is not None and 0 <= int(bos_id) < len(tokens):
        kwargs["bos_token"] = tokens[int(bos_id)]
    if eos_id is not None and 0 <= int(eos_id) < len(tokens):
        kwargs["eos_token"] = tokens[int(eos_id)]
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, **kwargs)
    # CONTROL tokens (type 3) are the added/special set
    specials = [tokens[i] for i, t in enumerate(token_types)
                if t == 3 and tokens[i] not in (
                    kwargs.get("bos_token"), kwargs.get("eos_token"))]
    if specials:
        fast.add_special_tokens({"additional_special_tokens": specials},
                                replace_additional_special_tokens=False)
    if isinstance(md.get("tokenizer.chat_template"), str):
        fast.chat_template = md["tokenizer.chat_template"]
    return fast


def load_gguf(path: str, dtype: Any = None, max_seq_length: int = 2048,
              load_in_4bit: bool = False) -> Tuple[Any, Any]:
    """Load a .gguf file into a (LanguageModel, tokenizer) pair.

    Every tensor is dequantized to `dtype` (bf16 default); with
    ``load_in_4bit=True`` the 2-D projection weights are re-quantized to
    the native NF4 pytree so a GGUF can be served within the QLoRA
    memory envelope.
    """
    import jax.numpy as jnp

    from ..models.config import ModelConfig
    from ..models.loader import LanguageModel
    from ..parallel.mesh import ShardingRules

    dtype = dtype or jnp.bfloat16
    md, tensors, data = read_gguf(path, load_tensors=True)
    names = {t["name"] for t in tensors}
    hf = _hf_config_from_metadata(md, names)
    cfg = ModelConfig.from_hf_config(
        hf, name=md.get("general.name", os.path.basename(path)))
    params = _params_from_tensors(data, cfg, dtype,
                                  load_in_4bit=load_in_4bit)
    tokenizer = tokenizer_from_gguf(md)
    model = LanguageModel(cfg=cfg, params=params,
                          rules=ShardingRules(),
                          max_seq_length=max_seq_length,
                          tokenizer=tokenizer, hf_config=hf)
    return model, tokenizer
