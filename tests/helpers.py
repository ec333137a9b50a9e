"""Test helpers: fabricate tiny HF checkpoints on disk (offline env)."""

import json
import os

import numpy as np


def make_hf_checkpoint(path, hf_config, seed=0, dtype=np.float32):
    """Write config.json + model.safetensors with HF llama-family names,
    random weights. Returns the config dict."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(seed)
    d = hf_config["hidden_size"]
    v = hf_config["vocab_size"]
    f = hf_config["intermediate_size"]
    n_layers = hf_config["num_hidden_layers"]
    n_heads = hf_config["num_attention_heads"]
    n_kv = hf_config.get("num_key_value_heads", n_heads)
    dh = hf_config.get("head_dim") or d // n_heads
    model_type = hf_config.get("model_type", "llama")

    def w(*shape, scale=0.02):
        return (rng.randn(*shape) * scale).astype(dtype)

    tensors = {
        "model.embed_tokens.weight": w(v, d),
        "model.norm.weight": np.ones(d, dtype),
    }
    if not hf_config.get("tie_word_embeddings", False):
        tensors["lm_head.weight"] = w(v, d)
    for i in range(n_layers):
        p = f"model.layers.{i}."
        tensors[p + "self_attn.q_proj.weight"] = w(n_heads * dh, d)
        tensors[p + "self_attn.k_proj.weight"] = w(n_kv * dh, d)
        tensors[p + "self_attn.v_proj.weight"] = w(n_kv * dh, d)
        tensors[p + "self_attn.o_proj.weight"] = w(d, n_heads * dh)
        tensors[p + "input_layernorm.weight"] = np.ones(d, dtype)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(d, dtype)
        tensors[p + "mlp.gate_proj.weight"] = w(f, d)
        tensors[p + "mlp.up_proj.weight"] = w(f, d)
        tensors[p + "mlp.down_proj.weight"] = w(d, f)
        if hf_config.get("attention_bias"):
            tensors[p + "self_attn.q_proj.bias"] = w(n_heads * dh)
            tensors[p + "self_attn.k_proj.bias"] = w(n_kv * dh)
            tensors[p + "self_attn.v_proj.bias"] = w(n_kv * dh)
        if model_type in ("qwen3",):
            tensors[p + "self_attn.q_norm.weight"] = np.ones(dh, dtype)
            tensors[p + "self_attn.k_norm.weight"] = np.ones(dh, dtype)

    save_file(tensors, os.path.join(path, "model.safetensors"),
              metadata={"format": "pt"})
    with open(os.path.join(path, "config.json"), "w") as fh:
        json.dump(hf_config, fh)
    return hf_config


TINY_LLAMA = {
    "model_type": "llama",
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128,
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "max_position_embeddings": 128,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "torch_dtype": "float32",
    "bos_token_id": 1,
    "eos_token_id": 2,
    "hidden_act": "silu",
}

TINY_QWEN3 = {
    "model_type": "qwen3",
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 128,
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 16,
    "max_position_embeddings": 128,
    "rms_norm_eps": 1e-6,
    "rope_theta": 1000000.0,
    "tie_word_embeddings": True,
    "torch_dtype": "float32",
    "hidden_act": "silu",
}
