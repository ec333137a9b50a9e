"""HBM requirement estimator (pre-flight sizing).

Parity target: the reference Studio's VRAM estimator route
(reference: studio/backend/routes/training_vram.py — predicts whether a
training config fits the GPU before launching). Same job here for TPU
HBM: weights + optimizer + gradient + activation accounting from the
model dims, quantization, LoRA config, and batch geometry.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

V5E_HBM_GB = 16.0

_BYTES_PER_PARAM = {
    "nf4": 0.55,      # packed 4-bit + absmax/double-quant overhead
    "int8": 1.06,
    "bf16": 2.0,
    "fp16": 2.0,
    "fp32": 4.0,
}


def count_params(vocab_size: int, hidden_size: int,
                 intermediate_size: int, num_layers: int,
                 num_heads: int, num_kv_heads: int,
                 head_dim: Optional[int] = None,
                 tie_word_embeddings: bool = False) -> int:
    dh = head_dim or hidden_size // num_heads
    attn = hidden_size * dh * (num_heads * 2 + num_kv_heads * 2)
    mlp = 3 * hidden_size * intermediate_size
    embed = vocab_size * hidden_size * (1 if tie_word_embeddings else 2)
    return num_layers * (attn + mlp) + embed


def estimate_hbm(
    *,
    vocab_size: int,
    hidden_size: int,
    intermediate_size: int,
    num_layers: int,
    num_heads: int,
    num_kv_heads: Optional[int] = None,
    head_dim: Optional[int] = None,
    seq_length: int = 2048,
    batch_size: int = 1,
    load_in_4bit: bool = True,
    full_finetuning: bool = False,
    lora_r: int = 16,
    dtype: str = "bf16",
    remat: bool = True,
    fused_ce: bool = True,
    hbm_gb: float = V5E_HBM_GB,
    tie_word_embeddings: bool = False,
) -> Dict[str, Any]:
    """Rough-but-honest HBM budget for one chip, in GB."""
    num_kv_heads = num_kv_heads or num_heads
    n_params = count_params(vocab_size, hidden_size, intermediate_size,
                            num_layers, num_heads, num_kv_heads, head_dim,
                            tie_word_embeddings)
    wb = _BYTES_PER_PARAM["nf4" if load_in_4bit else dtype]
    weights_gb = n_params * wb / 1e9

    if full_finetuning:
        # grads (dtype) + adam m,v (fp32) on every param
        train_params = n_params
        opt_gb = train_params * (2 + 8) / 1e9
    else:
        dh = head_dim or hidden_size // num_heads
        per_layer = lora_r * (
            # q, k, v, o, gate, up, down A+B factors
            (hidden_size + num_heads * dh)
            + 2 * (hidden_size + num_kv_heads * dh)
            + (num_heads * dh + hidden_size)
            + 2 * (hidden_size + intermediate_size)
            + (intermediate_size + hidden_size))
        train_params = num_layers * per_layer
        # fp32 master + grad + adam m,v
        opt_gb = train_params * 16 / 1e9

    tokens = batch_size * seq_length
    act_bytes = 2  # bf16 activations
    if remat:
        # one [B,T,D] residual per layer boundary + a working set of a few
        # [B,T,F]/[B,T,D] buffers for the layer being recomputed
        acts_gb = (tokens * hidden_size * num_layers * act_bytes
                   + 8 * tokens * max(intermediate_size, hidden_size)
                   * act_bytes) / 1e9
    else:
        acts_gb = (tokens * (6 * hidden_size + 2 * intermediate_size)
                   * num_layers * act_bytes) / 1e9
    logits_gb = (min(tokens, 4096) if fused_ce else tokens) \
        * vocab_size * 4 / 1e9

    total = weights_gb + opt_gb + acts_gb + logits_gb
    return {
        "params_b": round(n_params / 1e9, 3),
        "trainable_params_m": round(train_params / 1e6, 2),
        "weights_gb": round(weights_gb, 2),
        "optimizer_gb": round(opt_gb, 2),
        "activations_gb": round(acts_gb, 2),
        "logits_gb": round(logits_gb, 2),
        "total_gb": round(total, 2),
        "hbm_gb": hbm_gb,
        "fits": total < hbm_gb * 0.95,
        "headroom_gb": round(hbm_gb - total, 2),
    }


def estimate_hbm_for_config(hf_config: Dict[str, Any],
                            **kw) -> Dict[str, Any]:
    """estimate_hbm from an HF config.json dict."""
    return estimate_hbm(
        vocab_size=int(hf_config.get("vocab_size", 32000)),
        hidden_size=int(hf_config.get("hidden_size", 4096)),
        intermediate_size=int(hf_config.get("intermediate_size", 11008)),
        num_layers=int(hf_config.get("num_hidden_layers", 32)),
        num_heads=int(hf_config.get("num_attention_heads", 32)),
        num_kv_heads=hf_config.get("num_key_value_heads"),
        head_dim=hf_config.get("head_dim"),
        tie_word_embeddings=bool(
            hf_config.get("tie_word_embeddings", False)),
        **kw)
