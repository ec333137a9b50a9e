"""LoftQ initialization (LoRA-Fine-Tuning-aware Quantization).

Alternating quantize/SVD init (arXiv:2310.08659): find NF4 base Q and
adapters A, B such that Q + scale*B@A approximates the dense weight W at
init, so QLoRA starts from (near) the full-precision model instead of the
quantization error. The reference reaches this through peft's
``LoraConfig(init_lora_weights="loftq", loftq_config=...)``
(reference: models/llama.py:3068,3102 passes loftq_config through);
here it is native over the functional param tree.

Iteration t (A_0 = B_0 = 0):
    Q_t   = quant(W - scale * B_t @ A_t)
    R_t   = (W - dequant(Q_t)) / scale
    U S V = svd(R_t);  B_{t+1} = U_r sqrt(S_r);  A_{t+1} = sqrt(S_r) V_r

Because ``scale`` is folded into the residual, ``Q + scale*B@A`` (the
exact forward computation) is what approximates W — peft's own loftq
ignores the scale, which only matches when alpha == r.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from ..ops.lora import LoRAWeights
from ..ops.nf4 import NF4Tensor, dequantize_nf4, quantize_nf4


def _loftq_factorize(w: jnp.ndarray, r: int, scale: float, n_iter: int,
                     block_size: int = 64) -> Tuple[NF4Tensor, jnp.ndarray,
                                                    jnp.ndarray]:
    """One weight matrix [out, in] -> (NF4 base, a [r,in], b [out,r])."""
    w32 = w.astype(jnp.float32)
    ba = jnp.zeros_like(w32)
    q = a = b = None
    for _ in range(max(1, n_iter)):
        q = quantize_nf4(w32 - ba, block_size=block_size,
                         double_quant=True, dtype=jnp.bfloat16)
        resid = (w32 - dequantize_nf4(q, dtype=jnp.float32)) / scale
        u, s, vh = jnp.linalg.svd(resid, full_matrices=False)
        sq = jnp.sqrt(s[:r])
        b = u[:, :r] * sq[None, :]
        a = sq[:, None] * vh[:r]
        ba = scale * (b @ a)
    return q, a, b


def apply_loftq(params: Dict[str, Any], lora: Dict[str, Any],
                loftq_config: Any, lora_config: Dict[str, Any],
                block_size: int = 64) -> Tuple[Dict[str, Any],
                                               Dict[str, Any]]:
    """Run LoftQ over every LoRA-targeted dense 2-D weight. Returns the
    (quantized params, initialized lora) pair; the base MUST still be
    dense (load_in_4bit=False) — LoftQ needs the original weights."""
    if hasattr(loftq_config, "__dict__") and not isinstance(
            loftq_config, dict):
        loftq_config = {k: v for k, v in vars(loftq_config).items()}
    bits = int(loftq_config.get("loftq_bits", 4))
    n_iter = int(loftq_config.get("loftq_iter", 1))
    if bits != 4:
        raise ValueError(
            f"loftq_bits={bits} is not supported; the NF4 (4-bit) base is "
            "the QLoRA path this framework quantizes to")

    r = int(lora_config.get("r", 16))
    if "layers" not in params or "layers" not in lora:
        # the stacked (scan) layout holds [L, ...] leaves; LoftQ's per-
        # weight SVD needs the list layout — unstack, apply, restack
        # (mirrors the loader's DoRA stacked branch)
        if "layers_stacked" in params:
            raise ValueError(
                "LoftQ requires the per-layer list layout; apply "
                "loftq_config in get_peft_model BEFORE stack_params "
                "(or unstack, apply, and restack)")
        raise ValueError("params/lora trees have no 'layers' entry")
    new_layers = []
    for layer_p, layer_l in zip(params["layers"], lora["layers"]):
        new_layer = dict(layer_p)
        for name, lw in layer_l.items():
            if not isinstance(lw, LoRAWeights):
                continue
            w = layer_p.get(name)
            if isinstance(w, NF4Tensor) or hasattr(w, "packed"):
                raise ValueError(
                    "LoftQ needs the dense weights: load with "
                    "load_in_4bit=False and pass loftq_config to "
                    "get_peft_model (the base is quantized here)")
            if w is None or getattr(w, "ndim", 0) != 2:
                continue
            q, a, b = _loftq_factorize(w, r, lw.scale, n_iter,
                                       block_size=block_size)
            new_layer[name] = q
            layer_l[name] = LoRAWeights(a=a.astype(lw.a.dtype),
                                        b=b.astype(lw.b.dtype),
                                        scale=lw.scale)
        new_layers.append(new_layer)
    params = dict(params, layers=new_layers)
    return params, lora
