"""gemma-3n text decoder — AltUp multi-stream hiddens, Laurel, per-layer
embeddings, activation sparsity, v-norm.

Parity target: HF Gemma3nForCausalLM (the reference reaches gemma-3n via
FastModel's auto-compile path — reference: models/loader.py:820-897
dispatch + unsloth_zoo compiler; gemma-3n notebooks are a headline config,
reference README.md:187 "Gemma 4 E2B").

TPU-native design: the whole stack is a pure function over an HF-shaped
pytree. The AltUp state is a single stacked [N, B, T, D] array (N=4
streams) so every predict/correct mixing step is one einsum on the MXU;
per-layer embeddings are gathered once as [B, T, L, P] and sliced per
layer. KV sharing note: HF's no-cache forward computes every layer's own
K/V (sharing only activates with a cache); we mirror the no-cache
semantics everywhere, which keeps training == decode.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import attention
from ..ops.rms_norm import rms_norm
from ..ops.rope import apply_rope_qk


def _rms(x, w, eps):
    return rms_norm(x, w, eps, False)


def _rms_noscale(x, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _gelu_tanh(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(
        x.dtype)


def _clip(w, c):
    return jnp.clip(w, -c, c) if c is not None else w


def _router(x, layer_p, cfg):
    """tanh modality router over the normed active stream -> [B, T, N]."""
    eps = cfg.rms_norm_eps
    r_in = _rms(x, layer_p["altup_router_norm"], eps) \
        * (cfg.hidden_size ** -1.0)
    routed = jnp.dot(r_in, layer_p["altup_router"].T.astype(r_in.dtype))
    return jnp.tanh(routed.astype(jnp.float32)).astype(x.dtype)


def _altup_predict(h, layer_p, cfg):
    """h [N, B, T, D] -> predictions [N, B, T, D]
    (HF Gemma3nTextAltUp.predict)."""
    a = cfg.altup
    mod = _router(h[a.active_idx], layer_p, cfg)          # [B, T, N]
    w = _clip(layer_p["altup_pred_coefs"], a.coef_clip)   # [N*N, N]
    coefs = jnp.dot(mod, w.T.astype(mod.dtype)).reshape(
        *mod.shape[:-1], a.num_inputs, a.num_inputs)      # [B, T, n, m]
    # HF: predictions[n] = sum_m h[m] * coefs_raw[..., n, m] + h[n]
    return jnp.einsum("mbtd,btnm->nbtd", h, coefs) + h


def _altup_correct(predictions, activated, layer_p, cfg):
    """(HF Gemma3nTextAltUp.correct): corrected[i] = pred[i] +
    innovation * (coefs[..., i] + 1)."""
    a = cfg.altup
    mod = _router(activated, layer_p, cfg)                # [B, T, N]
    w = _clip(layer_p["altup_corr_coefs"], a.coef_clip)   # [N, N]
    coefs = jnp.dot(mod, w.T.astype(mod.dtype)) + 1.0     # [B, T, N]
    innovation = activated - predictions[a.active_idx]
    return predictions + innovation[None] \
        * jnp.moveaxis(coefs, -1, 0)[:, :, :, None]


def _magnitude_match(y, target_mag, eps=1e-5):
    """Rescale y so its per-token rms magnitude matches target_mag
    (HF Gemma3nTextModel altup (un)embed projections)."""
    yf = y.astype(jnp.float32)
    mag = jnp.sqrt(jnp.maximum(jnp.mean(yf * yf, axis=-1, keepdims=True),
                               eps))
    return (yf * target_mag / mag).astype(y.dtype)


def _target_mag(x):
    xf = x.astype(jnp.float32)
    return jnp.sqrt(jnp.mean(xf * xf, axis=-1, keepdims=True))


def _gaussian_topk(x, sparsity):
    """Zero all but the top (1-sparsity) activations per row, approximated
    by a gaussian cutoff (HF Gemma3nTextMLP._gaussian_topk; std is the
    biased/population estimate)."""
    from jax.scipy.stats import norm

    xf = x.astype(jnp.float32)
    std_mult = norm.ppf(jnp.float32(sparsity))
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    std = jnp.std(xf, axis=-1, keepdims=True)
    cutoff = mean + std * std_mult
    return jax.nn.relu(xf - cutoff).astype(x.dtype)


def _layer(h, per_layer_input, layer_p, lora_p, cfg, layer_idx,
           cos, sin, cos_local, sin_local, segment_ids, positions):
    """One gemma-3n decoder layer over the stacked streams
    (HF Gemma3nTextDecoderLayer.forward). h [N, B, T, D]."""
    from .decoder import _proj

    a = cfg.altup
    eps = cfg.rms_norm_eps
    predictions = _altup_predict(h, layer_p, cfg)
    active = predictions[a.active_idx]
    a_norm = _rms(active, layer_p["input_norm"], eps)

    # Laurel: low-rank residual on the normed input
    lr = jnp.dot(a_norm, layer_p["laurel_left"].T.astype(a_norm.dtype))
    lr = jnp.dot(lr, layer_p["laurel_right"].T.astype(a_norm.dtype))
    laurel = a_norm + _rms(lr, layer_p["laurel_norm"], eps)

    # Attention: q/k norms before rope, v-norm (no scale), scale 1.0
    b, t, _ = a_norm.shape
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = _proj(a_norm, layer_p, lora_p, "q").reshape(b, t, hq, dh)
    k = _proj(a_norm, layer_p, lora_p, "k").reshape(b, t, hkv, dh)
    v = _proj(a_norm, layer_p, lora_p, "v").reshape(b, t, hkv, dh)
    q = rms_norm(q, layer_p["q_norm"], eps, False)
    k = rms_norm(k, layer_p["k_norm"], eps, False)
    v = _rms_noscale(v, eps)
    kind = cfg.layer_kind(layer_idx)
    if kind == "sliding" and cos_local is not None:
        q, k = apply_rope_qk(q, k, cos_local, sin_local)
    else:
        q, k = apply_rope_qk(q, k, cos, sin)
    window = cfg.sliding_window if kind == "sliding" else None
    attn = attention(q, k, v, causal=cfg.causal, segment_ids=segment_ids,
                     window=window, softcap=None,
                     scale=cfg.attn_logit_scale, positions=positions)
    attn = _proj(attn.reshape(b, t, hq * dh), layer_p, lora_p, "o")
    attn = _rms(attn, layer_p["post_attn_out_norm"], eps)

    attn_gated = active + attn
    attn_laurel = (attn_gated + laurel) * (2.0 ** -0.5)

    # MLP with optional gaussian-topk activation sparsity
    h2 = _rms(attn_laurel, layer_p["pre_ffw_norm"], eps)
    gate = _proj(h2, layer_p, lora_p, "gate")
    sparsity = a.activation_sparsity[layer_idx] \
        if layer_idx < len(a.activation_sparsity) else 0.0
    if sparsity > 0.0:
        gate = _gaussian_topk(gate, sparsity)
    up = _proj(h2, layer_p, lora_p, "up")
    mlp = _proj(_gelu_tanh(gate) * up, layer_p, lora_p, "down")
    mlp = _rms(mlp, layer_p["post_ffw_norm"], eps)
    activated = attn_laurel + mlp

    corrected = _altup_correct(predictions, activated, layer_p, cfg)
    first = corrected[a.active_idx]
    if a.correct_scale:
        first = (first.astype(jnp.float32)
                 * layer_p["altup_correct_scale"].astype(jnp.float32)
                 ).astype(first.dtype)

    # per-layer input injection into the non-active streams
    g = _gelu_tanh(jnp.dot(first,
                           layer_p["pli_gate"].T.astype(first.dtype)))
    g = g * per_layer_input
    proj = jnp.dot(g, layer_p["pli_proj"].T.astype(g.dtype))
    proj = _rms(proj, layer_p["pli_norm"], eps)
    return jnp.concatenate([corrected[:1], corrected[1:] + proj[None]],
                           axis=0)


def gemma3n_forward(
    params: Dict[str, Any],
    lora: Optional[Dict[str, Any]],
    input_ids: jnp.ndarray,
    cfg,
    *,
    positions: Optional[jnp.ndarray] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    remat: Any = True,
    remat_policy: Optional[Any] = None,
    **_ignored,
) -> jnp.ndarray:
    """Full gemma-3n text stack; returns final hidden [B, T, D]
    (HF Gemma3nTextModel.forward)."""
    from .decoder import _rope_tables

    a = cfg.altup
    b, t = input_ids.shape
    if positions is None:
        positions = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32)[None], (b, t))

    embed_w = (lora or {}).get("embed")
    if embed_w is None:
        embed_w = params["embed"]
    x0 = jnp.take(embed_w, input_ids, axis=0)
    if cfg.embed_scale is not None:
        x0 = x0 * jnp.asarray(cfg.embed_scale, dtype=x0.dtype)

    # per-layer inputs: scaled per-layer vocab embedding + projected
    # model embedding, averaged (HF get_per_layer_inputs +
    # project_per_layer_inputs)
    p = a.hidden_per_layer
    n_layers = cfg.num_layers
    pl_ids = jnp.where(input_ids < a.vocab_per_layer, input_ids, 0)
    pl_emb = jnp.take(params["embed_per_layer"], pl_ids, axis=0)
    pl_emb = pl_emb * jnp.asarray(float(p) ** 0.5, pl_emb.dtype)
    pl_emb = pl_emb.reshape(b, t, n_layers, p)
    pl_proj = jnp.dot(x0, params["per_layer_model_proj"].T.astype(x0.dtype))
    pl_proj = pl_proj * jnp.asarray(cfg.hidden_size ** -0.5, x0.dtype)
    pl_proj = pl_proj.reshape(b, t, n_layers, p)
    pl_proj = _rms(pl_proj, params["per_layer_proj_norm"],
                   cfg.rms_norm_eps)
    per_layer_inputs = (pl_proj + pl_emb) \
        * jnp.asarray(2.0 ** -0.5, x0.dtype)

    cos, sin, cos_local, sin_local = _rope_tables(cfg, positions)

    # AltUp stream init: stream 0 is the embedding; streams 1..N-1 are
    # learned projections magnitude-matched to stream 0
    tm = _target_mag(x0)
    streams = [x0]
    for i in range(1, a.num_inputs):
        y = jnp.dot(x0, params[f"altup_proj_{i}"].T.astype(x0.dtype))
        streams.append(_magnitude_match(y, tm))
    h = jnp.stack(streams, axis=0)                  # [N, B, T, D]

    lora_layers = (lora or {}).get("layers")

    layer_fn = _layer
    if remat:
        layer_fn = jax.checkpoint(_layer, policy=remat_policy,
                                  static_argnums=(4, 5))
    for i, layer_p in enumerate(params["layers"]):
        lora_p = lora_layers[i] if lora_layers else None
        h = layer_fn(h, per_layer_inputs[:, :, i, :], layer_p, lora_p,
                     cfg, i, cos, sin, cos_local, sin_local, segment_ids,
                     positions)

    # unembed: magnitude-matched mean over streams, then final norm
    tm = _target_mag(h[0])
    outs = [h[0]]
    for i in range(1, a.num_inputs):
        y = jnp.dot(h[i], params[f"altup_unembed_{i}"].T.astype(h.dtype))
        outs.append(_magnitude_match(y, tm))
    x = jnp.mean(jnp.stack(outs, axis=0), axis=0)
    return _rms(x, params["final_norm"], cfg.rms_norm_eps)
