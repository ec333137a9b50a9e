"""Decoder-only transformer — the functional archetype.

This one forward covers the architectures the reference implements as
separate hand-patched files (reference: unsloth/models/llama.py:665-1509 is
the archetype; mistral.py / qwen2.py / qwen3.py / gemma.py / gemma2.py are
deltas). Architectural differences are ModelConfig knobs (see config.py).

Design:
  * Pure functions over parameter pytrees — no module classes, no patching.
    `params` holds the (possibly NF4-quantized, frozen) base weights;
    `lora` is a parallel tree of LoRAWeights/None holding the trainables.
  * Layers are a Python list of per-layer dicts. The training step wraps
    each layer in `jax.checkpoint` (gradient checkpointing; the TPU-native
    replacement for the reference's offloaded GC — reference _utils.py:356-382)
    with a configurable rematerialization policy.
  * Packing is expressed with segment ids flowing into the attention op
    (replaces varlen cu_seqlens; reference utils/packing.py).
  * The loss path never materializes logits: `loss_fn` calls the fused
    linear+CE (reference models/llama.py:1454-1509 fused-CE gate).

Parameter tree schema (HF-checkpoint-shaped, [out, in] weights):

  params = {
    "embed": [V, D],
    "layers": [ {
        "input_norm": [D], "post_attn_norm": [D],
        # gemma2/3 sandwich norms (use_post_norms):
        "pre_ffw_norm": [D], "post_ffw_norm": [D], "post_attn_out_norm": [D],
        "q": W|NF4, "k": ..., "v": ..., "o": ...,
        "q_bias": [Hq*Dh]?, "k_bias": ..., "v_bias": ..., "o_bias": ...,
        "q_norm": [Dh]?, "k_norm": [Dh]?,              # qwen3/gemma3
        "gate": W|NF4, "up": W|NF4, "down": W|NF4,     # dense MLP
        # MoE layers instead of gate/up/down:
        "router": [E, D], "router_bias": [E]?,
        "experts": {"gate": [E,F,D], "up": [E,F,D], "down": [E,D,F]},
    }, ... ],
    "final_norm": [D],
    "lm_head": [V, D] | None,   # None => tied to embed
  }
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..ops.activations import glu_for
from ..ops.attention import attention
from ..ops.cross_entropy import fast_cross_entropy_loss
from ..ops.fused_ce_linear import fused_ce_loss_mean
from ..ops.lora import lora_matmul
from ..ops.rms_norm import layer_norm, rms_norm
from ..ops.rope import apply_rope_qk, rope_inv_freq, rope_table, yarn_attention_factor
from .config import ModelConfig


def _norm(x, w, cfg: ModelConfig, b=None):
    if cfg.norm_type == "layernorm":
        return layer_norm(x, w, b, cfg.rms_norm_eps)
    if cfg.norm_type == "layernorm1p":
        # nemotron LayerNorm1P: (1 + w) scale
        return layer_norm(x, w + 1.0, b, cfg.rms_norm_eps)
    return rms_norm(x, w, cfg.rms_norm_eps, cfg.gemma_norm)


def _normp(x, p, name: str, cfg: ModelConfig):
    """_norm reading weight (+ optional bias) from a param dict."""
    return _norm(x, p[name], cfg, p.get(name + "_bias"))


def _l2_norm(x, eps: float = 1e-6):
    """Weightless L2 (rms) norm over the head dim (llama4 qk norm)."""
    xf = x.astype(jnp.float32)
    out = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True)
                             + eps)
    return out.astype(x.dtype)


# Importance-matrix collection hook (export/imatrix.py): when set, eager
# forward passes record per-input-channel activation statistics for every
# linear. Inactive (None) on every training/jit path.
_IMATRIX_TAP = None


def _proj(x, layer_p, lora_p, name):
    if _IMATRIX_TAP is not None and not isinstance(x, jax.core.Tracer):
        _IMATRIX_TAP.record(name, x)
    lora = lora_p.get(name) if lora_p else None
    bias = layer_p.get(f"{name}_bias")
    return lora_matmul(x, layer_p[name], lora=lora, bias=bias)


def _mla_attention_block(x, layer_p, lora_p, cfg: ModelConfig, layer_idx,
                         cos, sin, segment_ids, positions):
    """DeepSeek-V3 multi-head latent attention (HF DeepseekV3Attention
    semantics): low-rank q (q_a -> rmsnorm -> q_b), compressed kv with one
    SHARED rope head, nope/rope split, v_head_dim != qk_head_dim."""
    m = cfg.mla
    b, t, d = x.shape
    h = cfg.num_heads
    nope, rope = m.qk_nope_head_dim, m.qk_rope_head_dim
    qk_dim = m.qk_head_dim

    if "q_a" in layer_p:
        qa = _proj(x, layer_p, lora_p, "q_a")
        qa = rms_norm(qa, layer_p["q_a_norm"], cfg.rms_norm_eps, False)
        q = _proj(qa, layer_p, lora_p, "q_b")
    else:
        q = _proj(x, layer_p, lora_p, "q")
    q = q.reshape(b, t, h, qk_dim)
    q_pass, q_rot = q[..., :nope], q[..., nope:]

    ckv = _proj(x, layer_p, lora_p, "kv_a")        # [b,t, kv_lora + rope]
    k_c, k_rot = ckv[..., :m.kv_lora_rank], ckv[..., m.kv_lora_rank:]
    kv = rms_norm(k_c, layer_p["kv_a_norm"], cfg.rms_norm_eps, False)
    kv = _proj(kv, layer_p, lora_p, "kv_b").reshape(
        b, t, h, nope + m.v_head_dim)
    k_pass, v = kv[..., :nope], kv[..., nope:]
    k_rot = k_rot.reshape(b, t, 1, rope)           # shared across heads

    if cfg.rope_interleaved:
        # interleaved rope == half rope on even/odd-permuted channels
        # (score-invariant permutation, see the main attention block)
        q_rot = jnp.concatenate([q_rot[..., 0::2], q_rot[..., 1::2]], -1)
        k_rot = jnp.concatenate([k_rot[..., 0::2], k_rot[..., 1::2]], -1)
    q_rot, k_rot = apply_rope_qk(q_rot, k_rot, cos, sin)
    k_rot = jnp.broadcast_to(k_rot, (b, t, h, rope))

    q = jnp.concatenate([q_pass, q_rot], axis=-1)
    k = jnp.concatenate([k_pass, k_rot], axis=-1)
    # v_head_dim < qk_head_dim: pad v for the fused kernels, slice after
    pad = qk_dim - m.v_head_dim
    v_p = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad))) if pad else v
    out = attention(
        q, k, v_p, causal=cfg.causal, segment_ids=segment_ids,
        scale=cfg.attn_logit_scale, positions=positions)
    if pad:
        out = out[..., :m.v_head_dim]
    out = out.reshape(b, t, h * m.v_head_dim)
    return _proj(out, layer_p, lora_p, "o")


def attention_block(
    x, layer_p, lora_p, cfg: ModelConfig, layer_idx: int,
    cos, sin, cos_local, sin_local,
    segment_ids, positions, image_spans=None,
):
    if cfg.mla is not None:
        return _mla_attention_block(x, layer_p, lora_p, cfg, layer_idx,
                                    cos, sin, segment_ids, positions)
    b, t, d = x.shape
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    q = _proj(x, layer_p, lora_p, "q")
    k = _proj(x, layer_p, lora_p, "k")
    v = _proj(x, layer_p, lora_p, "v")
    if cfg.qk_norm == "full":  # olmo2: rms over the full projection width
        q = rms_norm(q, layer_p["q_norm"], cfg.rms_norm_eps, False)
        k = rms_norm(k, layer_p["k_norm"], cfg.rms_norm_eps, False)
    out_gate = None
    if cfg.gated_attention:
        # qwen3-next: q_proj emits [q | gate] per head; the gate sigmoids
        # the attention output before o_proj
        qg = q.reshape(b, t, hq, 2 * dh)
        q, out_gate = qg[..., :dh], qg[..., dh:].reshape(b, t, hq * dh)
    else:
        q = q.reshape(b, t, hq, dh)
    k = k.reshape(b, t, hkv, dh)
    v = v.reshape(b, t, hkv, dh)

    if cfg.hybrid_mamba and cfg.mamba.key_multiplier != 1.0:
        k = k * cfg.mamba.key_multiplier  # falcon-h1 muP key scale

    if cfg.qk_norm is True:  # qwen3/gemma3: weighted rms-norm before rope
        q = rms_norm(q, layer_p["q_norm"], cfg.rms_norm_eps, cfg.gemma_norm)
        k = rms_norm(k, layer_p["k_norm"], cfg.rms_norm_eps, cfg.gemma_norm)

    kind = cfg.layer_kind(layer_idx)
    uses_rope = cfg.layer_uses_rope(layer_idx)
    if uses_rope:
        if cfg.rope_interleaved:
            # interleaved (complex-pair) rope == half-split rope on
            # even/odd-permuted channels; attention scores are invariant
            # to the fixed channel permutation, so no inverse is needed
            # (llama4 apply_rotary_emb semantics).
            q = jnp.concatenate([q[..., 0::2], q[..., 1::2]], axis=-1)
            k = jnp.concatenate([k[..., 0::2], k[..., 1::2]], axis=-1)
        if kind == "sliding" and cos_local is not None:
            q, k = apply_rope_qk(q, k, cos_local, sin_local)
        else:
            q, k = apply_rope_qk(q, k, cos, sin)
        if cfg.qk_norm == "l2":  # llama4: weightless L2 norm after rope
            q = _l2_norm(q, cfg.rms_norm_eps)
            k = _l2_norm(k, cfg.rms_norm_eps)
        elif cfg.qk_norm == "post_rope":  # hunyuan: weighted rms after rope
            q = rms_norm(q, layer_p["q_norm"], cfg.rms_norm_eps, False)
            k = rms_norm(k, layer_p["k_norm"], cfg.rms_norm_eps, False)
    elif cfg.attn_temperature_tuning:
        # llama4 NoPE layers: q scaled by a log-floor temperature of the
        # absolute position (HF Llama4TextAttention.forward).
        pos = positions if positions is not None else \
            jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        scales = jnp.log1p(jnp.floor(
            (pos.astype(jnp.float32) + 1.0) / cfg.floor_scale)) \
            * cfg.attn_scale + 1.0
        q = (q.astype(jnp.float32) * scales[..., None, None]).astype(
            q.dtype)

    window = cfg.sliding_window if kind == "sliding" else None
    attn_segments = segment_ids
    if kind == "chunked" and cfg.attention_chunk_size:
        # chunked local attention (llama4): tokens attend within their
        # position chunk — expressed exactly as extra segment structure,
        # so every packed/flash/ring path handles it for free.
        pos = positions if positions is not None else \
            jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        chunk_id = pos // cfg.attention_chunk_size
        n_chunks = t // cfg.attention_chunk_size + 2
        base = segment_ids if segment_ids is not None else \
            jnp.ones((b, t), jnp.int32)
        attn_segments = base * n_chunks + chunk_id

    from jax.ad_checkpoint import checkpoint_name

    # remat-policy tags: identity ops unless a save/offload policy names
    # them (see resolve_remat_policy). Saving q/k/v skips the qkv-proj +
    # rope recompute in backward; saving attn_out skips the flash-forward
    # recompute entirely (the flash bwd kernel needs only q,k,v,out,lse).
    q = checkpoint_name(q, "q_rope")
    k = checkpoint_name(k, "k_rope")
    v = checkpoint_name(v, "v_proj")
    out = attention(
        q, k, v,
        causal=cfg.causal,
        segment_ids=attn_segments,
        window=window,
        softcap=cfg.attn_softcap,
        scale=cfg.attn_logit_scale,
        positions=positions,
        image_spans=image_spans,
        sinks=layer_p.get("sinks"),
    )
    out = checkpoint_name(out, "attn_out")
    out = out.reshape(b, t, hq * dh)
    if out_gate is not None:
        out = out * jax.nn.sigmoid(out_gate.astype(jnp.float32)).astype(
            out.dtype)
    return _proj(out, layer_p, lora_p, "o")


def _gdn_block(x, layer_p, cfg: ModelConfig, state=None, pad_mask=None,
               return_state: bool = False):
    """Qwen3-Next gated DeltaNet mixer (HF Qwen3NextGatedDeltaNet
    semantics): fused qkvz/ba projections with megatron-style head-group
    ordering, causal conv over [q|k|v], chunked gated delta rule, gated
    rms-norm with z, out projection.

    state = (conv_window [B, K-1, 2*key_dim + nv*dv] of PRE-conv inputs,
    delta_state [B, nv, dk, dv]); with return_state the updated pair is
    also returned (prefill: chunked rule with initial_state; decode
    t == 1: the O(1) recurrence — HF torch_recurrent_gated_delta_rule)."""
    from ..ops.delta_net import (chunk_gated_delta_rule,
                                 recurrent_gated_delta_rule)
    from ..ops.ssm import causal_conv1d

    g = cfg.gdn
    b, t, d = x.shape
    nk, nv = g.num_k_heads, g.num_v_heads
    dk, dv = g.k_head_dim, g.v_head_dim
    r = nv // nk

    qkvz = jnp.dot(x, layer_p["gdn_qkvz"].T.astype(x.dtype))
    ba = jnp.dot(x, layer_p["gdn_ba"].T.astype(x.dtype))
    qkvz = qkvz.reshape(b, t, nk, 2 * dk + 2 * r * dv)
    q = qkvz[..., :dk]
    k = qkvz[..., dk:2 * dk]
    v = qkvz[..., 2 * dk:2 * dk + r * dv].reshape(b, t, nv, dv)
    z = qkvz[..., 2 * dk + r * dv:].reshape(b, t, nv, dv)
    ba = ba.reshape(b, t, nk, 2 * r)
    b_ = ba[..., :r].reshape(b, t, nv)
    a = ba[..., r:].reshape(b, t, nv)

    mixed = jnp.concatenate(
        [q.reshape(b, t, -1), k.reshape(b, t, -1), v.reshape(b, t, -1)],
        axis=-1)
    if pad_mask is not None:
        mixed = mixed * pad_mask[..., None].astype(mixed.dtype)
    new_conv = None
    delta_state = None
    if state is not None:
        conv_win, delta_state = state
        conv_in = jnp.concatenate(
            [conv_win.astype(jnp.float32), mixed.astype(jnp.float32)], 1)
        conv_out = causal_conv1d(
            conv_in, layer_p["gdn_conv_w"].astype(jnp.float32),
            layer_p.get("gdn_conv_b"))[:, -t:]
        new_conv = conv_in[:, -(conv_win.shape[1]):]
        mixed = jax.nn.silu(conv_out).astype(x.dtype)
    else:
        mixed = jax.nn.silu(causal_conv1d(
            mixed.astype(jnp.float32),
            layer_p["gdn_conv_w"].astype(jnp.float32),
            layer_p.get("gdn_conv_b"))).astype(x.dtype)
    kd = g.key_dim
    q = mixed[..., :kd].reshape(b, t, nk, dk)
    k = mixed[..., kd:2 * kd].reshape(b, t, nk, dk)
    v = mixed[..., 2 * kd:].reshape(b, t, nv, dv)

    beta = jax.nn.sigmoid(b_.astype(jnp.float32))
    gdecay = -jnp.exp(layer_p["gdn_A_log"].astype(jnp.float32)) \
        * jax.nn.softplus(a.astype(jnp.float32)
                          + layer_p["gdn_dt_bias"].astype(jnp.float32))
    if pad_mask is not None:
        pm = pad_mask.astype(jnp.float32)
        beta = beta * pm[..., None]        # pads write nothing
        gdecay = gdecay * pm[..., None]    # and decay nothing
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)
    if state is not None and t == 1:
        out, final_state = recurrent_gated_delta_rule(
            q, k, v, gdecay, beta, delta_state)
    else:
        out, final_state = chunk_gated_delta_rule(
            q, k, v, gdecay, beta, chunk_size=g.chunk_size,
            initial_state=delta_state)
    # gated rms-norm (norm BEFORE gate), per v-head
    of = out.astype(jnp.float32)
    of = of * jax.lax.rsqrt(jnp.mean(of * of, -1, keepdims=True)
                            + cfg.rms_norm_eps)
    of = of * layer_p["gdn_norm"].astype(jnp.float32)
    of = of * jax.nn.silu(z.astype(jnp.float32))
    out = of.reshape(b, t, nv * dv).astype(x.dtype)
    y = jnp.dot(out, layer_p["gdn_out"].T.astype(x.dtype))
    if return_state:
        return y, (new_conv, final_state)
    return y


def mlp_block(x, layer_p, lora_p, cfg: ModelConfig, layer_idx: int):
    if cfg.layer_is_moe(layer_idx) and "experts" in layer_p:
        from jax.ad_checkpoint import checkpoint_name

        # remat-policy tag: `save_moe_out` keeps this [B,T,D] in HBM so
        # backward skips re-decoding + re-running ALL experts for the
        # remat forward — at seq 1024 the in-kernel NF4 decode of every
        # expert's weights is the per-layer fixed cost the moe_profile
        # measured (scripts/moe_profile.py), and this removes one of its
        # three per-step passes for ~6 MB/layer of residency.
        out = checkpoint_name(moe_block(x, layer_p, cfg), "moe_out")
        if cfg.moe_shared_expert and "gate" in layer_p:
            # the shared expert always runs, added to the routed output
            # (llama4/deepseek: plain add; qwen3-next: scaled by
            # sigmoid(x @ shared_expert_gate))
            glu = glu_for(cfg.hidden_act)
            e = _proj(x, layer_p, lora_p, "gate")
            g = _proj(x, layer_p, lora_p, "up")
            shared = _proj(glu(e, g), layer_p, lora_p, "down")
            if cfg.moe_shared_gate and "shared_gate" in layer_p:
                sg = jnp.dot(x, layer_p["shared_gate"].T.astype(x.dtype))
                shared = shared * jax.nn.sigmoid(
                    sg.astype(jnp.float32)).astype(shared.dtype)
            out = out + shared
        return out

    def dense_mlp(xc):
        if not cfg.mlp_gated:
            if cfg.hidden_act == "xielu":
                # apertus (HF XIELUActivation._xielu_python): learnable
                # alpha_p/alpha_n scalars per MLP; beta=0.5, eps=-1e-6
                u = _proj(xc, layer_p, lora_p, "up").astype(jnp.float32)
                ap = jax.nn.softplus(
                    layer_p["act_alpha_p"].astype(jnp.float32))
                an = 0.5 + jax.nn.softplus(
                    layer_p["act_alpha_n"].astype(jnp.float32))
                act = jnp.where(
                    u > 0,
                    ap * u * u + 0.5 * u,
                    (jnp.expm1(jnp.minimum(u, -1e-6)) - u) * an + 0.5 * u)
                return _proj(act.astype(xc.dtype), layer_p, lora_p,
                             "down")
            # starcoder2/nemotron: act(up) -> down, no gate projection
            from ..ops.activations import act_for

            act = act_for(cfg.hidden_act)
            return _proj(act(_proj(xc, layer_p, lora_p, "up")),
                         layer_p, lora_p, "down")
        glu = glu_for(cfg.hidden_act)
        e = _proj(xc, layer_p, lora_p, "gate")
        g = _proj(xc, layer_p, lora_p, "up")
        if cfg.hybrid_mamba:  # falcon-h1 muP: act(gate*gm), down*dm
            gm, dm = cfg.mamba.mlp_multipliers
            return _proj(glu(e * gm, g), layer_p, lora_p, "down") * dm
        from jax.ad_checkpoint import checkpoint_name

        # remat-policy tag: saving the [tokens, F] glu output skips the
        # gate/up matmul recompute in backward (~2/3 of MLP forward FLOPs)
        return _proj(checkpoint_name(glu(e, g), "swiglu_out"),
                     layer_p, lora_p, "down")

    # Tiled MLP: chunk the token dim so the [tokens, F] intermediates
    # (F is ~3.5x D) never materialize for the full sequence — the
    # long-context memory lever (reference: zoo tiled_mlp via
    # UNSLOTH_TILED_MLP, loader.py:74,1096-1102). Each chunk is
    # checkpointed so backward residuals stay [tokens, D].
    tile = _tiled_mlp_chunk()
    b, t, d = x.shape
    if tile and b * t > tile and (b * t) % tile == 0:
        xf = x.reshape(-1, tile, d)
        out = jax.lax.map(jax.checkpoint(dense_mlp), xf)
        return out.reshape(b, t, d)
    return dense_mlp(x)


def _tiled_mlp_chunk() -> int:
    """Parse UNSLOTH_TILED_MLP: unset/0 = off, '1'/truthy = 4096 tokens,
    'chunk:N' = N tokens."""
    import os

    raw = os.environ.get("UNSLOTH_TILED_MLP", "")
    if not raw or raw.lower() in ("0", "false", "off"):
        return 0
    if raw.startswith("chunk:"):
        return int(raw.split(":", 1)[1])
    return 4096


def moe_block(x, layer_p, cfg: ModelConfig):
    """Token-choice top-k MoE. Routing here; the expert math dispatches to
    the grouped-GEMM (Megablox) or dense implementation (ops/moe.py —
    replaces the reference's Triton grouped-GEMM suite, kernels/moe/)."""
    from ..ops.moe import moe_mlp

    b, t, d = x.shape
    xf = x.reshape(-1, d)
    router_logits = jnp.dot(xf.astype(jnp.float32),
                            layer_p["router"].T.astype(jnp.float32))
    if layer_p.get("router_bias") is not None:
        router_logits = router_logits + layer_p["router_bias"].astype(
            jnp.float32)
    routing_params = None
    if cfg.moe_routing == "deepseek":
        routing_params = {
            "correction_bias":
                layer_p["router_correction"].astype(jnp.float32),
            "n_group": cfg.moe_n_group,
            "topk_group": cfg.moe_topk_group,
            "routed_scaling": cfg.moe_routed_scaling,
        }
    out = moe_mlp(xf, router_logits, layer_p["experts"],
                  cfg.num_experts_per_tok, cfg.moe_act or cfg.hidden_act,
                  cfg.norm_topk_prob, routing=cfg.moe_routing,
                  routing_params=routing_params)
    return out.reshape(b, t, d)


def mamba_call_kwargs(layer_p, cfg: ModelConfig):
    """Assemble the (params dict, keyword args) both the training mixer
    and the cached decode step share (reference: models/falcon_h1.py)."""
    import numpy as np

    mc = cfg.mamba
    p = {
        "in_proj": layer_p["mamba_in_proj"],
        "conv_w": layer_p["mamba_conv_w"],
        "conv_b": layer_p.get("mamba_conv_b"),
        "dt_bias": layer_p["mamba_dt_bias"],
        "A_log": layer_p["mamba_A_log"],
        "D": layer_p["mamba_D"],
        "out_proj": layer_p["mamba_out_proj"],
    }
    # muP vector over the [z, x, B, C, dt] projection sections
    gn = mc.n_groups * mc.d_state
    mup = np.ones(2 * mc.d_ssm + 2 * gn + mc.n_heads, np.float32)
    z, xm, bm, cm, dtm = mc.ssm_multipliers
    mup[:mc.d_ssm] *= z
    mup[mc.d_ssm:2 * mc.d_ssm] *= xm
    mup[2 * mc.d_ssm:2 * mc.d_ssm + gn] *= bm
    mup[2 * mc.d_ssm + gn:2 * mc.d_ssm + 2 * gn] *= cm
    mup[2 * mc.d_ssm + 2 * gn:] *= dtm
    kwargs = dict(
        d_ssm=mc.d_ssm, n_heads=mc.n_heads, head_dim=mc.head_dim,
        n_groups=mc.n_groups, d_state=mc.d_state,
        time_step_limit=(mc.time_step_min, mc.time_step_max),
        ssm_in_multiplier=mc.ssm_in_multiplier,
        mup_vector=jnp.asarray(mup),
        rms_norm_weight=layer_p.get("mamba_norm") if mc.rms_norm else None,
        rms_norm_eps=cfg.rms_norm_eps,
    )
    return p, kwargs


def _mamba_block(x, layer_p, cfg: ModelConfig, segment_ids):
    """falcon-h1 parallel SSD mixer (reference: models/falcon_h1.py;
    semantics: HF FalconH1Mixer.torch_forward)."""
    from ..ops.ssm import mamba2_mixer

    p, kwargs = mamba_call_kwargs(layer_p, cfg)
    pad_mask = None
    if segment_ids is not None:
        pad_mask = (segment_ids != 0).astype(jnp.float32)
    return mamba2_mixer(
        x, p, chunk_size=cfg.mamba.chunk_size, padding_mask=pad_mask,
        **kwargs)


def _short_conv_block(x, layer_p, cfg: ModelConfig, segment_ids):
    """LFM2 gated short-conv mixer (HF Lfm2ShortConv): in_proj emits
    [B | C | x], a depthwise causal conv over B*x, gated by C, out_proj.
    Padded tokens are zeroed before the conv (apply_mask_to_padding)."""
    from ..ops.ssm import causal_conv1d

    if segment_ids is not None:
        x = x * (segment_ids != 0).astype(x.dtype)[..., None]
    d = x.shape[-1]
    bcx = x @ layer_p["conv_in"].T.astype(x.dtype)
    if "conv_in_bias" in layer_p:
        bcx = bcx + layer_p["conv_in_bias"].astype(bcx.dtype)
    bm, cm, xm = bcx[..., :d], bcx[..., d:2 * d], bcx[..., 2 * d:]
    conv = causal_conv1d((bm * xm).astype(jnp.float32),
                         layer_p["conv_w"].astype(jnp.float32),
                         layer_p.get("conv_b"))
    y = (cm.astype(jnp.float32) * conv).astype(x.dtype)
    out = y @ layer_p["conv_out"].T.astype(x.dtype)
    if "conv_out_bias" in layer_p:
        out = out + layer_p["conv_out_bias"].astype(out.dtype)
    return out


def _lightning_block(x, layer_p, cfg: ModelConfig, layer_idx: int,
                     segment_ids):
    """MiniMax lightning attention (HF MiniMaxLightningAttention): silu
    feature map on a fused qkv, chunked decayed linear attention, head
    rms-norm, sigmoid output gate, out projection."""
    from ..ops.lightning_attention import (lightning_attention,
                                           lightning_slopes)

    b, t, _ = x.shape
    h, dh = cfg.num_heads, cfg.head_dim
    qkv = jax.nn.silu(
        (x @ layer_p["lightn_qkv"].T.astype(x.dtype)).astype(jnp.float32))
    qkv = qkv.reshape(b, t, h, 3 * dh)
    q, k, v = qkv[..., :dh], qkv[..., dh:2 * dh], qkv[..., 2 * dh:]
    if segment_ids is not None:
        v = v * (segment_ids != 0).astype(v.dtype)[..., None, None]
    slopes = lightning_slopes(h, layer_idx, cfg.num_layers)
    out = lightning_attention(q, k, v, slopes,
                              block_size=cfg.lightning.block_size)
    out = out.reshape(b, t, h * dh)
    # HF's MiniMaxLightningAttention.norm uses MiniMaxRMSNorm's DEFAULT
    # eps (1e-6), not config.rms_norm_eps — and the decayed core outputs
    # can have ~1e-5 variance, so the eps is numerically significant.
    out = rms_norm(out, layer_p["lightn_norm"], 1e-6, False)
    gate = jax.nn.sigmoid(
        (x @ layer_p["lightn_gate"].T.astype(x.dtype)).astype(jnp.float32))
    out = (out.astype(jnp.float32) * gate).astype(x.dtype)
    return out @ layer_p["lightn_out"].T.astype(x.dtype)


def decoder_layer(
    x, layer_p, lora_p, cfg: ModelConfig, layer_idx: int,
    cos, sin, cos_local, sin_local, segment_ids, positions,
    image_spans=None,
):
    if _IMATRIX_TAP is not None:
        _IMATRIX_TAP.layer = layer_idx
    if cfg.lightning is not None:
        # minimax: the residual stream is the NORMED hidden, re-weighted
        # by per-sublayer alpha/beta (HF MiniMaxDecoderLayer)
        lc = cfg.lightning
        h = _normp(x, layer_p, "input_norm", cfg)
        if cfg.layer_kind(layer_idx) == "linear":
            a = _lightning_block(h, layer_p, cfg, layer_idx, segment_ids)
            aa, bb = lc.linear_alpha, lc.linear_beta
        else:
            a = attention_block(h, layer_p, lora_p, cfg, layer_idx,
                                cos, sin, cos_local, sin_local,
                                segment_ids, positions, image_spans)
            aa, bb = lc.full_alpha, lc.full_beta
        x = h * aa + a * bb
        h2 = _normp(x, layer_p, "post_attn_norm", cfg)
        m = mlp_block(h2, layer_p, lora_p, cfg, layer_idx)
        return h2 * lc.mlp_alpha + m * lc.mlp_beta
    if cfg.parallel_residual:
        # cohere/cohere2: attn and MLP read the SAME normed input
        h = _normp(x, layer_p, "input_norm", cfg)
        attn = attention_block(h, layer_p, lora_p, cfg, layer_idx,
                               cos, sin, cos_local, sin_local,
                               segment_ids, positions, image_spans)
        mlp = mlp_block(h, layer_p, lora_p, cfg, layer_idx)
        return x + attn + mlp

    if cfg.post_norm_only:
        # olmo2: no pre-norms; sublayer outputs normed before the add
        attn = attention_block(x, layer_p, lora_p, cfg, layer_idx,
                               cos, sin, cos_local, sin_local,
                               segment_ids, positions, image_spans)
        x = x + _normp(attn, layer_p, "post_attn_norm", cfg)
        mlp = mlp_block(x, layer_p, lora_p, cfg, layer_idx)
        return x + _normp(mlp, layer_p, "post_ffw_norm", cfg)

    if cfg.hybrid_mamba:
        mc = cfg.mamba
        h = _normp(x, layer_p, "input_norm", cfg)
        mamba_out = _mamba_block(h, layer_p, cfg, segment_ids) \
            * mc.ssm_out_multiplier
        attn = attention_block(h * mc.attention_in_multiplier, layer_p,
                               lora_p, cfg, layer_idx, cos, sin,
                               cos_local, sin_local, segment_ids,
                               positions, image_spans) \
            * mc.attention_out_multiplier
        x = x + mamba_out + attn
        h = _normp(x, layer_p, "post_attn_norm", cfg)  # pre_ff_layernorm
        return x + mlp_block(h, layer_p, lora_p, cfg, layer_idx)

    h = _normp(x, layer_p, "input_norm", cfg)
    if cfg.layer_kind(layer_idx) == "linear":
        attn = _gdn_block(h, layer_p, cfg)
    elif cfg.layer_kind(layer_idx) == "conv":
        attn = _short_conv_block(h, layer_p, cfg, segment_ids)
    elif cfg.layer_kind(layer_idx) == "mamba":
        # bamba-style SERIAL hybrid: the SSD mixer replaces attention
        attn = _mamba_block(h, layer_p, cfg, segment_ids)
    else:
        attn = attention_block(h, layer_p, lora_p, cfg, layer_idx,
                               cos, sin, cos_local, sin_local,
                               segment_ids, positions, image_spans)
    if cfg.use_post_norms and "post_attn_out_norm" in layer_p:
        attn = _normp(attn, layer_p, "post_attn_out_norm", cfg)
    rm = cfg.residual_multiplier
    x = x + (attn * rm if rm is not None else attn)

    if cfg.use_post_norms and "pre_ffw_norm" in layer_p:
        h = _normp(x, layer_p, "pre_ffw_norm", cfg)
    else:
        h = _normp(x, layer_p, "post_attn_norm", cfg)
    mlp = mlp_block(h, layer_p, lora_p, cfg, layer_idx)
    if cfg.use_post_norms and "post_ffw_norm" in layer_p:
        mlp = _normp(mlp, layer_p, "post_ffw_norm", cfg)
    return x + (mlp * rm if rm is not None else mlp)


def _rope_tables(cfg: ModelConfig, positions, mrope_positions=None):
    # MLA (deepseek-v3): only the shared rope head rotates
    rotary_dim = (cfg.mla.qk_rope_head_dim if cfg.mla is not None
                  else int(cfg.head_dim * cfg.partial_rotary_factor))
    inv = rope_inv_freq(cfg.head_dim, cfg.rope_theta, cfg.rope_scaling,
                        rotary_dim=rotary_dim)
    attn_factor = yarn_attention_factor(cfg.rope_scaling)
    if cfg.mrope_section is not None and mrope_positions is not None:
        # M-RoPE (qwen2.5-vl): three position streams [B, 3, T]; rope
        # half-dim channels are split across streams by mrope_section.
        cos3, sin3 = rope_table(mrope_positions, inv)   # [B, 3, T, hd/2]
        if cfg.mrope_interleaved:
            # qwen3-vl: channels default to the T stream; H claims
            # offset-1 channels (step 3) up to 3*sec[1], W offset-2 up to
            # 3*sec[2] (HF Qwen3VLTextRotaryEmbedding
            # .apply_interleaved_mrope)
            import numpy as _np

            hd2 = cos3.shape[-1]
            stream = _np.zeros(hd2, _np.int32)
            sec = cfg.mrope_section
            stream[1:3 * sec[1]:3] = 1
            stream[2:3 * sec[2]:3] = 2
            sel = jax.nn.one_hot(jnp.asarray(stream), 3,
                                 dtype=cos3.dtype)       # [hd/2, 3]
            cos = jnp.einsum("bjtc,cj->btc", cos3, sel)
            sin = jnp.einsum("bjtc,cj->btc", sin3, sel)
        else:
            parts_c, parts_s = [], []
            off = 0
            for j, sz in enumerate(cfg.mrope_section):
                parts_c.append(cos3[:, j % 3, :, off:off + sz])
                parts_s.append(sin3[:, j % 3, :, off:off + sz])
                off += sz
            cos = jnp.concatenate(parts_c, axis=-1)      # [B, T, hd/2]
            sin = jnp.concatenate(parts_s, axis=-1)
    else:
        cos, sin = rope_table(positions, inv, attn_factor)
    cos_local = sin_local = None
    if cfg.rope_local_theta is not None:
        inv_l = rope_inv_freq(cfg.head_dim, cfg.rope_local_theta, None,
                              rotary_dim=int(cfg.head_dim * cfg.partial_rotary_factor))
        cos_local, sin_local = rope_table(positions, inv_l)
    return cos, sin, cos_local, sin_local


def forward(params, lora, input_ids, cfg: ModelConfig, **kw):
    """Decoder forward with trace-time NF4 dispatch resolution.

    Callers that reach forward() outside loss_fn (inference decode,
    GRPO logps, VLM losses) used to take the fused Pallas NF4 kernel
    unconditionally; at small token counts XLA's dequantize+dot is
    measurably faster (r4 decode: the fused training-tiled kernel at
    m=8 is ~4x slower than unfused). When no nf4_dispatch_mode context
    is active, resolve one here from the same HBM-budget reasoning as
    loss_fn (deterministic given avals+cfg, so remat's trace cache
    stays correct)."""
    from ..ops.qlora_matmul import current_nf4_mode, nf4_dispatch_mode

    if current_nf4_mode() is None:
        n_tokens = input_ids.shape[0] * input_ids.shape[1]
        mode = resolve_nf4_mode(params, cfg, n_tokens)
        if mode is not None:
            with nf4_dispatch_mode(mode):
                return _forward_impl(params, lora, input_ids, cfg, **kw)
    return _forward_impl(params, lora, input_ids, cfg, **kw)


def _forward_impl(
    params: Dict[str, Any],
    lora: Optional[Dict[str, Any]],
    input_ids: jnp.ndarray,               # [B, T] int32
    cfg: ModelConfig,
    *,
    positions: Optional[jnp.ndarray] = None,     # [B, T] int32
    segment_ids: Optional[jnp.ndarray] = None,   # [B, T] int32
    inputs_embeds: Optional[jnp.ndarray] = None,  # [B, T, D] (pre-scaled)
    image_spans: Optional[jnp.ndarray] = None,   # [B, T] int32, 0 = text
    mrope_positions: Optional[jnp.ndarray] = None,  # [B, 3, T] (qwen-vl)
    deepstack_embeds: Optional[jnp.ndarray] = None,  # [n, B, T, D]
    remat: Any = True,
    remat_policy: Optional[Any] = None,
) -> jnp.ndarray:
    """Run the decoder stack; returns final hidden states [B, T, D]
    (pre-lm_head — the reference's UNSLOTH_RETURN_HIDDEN_STATES shape,
    models/llama.py:1442-1451).

    remat:
      False      — no rematerialization
      True/"layer" — per-layer jax.checkpoint (standard GC)
      "offload"  — one checkpoint over the whole stack; only per-layer
        boundary activations survive, offloaded to pinned host memory.
        This is the TPU-native form of the reference's "unsloth" offloaded
        gradient checkpointing (zoo Unsloth_Offloaded_Gradient_Checkpointer,
        reference _utils.py:139-148,356-382: each layer's activation
        asynchronously swapped to CPU) — expressed as an XLA remat policy
        instead of hand-written D2H copies, so the compiler overlaps the
        transfers with compute.
    """
    remat_policy = resolve_remat_policy(remat_policy)
    if cfg.altup is not None:
        # gemma-3n: multi-stream AltUp stack lives in its own module
        from .gemma3n import gemma3n_forward

        return gemma3n_forward(params, lora, input_ids, cfg,
                               positions=positions,
                               segment_ids=segment_ids,
                               remat=remat, remat_policy=remat_policy)
    if cfg.zamba is not None:
        # zamba2: shared-transformer-over-mamba stack in its own module
        from .zamba2 import zamba2_forward

        return zamba2_forward(params, lora, input_ids, cfg,
                              positions=positions,
                              segment_ids=segment_ids,
                              remat=remat, remat_policy=remat_policy)
    b, t = input_ids.shape
    if positions is None:
        positions = jnp.broadcast_to(
            jnp.arange(t, dtype=jnp.int32)[None], (b, t))

    if inputs_embeds is not None:
        x = inputs_embeds
    else:
        # modules_to_save: a trainable embed lives in the lora tree and
        # shadows the frozen one (reference: get_peft_model modules_to_save).
        embed_w = (lora or {}).get("embed")
        if embed_w is None:
            embed_w = params["embed"]
        x = jnp.take(embed_w, input_ids, axis=0)
        if cfg.embed_scale is not None:
            # gemma scales by sqrt(D) computed in the embed dtype (HF parity)
            x = x * jnp.asarray(cfg.embed_scale, dtype=x.dtype)

    cos, sin, cos_local, sin_local = _rope_tables(cfg, positions,
                                                  mrope_positions)

    if "layers_stacked" in params:
        if deepstack_embeds is not None:
            raise ValueError("deepstack embeds require the list layout")
        x = _scan_layers(params, lora, x, cfg, cos, sin, segment_ids,
                         positions, image_spans, remat, remat_policy)
        return _normp(x, params, "final_norm", cfg)

    lora_layers = (lora or {}).get("layers")

    def run_stack(x, layer_fn):
        for i, layer_p in enumerate(params["layers"]):
            lora_p = lora_layers[i] if lora_layers else None
            x = layer_fn(x, layer_p, lora_p, cfg, i,
                         cos, sin, cos_local, sin_local, segment_ids,
                         positions, image_spans)
            if deepstack_embeds is not None \
                    and i < deepstack_embeds.shape[0]:
                # qwen3-vl DeepStack: merged visual features of early ViT
                # layers added at the visual positions after early text
                # layers (HF Qwen3VLTextModel._deepstack_process)
                x = x + deepstack_embeds[i].astype(x.dtype)
        return x

    if remat == "offload":
        from jax.ad_checkpoint import checkpoint_name

        def named_layer(x, *args):
            return checkpoint_name(decoder_layer(x, *args),
                                   "decoder_layer_output")

        policy = jax.checkpoint_policies.save_and_offload_only_these_names(
            names_which_can_be_saved=[],
            names_which_can_be_offloaded=["decoder_layer_output"],
            offload_src="device", offload_dst="pinned_host")
        stack = jax.checkpoint(
            lambda x: run_stack(x, named_layer), policy=policy)
        x = stack(x)
    elif remat:
        layer_fn = jax.checkpoint(
            decoder_layer,
            policy=remat_policy,
            static_argnums=(3, 4),
        )
        x = run_stack(x, layer_fn)
    else:
        x = run_stack(x, decoder_layer)

    return _normp(x, params, "final_norm", cfg)


def _scan_layers(params, lora, x, cfg, cos, sin, segment_ids, positions,
                 image_spans, remat, remat_policy=None):
    """lax.scan over stacked homogeneous layers: compile time is one
    layer's, not num_layers' (the TPU idiom for deep stacks — the reference
    has no analog because torch modules execute eagerly). Requires
    `stack_params` layout; heterogeneous stacks (sliding patterns, MoE
    mixtures) use the unrolled loop."""
    kinds = {cfg.layer_kind(i) for i in range(cfg.num_layers)}
    if len(kinds) > 1:
        raise ValueError(
            "scan layout requires a uniform layer kind; alternating "
            "sliding/global patterns must use the list layout")
    stacked = params["layers_stacked"]
    lora_stacked = (lora or {}).get("layers_stacked")
    has_lora = lora_stacked is not None
    if not has_lora:
        # scan xs must have a leading axis; zero-width placeholder
        lora_stacked = jnp.zeros((cfg.num_layers, 0), jnp.float32)

    def body(x, per_layer):
        layer_p, lora_p = per_layer
        y = decoder_layer(x, layer_p, lora_p if has_lora else None, cfg, 0,
                          cos, sin, None, None, segment_ids, positions,
                          image_spans)
        return y, None

    if remat:
        body = jax.checkpoint(body, policy=resolve_remat_policy(remat_policy))
    x, _ = jax.lax.scan(body, x, (stacked, lora_stacked))
    return x


#: named remat policies accepted wherever `remat_policy` flows
#: (forward / loss_fn / trainers / UNSLOTH_REMAT_POLICY):
#:   none             — full per-layer rematerialization (save nothing)
#:   save_attn        — keep attn outputs in HBM (skips the flash-forward
#:                      recompute; +[B,T,Hq,Dh] bf16 per layer)
#:   offload_attn     — same, but parked in pinned host memory (≈0 HBM)
#:   offload_qkv_attn — also offload post-rope q/k/v (skips qkv-proj +
#:                      rope recompute; flash bwd reads them back)
#:   offload_acts     — also offload the [tokens, F] swiglu output
#:                      (skips the gate/up matmul recompute — the largest
#:                      single recompute term — at the cost of host
#:                      bandwidth). TPU-native form of the reference's
#:                      offloaded gradient checkpointing
#:                      (reference unsloth/models/_utils.py:356-382).
#:   save_moe_out     — keep each MoE block's routed output in HBM
#:                      (skips re-decoding + re-running every expert in
#:                      the remat forward — the dominant fixed cost per
#:                      MoE layer at small tokens-per-expert, measured in
#:                      scripts/moe_profile.py; +[B,T,D] bf16 per layer)
#:   save_attn_moe    — save_attn + save_moe_out combined
REMAT_POLICIES = ("none", "save_attn", "offload_attn", "offload_qkv_attn",
                  "offload_acts", "save_moe_out", "save_attn_moe")

_OFFLOAD_NAMES = {
    "offload_attn": ["attn_out"],
    "offload_qkv_attn": ["q_rope", "k_rope", "v_proj", "attn_out"],
    "offload_acts": ["q_rope", "k_rope", "v_proj", "attn_out",
                     "swiglu_out"],
}


def resolve_remat_policy(spec):
    """Map a policy NAME (see REMAT_POLICIES) to a jax.checkpoint policy;
    callables/None pass through unchanged."""
    if spec is None or not isinstance(spec, str):
        return spec
    cp = jax.checkpoint_policies
    if spec == "none":
        return None
    if spec == "save_attn":
        return cp.save_only_these_names("attn_out")
    if spec == "save_moe_out":
        return cp.save_only_these_names("moe_out")
    if spec == "save_attn_moe":
        return cp.save_only_these_names("attn_out", "moe_out")
    names = _OFFLOAD_NAMES.get(spec)
    if names is None:
        raise ValueError(
            f"unknown remat policy {spec!r}; expected one of "
            f"{REMAT_POLICIES}")
    return cp.save_and_offload_only_these_names(
        names_which_can_be_saved=[],
        names_which_can_be_offloaded=names,
        offload_src="device", offload_dst="pinned_host")


def stack_params(params):
    """Convert the per-layer list layout to stacked [L, ...] leaves for
    scan execution. Requires homogeneous layers (same tree structure)."""
    layers = params["layers"]
    structs = {jax.tree_util.tree_structure(l) for l in layers}
    if len(structs) != 1:
        raise ValueError("layers are heterogeneous; cannot stack")
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers_stacked"] = stacked
    return out


def stack_lora(lora):
    layers = lora["layers"]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    out = {k: v for k, v in lora.items() if k != "layers"}
    out["layers_stacked"] = stacked
    return out


def unstack_lora(lora, num_layers):
    """Back to the list layout (for peft-format export)."""
    stacked = lora["layers_stacked"]
    layers = [jax.tree_util.tree_map(lambda x: x[i], stacked)
              for i in range(num_layers)]
    out = {k: v for k, v in lora.items() if k != "layers_stacked"}
    out["layers"] = layers
    return out


def lm_head_weight(params, cfg: ModelConfig):
    """[D, V] matmul operand; handles tied embeddings."""
    w = params.get("lm_head")
    if w is None:
        return params["embed"].T  # [D, V]
    return w.T if not hasattr(w, "packed") else w  # NF4 handled by caller


def logits_fn(params, lora, input_ids, cfg: ModelConfig, **kw) -> jnp.ndarray:
    """Full logits [B, T, V] (inference / small-batch path)."""
    h = forward(params, lora, input_ids, cfg, **kw)
    w = params.get("lm_head")
    if w is None:
        w = params["embed"]
    from ..ops.lora import base_matmul

    logits = base_matmul(h, w)
    if cfg.logit_scale is not None:
        logits = logits * cfg.logit_scale
    if cfg.final_softcap is not None:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return logits


def loss_fn(
    params: Dict[str, Any],
    lora: Optional[Dict[str, Any]],
    batch: Dict[str, jnp.ndarray],
    cfg: ModelConfig,
    *,
    n_items: Optional[jnp.ndarray] = None,
    lm_head_trainable: bool = False,
    fused_ce: Any = "auto",
    chunk_size: Optional[int] = None,
    remat: bool = True,
    remat_policy: Optional[Any] = None,
) -> jnp.ndarray:
    """SFT loss. batch: input_ids [B,T], labels [B,T] (-100 = ignore),
    optional positions / segment_ids. Labels are shifted internally
    (next-token prediction)."""
    if remat_policy is None:
        # UNSLOTH_REMAT_POLICY: named-policy escape hatch for trainers
        # that don't thread the argument (read at trace time — callers
        # that flip it between identical-aval jits must clear_caches(),
        # same caveat as the NF4 flags).
        import os

        remat_policy = os.environ.get("UNSLOTH_REMAT_POLICY") or None
    input_ids = batch["input_ids"]
    labels = batch["labels"]
    n_tokens = input_ids.shape[0] * input_ids.shape[1]
    nf4_mode = resolve_nf4_mode(params, cfg, n_tokens,
                                fused_ce=fused_ce)
    from ..ops.qlora_matmul import nf4_dispatch_mode

    with nf4_dispatch_mode(nf4_mode):
        h = forward(params, lora, input_ids, cfg,
                    positions=batch.get("positions"),
                    segment_ids=batch.get("segment_ids"),
                    remat=remat, remat_policy=remat_policy)
        return _loss_from_hidden(params, lora, h, labels, cfg,
                                 n_items=n_items,
                                 lm_head_trainable=lm_head_trainable,
                                 fused_ce=fused_ce,
                                 chunk_size=chunk_size)


def resolve_nf4_mode(params, cfg: ModelConfig, n_tokens: int,
                     fused_ce: Any = "auto"):
    """Trace-time choice between the fused NF4 Pallas matmul and XLA's
    dequantize+dot, from the same HBM-budget style of reasoning as the
    fused-CE auto gate below.

    Measured (bench_artifacts/r4/dense_gap.jsonl, 8 layers/8K): unfused
    is ~6% faster — XLA's dequant fusion beats the in-kernel decode —
    but its per-use dequantized weights live as HLO temps (~one bf16
    MLP matrix per layer scheduled live), which OOMs the full-depth 8B
    config (CLAUDE.md). So: unfused when params + remat residuals + CE
    temps + a per-layer dequant margin fit the budget; fused otherwise.
    UNSLOTH_NF4_FUSED=1/0 forces. Deterministic given (avals, cfg), so
    remat's aval-keyed trace cache stays correct. Returns "fused" /
    "unfused" / None (None = nothing quantized).

    Reference basis: unsloth picks its QLoRA kernel path once per model
    at patch time (kernels/fast_lora.py dispatch); the TPU-native analog
    is this static trace-time resolution."""
    import os

    from ..ops.nf4 import NF4Tensor

    leaves = jax.tree_util.tree_leaves(
        params, is_leaf=lambda x: isinstance(x, NF4Tensor))
    if not any(isinstance(x, NF4Tensor) for x in leaves):
        return None
    raw = os.environ.get("UNSLOTH_NF4_FUSED", "auto").lower()
    if raw in ("1", "true", "fused"):
        return "fused"
    if raw in ("0", "false", "unfused"):
        return "unfused"
    if jax.default_backend() != "tpu":
        return None  # CPU path never takes the Pallas kernel anyway
    param_bytes = 0
    for x in jax.tree_util.tree_leaves(params):
        if hasattr(x, "dtype"):
            param_bytes += x.size * x.dtype.itemsize
    d = cfg.hidden_size
    resid_bytes = cfg.num_layers * n_tokens * d * 2
    logits_bytes = n_tokens * cfg.vocab_size * 4
    budget_gb = float(os.environ.get(
        "UNSLOTH_CE_HBM_BUDGET_GB", "13.5"))
    budget = budget_gb * (1 << 30)
    if fused_ce == "auto":
        # replicate the fused-CE gate below so the estimate matches what
        # the loss will actually materialize
        ce_full = (logits_bytes <= 1536 * 1024 * 1024
                   or param_bytes + resid_bytes + 2 * logits_bytes
                   <= budget)
    else:
        ce_full = not fused_ce
    # full CE holds ~2 live [N, V] f32 buffers; the fused path still
    # recomputes ~2 GiB chunk logits in fwd+bwd (the default chunk in
    # _loss_from_hidden), which is what closes the full-depth 8B budget
    # (measured 14.65 GB fused peak, CLAUDE.md)
    ce_bytes = (2 * logits_bytes if ce_full
                else min(2 * logits_bytes, 4 << 30))
    # one dequantized bf16 MLP matrix per layer held live by XLA's
    # schedule (measured +0.08-0.12 GB/layer at llama-8B dims)
    margin_bytes = cfg.num_layers * d * cfg.intermediate_size * 2
    total = param_bytes + resid_bytes + ce_bytes + margin_bytes
    return "unfused" if total <= budget else "fused"


def _loss_from_hidden(
    params, lora, h, labels, cfg: ModelConfig, *,
    n_items=None, lm_head_trainable: bool = False,
    fused_ce: Any = "auto", chunk_size: Optional[int] = None,
) -> jnp.ndarray:
    """Shift + lm_head + CE from final hidden states (shared by the
    plain and pipeline-parallel loss paths)."""
    # shift: predict token t+1 from hidden t
    h = h[:, :-1, :]
    shift_labels = labels[:, 1:]
    d = h.shape[-1]
    h2d = h.reshape(-1, d)
    lb = shift_labels.reshape(-1)

    if fused_ce == "auto":
        # The fused path recomputes chunk logits in backward (one extra
        # lm_head matmul, ~2·N·D·V FLOPs) to avoid materializing [N, V];
        # full-logits CE instead pays ~2x logits_bytes of HBM temps —
        # far cheaper in TIME whenever it fits (HBM traffic vs a
        # 128K-vocab matmul). So fuse only when full logits would NOT
        # fit next to the weights and remat residuals (reference gates
        # fused CE the same way, models/llama.py:1454-1509
        # "bsz*q_len large").
        logits_bytes = h2d.shape[0] * cfg.vocab_size * 4
        if logits_bytes <= 1536 * 1024 * 1024:
            fused_ce = False
        else:
            import os

            param_bytes = sum(
                x.size * x.dtype.itemsize
                for x in jax.tree_util.tree_leaves(params)
                if hasattr(x, "dtype"))
            # per-layer GC keeps one [B,T,D] boundary per layer
            resid_bytes = cfg.num_layers * h2d.shape[0] * d * 2
            budget_gb = float(os.environ.get(
                "UNSLOTH_CE_HBM_BUDGET_GB",
                "13.5" if jax.default_backend() == "tpu" else "1e9"))
            fused_ce = (param_bytes + resid_bytes + 2 * logits_bytes
                        > budget_gb * (1 << 30))

    w = (lora or {}).get("lm_head")
    if w is not None:
        lm_head_trainable = True
    else:
        w = params.get("lm_head")
    tied = w is None
    if tied:
        w = (lora or {}).get("embed")
        if w is not None:
            lm_head_trainable = True
        else:
            w = params["embed"]

    if chunk_size is None:
        # Fewer, larger chunks win on v5e (measured at 8K ctx, 128K vocab:
        # 239 ms fwd+bwd at 1024-row chunks vs 214 ms at 4096) as long as
        # one chunk's transient fp32 logits stay ~2 GB.
        per_row = cfg.vocab_size * 4
        chunk_size = max(1024, min(h2d.shape[0],
                                   (2 << 30) // per_row // 1024 * 1024))

    if fused_ce:
        from ..ops.nf4 import NF4Tensor, dequantize_nf4

        if isinstance(w, NF4Tensor):
            wd = dequantize_nf4(w, dtype=h.dtype).T
        else:
            wd = w.T.astype(h.dtype)  # [D, V]
        return fused_ce_loss_mean(
            h2d, wd, lb,
            n_items=n_items,
            softcap=cfg.final_softcap,
            logit_scale=cfg.logit_scale,
            chunk_size=chunk_size,
            w_trainable=lm_head_trainable,
        )

    from ..ops.lora import base_matmul

    logits = base_matmul(h2d, w)
    return fast_cross_entropy_loss(
        logits, lb, n_items=n_items,
        softcap=cfg.final_softcap, logit_scale=cfg.logit_scale)
