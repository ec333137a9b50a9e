"""MoE expert computation via grouped GEMM.

Parity target: the reference's fused MoE grouped-GEMM kernel suite
(reference: unsloth/kernels/moe/ — a Triton kernel looping expert tiles,
fusing the token permutation into GEMM1's prologue and the un-permute +
topk-weight multiply into GEMM2's epilogue; design in kernels/moe/README.md
:27-33; 7k LoC with its own autotuner).

TPU-native design: tokens are sorted by expert (one stable argsort), the
expert matmuls run as Megablox ``gmm`` (the public JAX Pallas grouped-matmul
kernel for TPU, differentiable, with its own tiling), and the un-permute +
weight-combine is a segment scatter-add. The permutation work the Triton
kernel hides in its prologue/epilogue is two gathers here — XLA overlaps
them with the grouped GEMMs; Megablox replaces the autotune cache with
static tiling hints.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..utils import env
from .activations import glu_for


def _dense_experts(experts: Dict[str, jnp.ndarray], dtype):
    """Materialize NF4Stacked expert weights (transient; recomputed under
    remat so only one layer's dense experts ever exist at a time)."""
    from .nf4 import NF4Stacked, dequantize_nf4_stacked

    out = {}
    for name, w in experts.items():
        if isinstance(w, NF4Stacked):
            out[name] = dequantize_nf4_stacked(w, dtype)
        else:
            out[name] = w
    return out


def _route(router_logits, k: int, norm_topk_prob: bool,
           routing: str = "softmax_topk", routing_params=None):
    """HF token-choice routing semantics. "softmax_topk": softmax over ALL
    experts, then top-k; renormalize only when norm_topk_prob (qwen3-moe
    flag; mixtral always renormalizes via its config). "llama4": top-k on
    the raw logits, sigmoid the selected values — and the weight scales
    the expert INPUT, not its output (handled by the callers)."""
    if routing == "llama4":
        top_vals, sel = jax.lax.top_k(router_logits, k)
        return jax.nn.sigmoid(top_vals), sel
    if routing == "topk_softmax":
        # granitemoe (HF GraniteMoeTopKGating): top-k on the raw logits
        # FIRST, then softmax over just the selected k
        top_vals, sel = jax.lax.top_k(router_logits.astype(jnp.float32), k)
        return jax.nn.softmax(top_vals, axis=-1), sel
    if routing == "deepseek":
        # DeepSeek-V3 (HF DeepseekV3TopkRouter): sigmoid scores; selection
        # uses bias-corrected scores restricted to the topk_group groups
        # with the highest top-2 sums; weights are the RAW scores at the
        # chosen experts, normalized, times routed_scaling_factor.
        p = routing_params or {}
        scores = jax.nn.sigmoid(router_logits)
        corrected = scores + p["correction_bias"][None, :]
        n, e = scores.shape
        g = int(p.get("n_group", 1))
        per = e // g
        top2, _ = jax.lax.top_k(corrected.reshape(n, g, per),
                                min(2, per))
        group_scores = top2.sum(-1)                      # [n, g]
        _, gidx = jax.lax.top_k(group_scores, int(p.get("topk_group", 1)))
        gmask = jnp.zeros((n, g), corrected.dtype).at[
            jnp.arange(n)[:, None], gidx].set(1.0)
        smask = jnp.repeat(gmask, per, axis=1)
        masked = jnp.where(smask > 0, corrected, 0.0)
        _, sel = jax.lax.top_k(masked, k)
        weights = jnp.take_along_axis(scores, sel, axis=1)
        if norm_topk_prob:
            weights = weights / (jnp.sum(weights, -1, keepdims=True)
                                 + 1e-20)
        return weights * float(p.get("routed_scaling", 1.0)), sel
    probs = jax.nn.softmax(router_logits, axis=-1)
    weights, sel = jax.lax.top_k(probs, k)
    if norm_topk_prob:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, sel


def moe_mlp_dense(x, router_logits, experts: Dict[str, jnp.ndarray],
                  num_experts_per_tok: int, act: str,
                  norm_topk_prob: bool = False,
                  routing: str = "softmax_topk", routing_params=None):
    """Reference einsum implementation (parity oracle; used off-TPU).
    x: [N, D]; experts: gate/up [E, F, D], down [E, D, F]; optional
    per-expert biases gate_bias/up_bias [E, F], down_bias [E, D]
    (gpt-oss — applied inside each expert, before the routing weight)."""
    n, d = x.shape
    k = num_experts_per_tok
    experts = _dense_experts(experts, x.dtype)
    weights, sel = _route(router_logits, k, norm_topk_prob, routing,
                          routing_params)
    glu = glu_for(act)
    scale_input = routing == "llama4"

    def bias(name, idx):
        b = experts.get(name)
        return jnp.take(b, idx, axis=0).astype(x.dtype) \
            if b is not None else 0

    def one_slot(i):
        idx = sel[:, i]
        w_i = weights[:, i:i + 1].astype(x.dtype)
        xi = x * w_i if scale_input else x
        wg = jnp.take(experts["gate"], idx, axis=0)
        wu = jnp.take(experts["up"], idx, axis=0)
        wd = jnp.take(experts["down"], idx, axis=0)
        e = jnp.einsum("nd,nfd->nf", xi, wg.astype(x.dtype)) \
            + bias("gate_bias", idx)
        g = jnp.einsum("nd,nfd->nf", xi, wu.astype(x.dtype)) \
            + bias("up_bias", idx)
        h = glu(e, g)
        y = jnp.einsum("nf,ndf->nd", h, wd.astype(x.dtype)) \
            + bias("down_bias", idx)
        return y if scale_input else y * w_i

    return sum(one_slot(i) for i in range(k))


def moe_mlp_expert_loop(x, router_logits,
                        experts: Dict[str, jnp.ndarray],
                        num_experts_per_tok: int, act: str,
                        norm_topk_prob: bool = False,
                        routing: str = "softmax_topk",
                        routing_params=None):
    """HF-style loop over experts, static shapes: EVERY expert runs a
    full dense matmul over ALL tokens, masked by its routing weight —
    E/k times the useful FLOPs. This is the naive transformers
    loop-over-experts shape (reference: its grouped-GEMM kernel's "12x
    vs HF" comparison, kernels/moe/README.md) kept as a second parity
    oracle and the bench's hf-equivalent baseline."""
    n, d = x.shape
    dense = _dense_experts(experts, x.dtype)
    weights, sel = _route(router_logits, num_experts_per_tok,
                          norm_topk_prob, routing, routing_params)
    glu = glu_for(act)
    scale_input = routing == "llama4"
    e_total = dense["gate"].shape[0]

    def bias(name, e):
        b = dense.get(name)
        return b[e].astype(x.dtype) if b is not None else 0

    out = jnp.zeros_like(x)
    for e in range(e_total):
        w_e = jnp.sum(jnp.where(sel == e, weights, 0.0),
                      axis=-1)[:, None].astype(x.dtype)       # [N, 1]
        xi = x * w_e if scale_input else x
        eh = xi @ dense["gate"][e].astype(x.dtype).T + bias("gate_bias", e)
        g = xi @ dense["up"][e].astype(x.dtype).T + bias("up_bias", e)
        y = glu(eh, g) @ dense["down"][e].astype(x.dtype).T \
            + bias("down_bias", e)
        if scale_input:
            out = out + jnp.where(w_e != 0, y, 0)
        else:
            out = out + y * w_e
    return out


def moe_mlp_grouped(x, router_logits, experts: Dict[str, jnp.ndarray],
                    num_experts_per_tok: int, act: str,
                    norm_topk_prob: bool = False,
                    interpret: Optional[bool] = None,
                    routing: str = "softmax_topk", routing_params=None):
    """Grouped-GEMM implementation. Same signature/semantics as dense."""
    from jax.experimental.pallas.ops.tpu.megablox import gmm

    from .nf4 import NF4Stacked
    from .nf4_gmm import nf4_gmm, use_nf4_gmm

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    n, d = x.shape
    # NF4Stacked experts with aligned blocks run the fused
    # dequant-inside-gmm kernel (4.2x faster fwd than dequantize+gmm at
    # gpt-oss dims, measured on v5e); others are materialized transiently.
    fused = {name: isinstance(w, NF4Stacked) and use_nf4_gmm(w)
             for name, w in experts.items()}
    experts = {name: (w if fused[name]
                      else _dense_experts({name: w}, x.dtype)[name])
               for name, w in experts.items()}
    num_experts = experts["gate"].shape[0]
    k = num_experts_per_tok
    weights, sel = _route(router_logits, k, norm_topk_prob,
                          routing, routing_params)          # [N, k]
    scale_input = routing == "llama4"

    flat_expert = sel.reshape(-1)                           # [N*k]
    order = jnp.argsort(flat_expert, stable=True)           # [N*k]
    token_idx = order // k                                  # source token
    xs = jnp.take(x, token_idx, axis=0)                     # [N*k, D]
    if scale_input:
        xs = xs * jnp.take(weights.reshape(-1), order)[:, None].astype(
            x.dtype)
    # group sizes via a one-hot matmul: jnp.bincount lowers to a serial
    # scatter-add (~0.6 ms on v5e for 2k ids — comparable to a whole
    # expert matmul at these dims); the [N*k, E] one-hot reduce is MXU
    # work and exact for counts << 2^24
    group_sizes = jnp.sum(
        (flat_expert[:, None]
         == jnp.arange(num_experts, dtype=flat_expert.dtype)[None, :]
         ).astype(jnp.float32), axis=0).astype(jnp.int32)

    glu = glu_for(act)

    def _fit(v: int) -> int:
        if v % 128 == 0:
            return 128
        for t in (64, 32, 16, 8):
            if v % t == 0:
                return t
        return v

    def _fit_lane(v: int) -> int:
        for t in (512, 256, 128):
            if v % t == 0:
                return t
        return v

    m = n * k
    f = experts["gate"].shape[1]

    def tiled_gmm(lhs, rhs):
        # Mosaic requires the LAST dim of every block to be 128-divisible
        # (or the full dim). Dims like gpt-oss's 2880 are not — zero-pad
        # the contraction and output dims to the next 128 multiple (exact:
        # zeros contribute nothing) and slice the output back.
        k0 = rhs.shape[2]      # transpose_rhs: rhs is [E, n_out, k]
        n0 = rhs.shape[1]
        kp = (-k0) % 128
        np_ = (-n0) % 128
        if kp:
            lhs = jnp.pad(lhs, ((0, 0), (0, kp)))
            rhs = jnp.pad(rhs, ((0, 0), (0, 0), (0, kp)))
        if np_:
            rhs = jnp.pad(rhs, ((0, 0), (0, np_), (0, 0)))
        out = gmm(lhs, rhs, group_sizes=group_sizes,
                  preferred_element_type=jnp.float32,
                  tiling=(_fit(m), _fit_lane(k0 + kp),
                          _fit_lane(n0 + np_)),
                  transpose_rhs=True, interpret=interpret)
        return out[:, :n0] if np_ else out

    sorted_expert = None

    def bias_rows(name):
        nonlocal sorted_expert
        b = experts.get(name)
        if b is None:
            return 0
        if sorted_expert is None:
            sorted_expert = jnp.take(flat_expert, order)    # [N*k]
        return jnp.take(b, sorted_expert, axis=0).astype(x.dtype)

    def gmm_(lhs, name):
        """Expert matmul + its per-expert bias. The fused kernel adds
        the bias in its store epilogue (no [m, N] row-gather); the
        unfused path gathers per sorted row."""
        w = experts[name]
        b = experts.get(name + "_bias")
        if fused[name]:
            return nf4_gmm(lhs, w, group_sizes, bias=b).astype(x.dtype)
        return tiled_gmm(lhs, w).astype(x.dtype) \
            + bias_rows(name + "_bias")

    # gate/up: [E, F, D] with transpose_rhs => contracts D
    e = gmm_(xs, "gate")
    g = gmm_(xs, "up")
    h = glu(e, g)
    y = gmm_(h, "down")

    # unpermute by GATHER, not scatter-add: rows are a permutation of
    # [N*k], so inverse-gather + reshape + sum-over-slots replaces the
    # row scatter (TPU scatters serialize; the gather+reduce is vector
    # work and numerically identical per token)
    inv = jnp.argsort(order)                                # [N*k]
    y_flat = jnp.take(y, inv, axis=0).reshape(n, k, d)
    if scale_input:
        return jnp.sum(y_flat, axis=1).astype(x.dtype)
    return jnp.sum(y_flat * weights[:, :, None].astype(x.dtype),
                   axis=1).astype(x.dtype)


def moe_mlp(x, router_logits, experts, num_experts_per_tok: int, act: str,
            norm_topk_prob: bool = False, impl: str = "auto",
            routing: str = "softmax_topk", routing_params=None):
    """Dispatching MoE MLP. impl: auto | grouped | dense | eloop
    (UNSLOTH_MOE_IMPL overrides — eloop is the HF-style loop baseline)."""
    import os

    impl = os.environ.get("UNSLOTH_MOE_IMPL", impl)
    if impl == "eloop":
        return moe_mlp_expert_loop(x, router_logits, experts,
                                   num_experts_per_tok, act,
                                   norm_topk_prob, routing=routing,
                                   routing_params=routing_params)
    if impl == "dense" or (impl == "auto" and (
            env.disable_pallas() or jax.default_backend() != "tpu")):
        return moe_mlp_dense(x, router_logits, experts,
                             num_experts_per_tok, act, norm_topk_prob,
                             routing=routing,
                             routing_params=routing_params)
    return moe_mlp_grouped(x, router_logits, experts,
                           num_experts_per_tok, act, norm_topk_prob,
                           routing=routing, routing_params=routing_params)
