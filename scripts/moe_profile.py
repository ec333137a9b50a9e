"""Attribute gpt-oss MoE step time (the r4/r5 MFU=0.112 question).

The depth ladder in bench_artifacts/r5/gpt_oss.json shows time is linear
in layers (~41 ms/layer at seq 1024) while each layer's useful FLOPs are
~4 ms at peak. This measures WHERE the other ~37 ms goes, at 2 layers
(fast compiles), by same-run variant comparison:

  fused          ours: stacked-NF4 experts, fused dequant-in-gmm
  fused_fwd      forward-only loss of the same program (bwd/remat split)
  dense_experts  identical step, experts pre-dequantized to bf16 [E,N,K]
                 (megablox gmm path) -> isolates the in-kernel NF4 decode
  no_moe         plain dense decoder, MLP sized to the ACTIVE expert
                 FLOPs (ff = top_k * moe_ff, same gpt-oss attention) ->
                 isolates MoE machinery (router+permute+gmm grouping)
  seq ladder     fused at 1024/2048/4096 -> per-token vs per-step cost

Writes bench_artifacts/r5/moe_profile.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from bench import (build_moe_model, compile_step, flops_per_token,
                   gpt_oss_20b_config, make_packed_batch, measure,
                   V5E_BF16_PEAK_FLOPS)
from unsloth_tpu.models.params import init_lora_tree

LAYERS = int(os.environ.get("PROF_LAYERS", "2"))
STEPS = int(os.environ.get("PROF_STEPS", "6"))
BATCH = int(os.environ.get("PROF_BATCH", "1"))
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_artifacts", "r5",
    "moe_profile.jsonl")


def dense_expert_params(params):
    """Dequantize every NF4Stacked expert stack to dense bf16 once."""
    from unsloth_tpu.ops.nf4 import NF4Stacked, dequantize_nf4_stacked

    def conv(x):
        if isinstance(x, NF4Stacked):
            return dequantize_nf4_stacked(x, dtype=jnp.bfloat16)
        return x

    return jax.tree_util.tree_map(
        conv, params,
        is_leaf=lambda x: isinstance(x, NF4Stacked))


ONLY = set(filter(None, os.environ.get("PROF_ONLY", "").split(",")))


def want(tag):
    return not ONLY or tag in ONLY


def run(tag, cfg, params, seq, fwd_only=False, remat_policy=None):
    jax.clear_caches()
    key = jax.random.PRNGKey(0)
    batch = make_packed_batch(cfg, key, BATCH, seq, packed=False)
    lora = init_lora_tree(cfg, key, r=16, alpha=16, dtype=jnp.float32)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(lora)
    if fwd_only:
        from unsloth_tpu.models.decoder import loss_fn as _loss

        def fstep(lora, opt_state, params, batch):
            return lora, opt_state, _loss(params, lora, batch, cfg,
                                          fused_ce="auto")
        step = jax.jit(fstep)
    else:
        step = compile_step(cfg, tx, "auto", list(batch),
                            remat_policy=remat_policy)
    dt, loss = measure(step, lora, opt_state, params, batch, STEPS)
    tokens = batch["input_ids"].size
    mfu = 3 * flops_per_token(cfg, seq) * tokens / dt / V5E_BF16_PEAK_FLOPS
    rec = {"variant": tag, "layers": cfg.num_layers, "seq": seq,
           "batch": BATCH,
           "step_ms": round(dt * 1e3, 2),
           "ms_per_layer": round(dt * 1e3 / cfg.num_layers, 2),
           "tokens_per_sec": round(tokens / dt, 1),
           "mfu": round(mfu, 4), "loss": round(loss, 3)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    key = jax.random.PRNGKey(0)
    rows = []

    cfg = gpt_oss_20b_config(LAYERS)
    params = build_moe_model(cfg, key)

    if want("fused"):
        rows.append(run("fused", cfg, params, 1024))
    if want("fused_fwd_only"):
        rows.append(run("fused_fwd_only", cfg, params, 1024,
                        fwd_only=True))
    for seq in (2048, 4096):
        if want(f"fused_seq{seq}"):
            rows.append(run(f"fused_seq{seq}", cfg, params, seq))
    if want("fused_save_moe"):
        rows.append(run("fused_save_moe", cfg, params, 1024,
                        remat_policy="save_moe_out"))
    if want("fused_save_attn_moe"):
        rows.append(run("fused_save_attn_moe", cfg, params, 1024,
                        remat_policy="save_attn_moe"))
    if want("fused_save_moe_seq4096"):
        rows.append(run("fused_save_moe_seq4096", cfg, params, 4096,
                        remat_policy="save_moe_out"))

    if want("dense_experts"):
        dense = dense_expert_params(params)
        rows.append(run("dense_experts", cfg, dense, 1024))
        del dense

    if want("no_moe_active_flops"):
        # active-FLOPs dense MLP, same attention (sinks + sliding)
        from dataclasses import replace
        no_moe = replace(cfg, num_experts=0, num_experts_per_tok=0,
                         intermediate_size=cfg.num_experts_per_tok
                         * cfg.moe_intermediate_size)
        from bench import build_model
        params_nm = build_model(no_moe, key, quantize=True)
        rows.append(run("no_moe_active_flops", no_moe, params_nm, 1024))
        del params_nm

    mode = "a" if ONLY and os.path.exists(OUT) else "w"
    with open(OUT, mode) as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
