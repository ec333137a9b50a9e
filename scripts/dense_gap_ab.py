"""Same-run A/B for vs_dense_lora (VERDICT r4 #6).

r4 measured vs_dense_lora = 0.943 at the 8-layer/8K common depth across
SEPARATE runs; chip throughput varies 0.50-0.64 of peak run-to-run
(CLAUDE.md), so only an interleaved same-run comparison can say whether
the 6% is real. Four variants, each compiled ONCE, then measured in
interleaved rounds (A B C D  A B C D ...) taking the per-variant MIN:

  A  ours:    NF4 (auto dispatch) + packed rows + fused_ce auto
  B  dense:   bf16 + unpacked + full-logits CE   (the r4 baseline)
  C  dense+packed: isolates the packing effect (same weights as B)
  D  NF4+unpacked: isolates the dequant cost     (same batch as B)

Writes bench_artifacts/r5/dense_gap_ab.json.
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

from bench import (build_model, compile_step, llama31_8b_config,
                   make_packed_batch)
from unsloth_tpu.models.params import init_lora_tree

LAYERS = int(os.environ.get("AB_LAYERS", "8"))
SEQ = int(os.environ.get("AB_SEQ", "8192"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))
STEPS = int(os.environ.get("AB_STEPS", "3"))
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_artifacts", "r5",
    "dense_gap_ab.json")


def _sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def build_variant(name, quantize, packed, fused_ce, flash_block=1024):
    cfg = llama31_8b_config(LAYERS)
    key = jax.random.PRNGKey(0)
    os.environ["UNSLOTH_FLASH_BLOCK"] = str(flash_block)
    jax.clear_caches()  # remat trace cache keys on avals, not env/flags
    params = build_model(cfg, key, quantize=quantize)
    lora = init_lora_tree(cfg, key, r=16, alpha=16, dtype=jnp.float32)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(lora)
    batch = make_packed_batch(cfg, key, 1, SEQ, packed=packed)
    step = compile_step(cfg, tx, fused_ce, list(batch))
    compiled = step.lower(lora, opt_state, params, batch).compile()
    # warm-up (also produces post-donation state)
    lora, opt_state, _ = compiled(lora, opt_state, params, batch)
    _sync(lora)
    return {"name": name, "step": compiled, "lora": lora,
            "opt": opt_state, "params": params, "batch": batch}


def measure_round(v):
    t0 = time.perf_counter()
    lora, opt, loss = v["lora"], v["opt"], None
    for _ in range(STEPS):
        lora, opt, loss = v["step"](lora, opt, v["params"], v["batch"])
    _sync(lora)
    v["lora"], v["opt"] = lora, opt
    return (time.perf_counter() - t0) / STEPS


def main():
    # One variant resident at a time (two dense 8-layer copies plus step
    # temps would overflow the 16 GB chip); per-round rebuilds hit the
    # persistent compile cache after round 1, and the rebuild cost is
    # outside the timed section.
    specs = [
        ("ours_nf4_packed", True, True, "auto"),
        ("dense_unpacked", False, False, False),
        ("dense_packed", False, True, "auto"),
        ("nf4_unpacked", True, False, False),
    ]
    times = {name: [] for name, *_ in specs}
    for r in range(ROUNDS):
        for spec in specs:
            v = build_variant(*spec)
            dt = measure_round(v)
            times[v["name"]].append(round(dt, 4))
            print(f"round {r} {v['name']}: {dt:.4f}s", file=sys.stderr)
            del v
    best = {k: min(ts) for k, ts in times.items()}
    result = {
        "config": {"layers": LAYERS, "seq": SEQ, "rounds": ROUNDS,
                   "steps_per_round": STEPS},
        "step_time_s": times,
        "best_s": best,
        "ratios": {
            "vs_dense_lora_same_run":
                round(best["dense_unpacked"] / best["ours_nf4_packed"], 4),
            "packing_effect_dense":
                round(best["dense_unpacked"] / best["dense_packed"], 4),
            "dequant_cost_unpacked":
                round(best["nf4_unpacked"] / best["dense_unpacked"], 4),
            "nf4_vs_dense_both_packed":
                round(best["dense_packed"] / best["ours_nf4_packed"], 4),
        },
    }
    print(json.dumps(result))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
