"""Round-4 experiment: remat-policy ladder on the full-depth headline.

Measures the llama-8B QLoRA 8K-packed train step under each named remat
policy (models/decoder.py REMAT_POLICIES): what does skipping the
flash-forward / qkv / gate-up recomputes buy, and what does it cost in
HBM or host bandwidth? One JSON line per variant to stdout.

Run ON THE TPU (one job at a time): timeout 5400 python scripts/exp_remat_r4.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench


def main():
    quick = False
    num_layers = 32
    seq, bsz, n_steps = 8192, 1, 3
    cfg = bench.llama31_8b_config(num_layers)
    key = jax.random.PRNGKey(0)
    packed = bench.make_packed_batch(cfg, key, bsz, seq, packed=True)

    variants = [
        ("baseline_none", None, 1024),
        ("offload_attn", "offload_attn", 1024),
        ("offload_qkv_attn", "offload_qkv_attn", 1024),
        ("offload_acts", "offload_acts", 1024),
        ("save_attn", "save_attn", 1024),
        # winner re-run with block 512 for the block interaction
        ("offload_acts_blk512", "offload_acts", 512),
    ]
    for name, policy, blk in variants:
        t0 = time.time()
        try:
            tps, dt, gb, loss = bench.run_path(
                cfg, key, packed, n_steps, quantize=True,
                fused_ce="auto", want_memory=True, flash_block=blk,
                remat_policy=policy, warmup=2)
            mfu = 3 * bench.flops_per_token(cfg, seq) * bsz * seq / dt \
                / bench.V5E_BF16_PEAK_FLOPS
            print(json.dumps({
                "variant": name, "policy": policy, "flash_block": blk,
                "tok_s": round(tps, 1), "step_s": round(dt, 4),
                "peak_hbm_gb": gb, "mfu": round(mfu, 4),
                "loss": round(loss, 3),
                "wall_s": round(time.time() - t0, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue
            print(json.dumps({
                "variant": name, "policy": policy, "flash_block": blk,
                "error": f"{type(e).__name__}: {str(e)[:300]}",
                "wall_s": round(time.time() - t0, 1)}), flush=True)
            print(f"variant {name} failed", file=sys.stderr)


if __name__ == "__main__":
    main()
