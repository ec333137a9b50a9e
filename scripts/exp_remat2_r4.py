"""Round-4 experiment #2: save_attn + flash block splits at full depth.

Ladder #1 showed host offload is ineffective on the axon AOT stack (the
"offloaded" buffers stay in HBM -> OOM), so the viable levers are:
  * save_attn with SMALLER flash bwd blocks (trade ~1 GB of bwd temps
    for the 2 GB of saved attention outputs that skip the flash-forward
    recompute)
  * independent fwd/bwd block choices (UNSLOTH_FLASH_BLOCK_BWD)

Run ON THE TPU: timeout 5400 python scripts/exp_remat2_r4.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench


def main():
    num_layers = 32
    seq, bsz, n_steps = 8192, 1, 3
    cfg = bench.llama31_8b_config(num_layers)
    key = jax.random.PRNGKey(0)
    packed = bench.make_packed_batch(cfg, key, bsz, seq, packed=True)

    variants = [
        # (name, policy, fwd block, bwd block)
        ("save_attn_f1024_b512", "save_attn", 1024, 512),
        ("save_attn_f512_b512", "save_attn", 512, 512),
        ("none_f2048_b1024", None, 2048, 1024),
        ("none_f1024_b2048", None, 1024, 2048),
        ("save_attn_f2048_b512", "save_attn", 2048, 512),
    ]
    for name, policy, blk, bwd in variants:
        t0 = time.time()
        try:
            tps, dt, gb, loss = bench.run_path(
                cfg, key, packed, n_steps, quantize=True,
                fused_ce="auto", want_memory=True, flash_block=blk,
                flash_block_bwd=bwd, remat_policy=policy, warmup=2)
            mfu = 3 * bench.flops_per_token(cfg, seq) * bsz * seq / dt \
                / bench.V5E_BF16_PEAK_FLOPS
            print(json.dumps({
                "variant": name, "tok_s": round(tps, 1),
                "step_s": round(dt, 4), "peak_hbm_gb": gb,
                "mfu": round(mfu, 4), "loss": round(loss, 3),
                "wall_s": round(time.time() - t0, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "variant": name,
                "error": f"{type(e).__name__}: {str(e)[:300]}",
                "wall_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
