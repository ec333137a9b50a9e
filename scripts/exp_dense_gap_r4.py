"""Round-4 experiment: decompose the common-depth gap vs dense LoRA.

VERDICT r3 weak #1: `vs_dense_lora = 0.851` at 8 layers, but the NF4
kernel's own ablation shows the in-kernel decode+scale costs <3% — so
where do the other ~12% go? This script ablates each candidate factor
separately at the common depth (8 layers, 8K, bsz 1) so the gap is
attributed factor-by-factor:

  ours            = NF4-fused + fused-CE + packed(4 segs) + flash f1024/b512
  dense_baseline  = dense bf16 + full-logits CE + unpacked (bench.py's
                    vs_dense_lora denominator)
  ours_fullce     = ours with full-logits CE        -> fused-CE effect
  ours_unpacked   = ours on a single-segment row    -> packing/segment cost
  dense_packed_fce= dense + fused-CE + packed       -> NF4 effect (vs ours)
  ours_unfused    = XLA dequant+dot instead of the fused kernel
  ours_bwd{256,1024} = flash bwd block sweep (CLAUDE.md: fwd block
                    indistinguishable at 8K; bwd unexplored)

run_path calls jax.clear_caches() per variant (the remat trace-cache
gotcha), so one process is safe. Run ON THE TPU, one job at a time:
  timeout 5400 python scripts/exp_dense_gap_r4.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench


def main():
    num_layers = int(os.environ.get("EXP_LAYERS", "8"))
    seq, bsz, n_steps = 8192, 1, 3
    cfg = bench.llama31_8b_config(num_layers)
    key = jax.random.PRNGKey(0)
    packed = bench.make_packed_batch(cfg, key, bsz, seq, packed=True)
    plain = bench.make_packed_batch(cfg, key, bsz, seq, packed=False)

    # name, batch, kwargs for run_path
    variants = [
        ("ours", packed,
         dict(quantize=True, fused_ce="auto", flash_block=1024)),
        ("dense_baseline", plain,
         dict(quantize=False, fused_ce=False)),
        ("ours_fullce", packed,
         dict(quantize=True, fused_ce=False, flash_block=1024)),
        ("ours_unpacked", plain,
         dict(quantize=True, fused_ce="auto", flash_block=1024)),
        ("dense_packed_fce", packed,
         dict(quantize=False, fused_ce="auto", flash_block=1024)),
        ("ours_unfused_nf4", packed,
         dict(quantize=True, fused_ce="auto", disable_fused_nf4=True,
              flash_block=1024)),
        ("ours_bwd256", packed,
         dict(quantize=True, fused_ce="auto", flash_block=1024,
              flash_block_bwd=256)),
        ("ours_bwd1024", packed,
         dict(quantize=True, fused_ce="auto", flash_block=1024,
              flash_block_bwd=1024)),
        ("dense_fullce_packed", packed,
         dict(quantize=False, fused_ce=False, flash_block=1024)),
    ]
    if os.environ.get("EXP_PACKED_BLOCK_SWEEP"):
        # segment-block-sparse block sweep on the MEASURED-lengths batch
        # (alpaca max doc 144): work per q block is (ceil(144/blk)+1)*blk
        # keys -> 1024 @ blk512, 512 @ blk256, 384 @ blk128. Sets the
        # kernel's default block for short-doc packing.
        pad = json.load(open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "bench_artifacts", "pad_frac.json")))
        packed_m, max_doc = bench.make_packed_measured_batch(
            cfg, key, bsz, seq, pad["lengths"])
        for blk in (512, 256, 128):
            variants.append((f"ours_measured_pblk{blk}", packed_m,
                             dict(quantize=True, fused_ce="auto",
                                  flash_block=1024,
                                  segment_bound=max_doc,
                                  _env={"UNSLOTH_PACKED_BLOCK": str(blk)})))
    if os.environ.get("EXP_SEGMENT_SPARSE"):
        # headline-shape packed batch routed through the segment-block-
        # sparse kernel: bound = the batch's true max segment length
        # (exact attention; quantifies what the trainer's auto-routing
        # buys on the 4-doc synthetic headline batch)
        import numpy as np

        seg = np.asarray(packed["segment_ids"])
        max_seg = max(int((seg[b] == s).sum())
                      for b in range(seg.shape[0])
                      for s in np.unique(seg[b]) if s > 0)
        variants.insert(1, ("ours_segment_sparse", packed,
                            dict(quantize=True, fused_ce="auto",
                                 flash_block=1024,
                                 segment_bound=max_seg)))
    only = os.environ.get("EXP_ONLY")
    if only:
        import re as _re

        variants = [v for v in variants if _re.search(only, v[0])]
    for name, batch, kw in variants:
        t0 = time.time()
        env_extra = kw.pop("_env", {})
        saved = {k: os.environ.get(k) for k in env_extra}
        os.environ.update(env_extra)
        try:
            tps, dt, gb, loss = bench.run_path(
                cfg, key, batch, n_steps, want_memory=True, warmup=2, **kw)
            mfu = 3 * bench.flops_per_token(cfg, seq) * bsz * seq / dt \
                / bench.V5E_BF16_PEAK_FLOPS
            print(json.dumps({
                "variant": name, "layers": num_layers,
                "tok_s": round(tps, 1), "step_s": round(dt, 4),
                "peak_hbm_gb": gb, "mfu": round(mfu, 4),
                "loss": round(loss, 3),
                "wall_s": round(time.time() - t0, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue
            print(json.dumps({
                "variant": name, "layers": num_layers,
                "error": f"{type(e).__name__}: {str(e)[:300]}",
                "wall_s": round(time.time() - t0, 1)}), flush=True)
            print(f"variant {name} failed", file=sys.stderr)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
