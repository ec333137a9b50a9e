"""Pallas vs XLA-fused norm at real model shapes (whisper/BERT/llama).

bench_artifacts/r5/whisper.json measured the all-Pallas step 5% SLOWER
than UNSLOTH_DISABLE_PALLAS=1 — and whisper's only Pallas op is
layer_norm, so the gap is the standalone LN kernel forcing a fusion
boundary XLA would otherwise fuse through. This measures layer_norm and
rms_norm, Pallas vs the jnp reference, fwd and fwd+bwd, at the shapes
that matter, to decide the dispatch default.

Method per CLAUDE.md: chain 16 norm applications with DISTINCT weights
and residual adds inside ONE jit (per-call tunnel dispatch is ~2-4 ms;
XLA CSEs repeated identical subexpressions); flip the implementation via
UNSLOTH_DISABLE_PALLAS + jax.clear_caches() between jits (the env flag
is read at trace time). Same-run comparisons only.

Writes bench_artifacts/r5/ln_crossover.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import unsloth_tpu  # noqa: F401  (enables the persistent compile cache)
from unsloth_tpu.ops.rms_norm import layer_norm, rms_norm

CHAIN = 16
STEPS = 8
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench_artifacts", "r5",
    "ln_crossover.jsonl")

SHAPES = [
    # (rows, d, tag)
    (2 * 1500, 1280, "whisper_enc_b2"),     # whisper-large encoder
    (2 * 224, 1280, "whisper_dec_b2"),      # whisper-large decoder
    (32 * 512, 384, "minilm_mnrl"),         # MiniLM embedding batch
    (8192, 4096, "llama8b_8k"),             # llama-8B hot path
]


def build(op, rows, d, with_bias):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 2 * CHAIN + 1)
    x = jax.random.normal(ks[0], (rows, d), jnp.bfloat16)
    ws = [1.0 + 0.01 * jax.random.normal(ks[1 + i], (d,), jnp.float32)
          for i in range(CHAIN)]
    bs = [0.01 * jax.random.normal(ks[1 + CHAIN + i], (d,), jnp.float32)
          for i in range(CHAIN)]

    def fwd(x, ws, bs):
        y = x
        for i in range(CHAIN):
            if with_bias:
                y = y + layer_norm(y, ws[i], bs[i])
            else:
                y = y + rms_norm(y, ws[i])
        return jnp.sum(y.astype(jnp.float32))

    def fwdbwd(x, ws, bs):
        g = jax.grad(fwd, argnums=(0, 1))(x, ws, bs)
        return (jnp.sum(g[0].astype(jnp.float32))
                + sum(jnp.sum(w) for w in g[1]))

    return x, ws, bs, fwd, fwdbwd


def timeit(fn, args):
    j = jax.jit(fn)
    r = j(*args)
    float(r)  # sync (block_until_ready lies on axon)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        r = j(*args)
    float(r)
    return (time.perf_counter() - t0) / STEPS / CHAIN


def main():
    rows_out = []
    for rows, d, tag in SHAPES:
        for op in ("rms", "ln"):
            rec = {"shape": tag, "rows": rows, "d": d, "op": op}
            for impl in ("pallas", "jnp"):
                os.environ["UNSLOTH_DISABLE_PALLAS"] = \
                    "1" if impl == "jnp" else "0"
                jax.clear_caches()
                x, ws, bs, fwd, fwdbwd = build(op, rows, d, op == "ln")
                rec[f"{impl}_fwd_us"] = round(
                    timeit(fwd, (x, ws, bs)) * 1e6, 1)
                rec[f"{impl}_fwdbwd_us"] = round(
                    timeit(fwdbwd, (x, ws, bs)) * 1e6, 1)
            rec["pallas_over_jnp_fwdbwd"] = round(
                rec["pallas_fwdbwd_us"] / rec["jnp_fwdbwd_us"], 3)
            print(json.dumps(rec))
            rows_out.append(rec)
    os.environ.pop("UNSLOTH_DISABLE_PALLAS", None)
    with open(OUT, "w") as f:
        for r in rows_out:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
