"""NF4 fused-matmul microbench on the real TPU.

Chains N ops with DISTINCT weights inside ONE jit (per-call tunnel dispatch
is ~2ms and XLA CSEs repeated dequants of the same weight), syncs via
float() on the result.

Usage:
  python scripts/bench_nf4.py                 # fwd, llama-8B shapes
  NF4_BWD=1 python scripts/bench_nf4.py       # include custom-vjp backward
  NF4_SHAPES=4096x4096,4096x14336 NF4_M=8192 NF4_TILES=2048:512,4096:512 ...
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unsloth_tpu.ops.nf4 import quantize_nf4, dequantize_nf4  # noqa: E402
from unsloth_tpu.ops import qlora_matmul as qm  # noqa: E402

M = int(os.environ.get("NF4_M", "8192"))
N_CHAIN = int(os.environ.get("NF4_CHAIN", "8"))
STEPS = int(os.environ.get("NF4_STEPS", "5"))
PEAK = 197e12


def parse_shapes():
    s = os.environ.get("NF4_SHAPES", "4096x4096")
    return [tuple(map(int, t.split("x"))) for t in s.split(",")]


def bench_case(out_f, in_f, bm, bn, bk, bwd=False, dense=False,
               fn_override=None):
    key = jax.random.PRNGKey(0)
    ws = []
    for i in range(N_CHAIN):
        w = jax.random.normal(jax.random.fold_in(key, i),
                              (out_f, in_f), jnp.bfloat16) * 0.01
        ws.append(w if dense else quantize_nf4(w, dtype=jnp.bfloat16))
    x = jax.random.normal(key, (M, in_f), jnp.bfloat16) * 0.1

    mm = fn_override
    if mm is None:
        if dense:
            def mm(x_, w_):
                return jax.lax.dot_general(
                    x_, w_, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(x_.dtype)
        else:
            def mm(x_, q_):
                return qm._fwd_pallas(x_, q_, bm=bm, bn=bn, bk=bk)

    if bwd:
        def f(x_, ws_):
            def loss(xx):
                h = xx
                for w in ws_:
                    h = mm(h, w)
                    if h.shape[-1] != in_f:   # reshape back for chaining
                        h = h[:, :in_f]
                return jnp.sum(h.astype(jnp.float32))
            return jax.grad(loss)(x_)
    else:
        def f(x_, ws_):
            h = x_
            for w in ws_:
                h = mm(h, w)
                if h.shape[-1] != in_f:
                    h = h[:, :in_f]
            return h

    jf = jax.jit(f)
    t0 = time.perf_counter()
    r = jf(x, ws)
    float(jnp.sum(r.astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(STEPS):
        r = jf(x, ws)
    float(jnp.sum(r.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / STEPS / N_CHAIN
    flops = 2 * M * out_f * in_f * (3 if bwd else 1)
    # bwd chain: fwd + dx per op (no dW) -> 2x fwd flops, plus the fwd pass
    if bwd:
        flops = 2 * M * out_f * in_f * 2  # count fwd+bwd-dx as model flops
    return dt, flops / dt / PEAK, compile_s


def main():
    bwd = os.environ.get("NF4_BWD") == "1"
    tiles = os.environ.get("NF4_TILES", "2048:512:512")
    print(f"backend={jax.default_backend()} M={M} chain={N_CHAIN} bwd={bwd}")
    for (out_f, in_f) in parse_shapes():
        dt, eff, cs = bench_case(out_f, in_f, 0, 0, 0, bwd=bwd, dense=True)
        print(f"[{out_f}x{in_f}] dense bf16: {dt*1e3:.3f} ms/op "
              f"eff={eff:.3f} (compile {cs:.0f}s)")
        for t in tiles.split(","):
            parts = list(map(int, t.split(":")))
            bm, bn, bk = (parts + [512, 512])[:3]
            try:
                dt, eff, cs = bench_case(out_f, in_f, bm, bn, bk, bwd=bwd)
                print(f"[{out_f}x{in_f}] fused bm={bm} bn={bn} bk={bk}: "
                      f"{dt*1e3:.3f} ms/op eff={eff:.3f} (compile {cs:.0f}s)")
            except Exception as e:
                print(f"[{out_f}x{in_f}] bm={bm} bn={bn} bk={bk}: "
                      f"FAIL {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
