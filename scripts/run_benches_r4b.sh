#!/bin/sh
# Round-4 second pass — after the bench.py baseline fixes:
#  * llama: epoch-weighted hf-practice baseline (every dynamic-padded
#    batch shape the policy produces, not one lucky batch)
#  * gpt_oss: OOM-aware depth ladder for both MoE baselines
#  * vision/tts: measured HF-equivalent baselines
# One TPU job at a time (tunnel compiles serialize).
set -x
OUT=bench_artifacts/r4

run_mode() {
    name=$1; model=$2; t=$3
    if grep -q '"metric"' "$OUT/$name.json" 2>/dev/null; then
        echo "skip $name (artifact exists)"; return
    fi
    BENCH_MODEL=$model timeout "$t" python bench.py \
        > "$OUT/$name.json" 2> "$OUT/$name.err"
}

run_mode llama   llama   7200
run_mode gpt_oss gpt_oss 5400
run_mode vision  vision  3600
run_mode tts     tts     3600
echo DONE
