#!/bin/sh
# Round-4 third pass — re-run the modes whose baselines were fixed AFTER
# the first artifact sweep (epoch-weighted hf-practice, MoE OOM ladder,
# vision/tts baselines) plus the new longctx mode. One TPU job at a time.
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
run_mode longctx longctx 5400
run_mode vision  vision  3600
run_mode tts     tts     3600
echo DONE
