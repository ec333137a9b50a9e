#!/bin/sh
# Round-4 final pass — run after run_benches_r4c.sh: the TPU embed mode
# and the contention-robust CPU embed re-measure. One job at a time.
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

run_mode embed_tpu embed_tpu 3600
mv $OUT/embed.json $OUT/embed.json.r4a 2>/dev/null
mv $OUT/embed.err  $OUT/embed.err.r4a  2>/dev/null
run_mode embed     embed     1800
echo DONE
