#!/bin/sh
# Round-4 recovery pass — the host restarted mid-r4d and wiped the
# compile cache; re-run the artifacts that were lost, cheapest/most
# valuable first. One TPU job at a time.
set -x
OUT=bench_artifacts/r4

run_mode() {
    name=$1; model=$2; t=$3
    if grep -q '"metric"' "$OUT/$name.json" 2>/dev/null \
        && ! grep -q '"value": null' "$OUT/$name.json"; then
        echo "skip $name (artifact exists)"; return
    fi
    BENCH_MODEL=$model timeout "$t" python bench.py \
        > "$OUT/$name.json.new" 2> "$OUT/$name.err"
    if grep -q '"metric"' "$OUT/$name.json.new" 2>/dev/null; then
        mv "$OUT/$name.json.new" "$OUT/$name.json"
    else
        rm -f "$OUT/$name.json.new"
    fi
}

run_mode embed_tpu embed_tpu 2400
run_mode vision    vision    4200
run_mode tts       tts       4200
run_mode longctx   longctx   5400
echo DONE
