#!/bin/sh
# Round-4 recovery pass — the host restarted mid-r4d and wiped the
# compile cache; re-run the artifacts that were lost, cheapest/most
# valuable first. One TPU job at a time.
set -x
OUT=bench_artifacts/r4

run_mode() {
    name=$1; model=$2; t=$3
    # a restored first-pass artifact with vs_baseline null still needs
    # its baseline re-run (ADVICE r4) — only skip complete artifacts
    if grep -q '"metric"' "$OUT/$name.json" 2>/dev/null \
        && ! grep -q '"value": null' "$OUT/$name.json" \
        && ! grep -q '"vs_baseline": null' "$OUT/$name.json"; then
        echo "skip $name (artifact exists)"; return
    fi
    BENCH_MODEL=$model timeout "$t" python bench.py \
        > "$OUT/$name.json.new" 2> "$OUT/$name.err.new"
    if grep -q '"metric"' "$OUT/$name.json.new" 2>/dev/null \
        && ! grep -q '"value": null' "$OUT/$name.json.new"; then
        mv "$OUT/$name.json.new" "$OUT/$name.json"
        mv "$OUT/$name.err.new" "$OUT/$name.err"
    else
        rm -f "$OUT/$name.json.new" "$OUT/$name.err.new"
    fi
}

# llama first and UNCONDITIONALLY: the restart wiped the persistent
# compile cache, and the driver's end-of-round bench run (which writes
# BENCH_r04.json) would otherwise pay 10-25 min cold flash compiles and
# risk its timeout. This run re-warms the cache; the artifact is only
# replaced if the fresh run succeeds.
BENCH_MODEL=llama timeout 7200 python bench.py \
    > "$OUT/llama.json.new" 2> "$OUT/llama.err.new"
if grep -q '"metric"' "$OUT/llama.json.new" 2>/dev/null \
    && ! grep -q '"value": null' "$OUT/llama.json.new"; then
    mv "$OUT/llama.json.new" "$OUT/llama.json"
    mv "$OUT/llama.err.new" "$OUT/llama.err"
else
    rm -f "$OUT/llama.json.new"
fi

run_mode embed_tpu embed_tpu 2400
run_mode vision    vision    4200
run_mode tts       tts       4200
run_mode longctx   longctx   5400
echo DONE
