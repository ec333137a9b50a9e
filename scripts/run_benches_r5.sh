#!/bin/bash
# Round-5 bench pass: run bench modes serially (ONE TPU job at a time),
# installing each artifact atomically only on success (a JSON line with
# "metric" and a non-null value). Usage: scripts/run_benches_r5.sh mode...
set -u
OUT=bench_artifacts/r5
mkdir -p "$OUT"

run_mode() {
  name="$1"; budget="${2:-3600}"
  echo "=== $name (budget ${budget}s) ==="
  BENCH_SUPERVISE=0 BENCH_MODEL="$name" timeout "$budget" \
    python bench.py > "$OUT/$name.json.new" 2> "$OUT/$name.err.new"
  rc=$?
  if [ $rc -eq 0 ] && grep -q '"metric"' "$OUT/$name.json.new" \
     && ! grep -q '"value": null' "$OUT/$name.json.new"; then
    mv "$OUT/$name.json.new" "$OUT/$name.json"
    mv "$OUT/$name.err.new" "$OUT/$name.err"
    echo "--- $name OK"
  else
    echo "--- $name FAILED rc=$rc (left as .new)"
    tail -3 "$OUT/$name.err.new" || true
  fi
}

for m in "$@"; do
  case "$m" in
    longctx|gpt_oss|grpo) run_mode "$m" 5400 ;;
    *) run_mode "$m" 3600 ;;
  esac
done
