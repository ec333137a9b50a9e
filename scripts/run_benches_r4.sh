#!/bin/sh
# Round-4 bench sequence — every driver config, one TPU job at a time
# (the tunnel serializes compiles), writing the committed artifacts the
# r3 VERDICT asked for (#2: any number quoted in STATUS.md must exist as
# a file) into bench_artifacts/r4/. Resume-friendly: a mode whose .json
# already contains a "metric" line is skipped.
set -x
OUT=bench_artifacts/r4
mkdir -p $OUT

run_mode() {
    name=$1; model=$2; t=$3
    if grep -q '"metric"' "$OUT/$name.json" 2>/dev/null; then
        echo "skip $name (artifact exists)"; return
    fi
    BENCH_MODEL=$model timeout "$t" python bench.py \
        > "$OUT/$name.json" 2> "$OUT/$name.err"
}

# headline llama (full depth + measured hf-practice + dense baselines)
run_mode llama   llama   5400
# gpt-oss MoE QLoRA with the dequantize+gmm baseline
run_mode gpt_oss gpt_oss 3600
# GRPO rollout + step
run_mode grpo    grpo    3600
# vision (Qwen2.5-VL-class)
run_mode vision  vision  3600
# whisper / tts / serving decode / speculative
run_mode whisper whisper 2400
run_mode tts     tts     2400
run_mode decode  decode  2400
run_mode spec    spec    2400
# embedding fine-tune (MiniLM-class ST MNRL)
run_mode embed   embed   2400
# CPU LoRA with the MEASURED HF+PEFT baseline (runs on host CPU)
run_mode cpu_lora cpu_lora 3600

echo DONE
