#!/bin/sh
# Round-3 bench sequence — run each driver config with long timeouts,
# one at a time (the tunnel serializes compiles), logging JSON lines.
set -x
OUT=/tmp/bench_r3
mkdir -p $OUT

# headline llama (full depth + baselines)
timeout 3000 python bench.py > $OUT/llama.json 2> $OUT/llama.err

# gpt-oss MoE QLoRA with the dequantize+gmm baseline
BENCH_MODEL=gpt_oss timeout 3000 python bench.py \
    > $OUT/gpt_oss.json 2> $OUT/gpt_oss.err

# GRPO (rollout + step, prefix-grouping vs TRL layout)
BENCH_MODEL=grpo timeout 3000 python bench.py \
    > $OUT/grpo.json 2> $OUT/grpo.err

# vision (Qwen2.5-VL-class)
BENCH_MODEL=vision timeout 3000 python bench.py \
    > $OUT/vision.json 2> $OUT/vision.err

# whisper + tts (faster configs)
BENCH_MODEL=whisper timeout 2400 python bench.py \
    > $OUT/whisper.json 2> $OUT/whisper.err
BENCH_MODEL=tts timeout 2400 python bench.py \
    > $OUT/tts.json 2> $OUT/tts.err

echo DONE
