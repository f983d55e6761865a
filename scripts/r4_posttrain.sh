#!/bin/bash
# Round-4 post-pretrain chip sequence (run items strictly serially: ONE TPU
# process at a time). Usage: bash scripts/r4_posttrain.sh
set -u
cd /root/repo

echo "=== 1. quality ladder ==="
timeout 2700 python scripts/eval_quality.py \
  --ckpt_dir out/quality044/final --data_dir data/quality044 \
  --groupsize 128 --calib_block 1024 \
  --out_json out/quality044/ladder.json 2>&1 | grep -viE "warning|I0000"

echo "=== 2. arith unpack A/B (headline) ==="
LIT_LLAMA_TPU_UNPACK=arith timeout 3600 python bench.py 2>/tmp/bench_arith2.err
echo

echo "=== 3. 64-slot serving ==="
timeout 2400 python scripts/bench_serving.py --max_batch 64 --n_requests 192 \
  --mixed_prompts true --max_seq_length 256 2>&1 \
  | grep -E "continuous batching|Error|EXCEPTION" | tail -2

echo "=== 4. probes: tiny lm_head + smoke ==="
timeout 900 python scripts/probe_mosaic.py --case mv_small_n 2>&1 | tail -1
echo ALLDONE
