#!/bin/bash
# Round-4 serving A/B matrix at 32 slots (CHIP_RUNBOOK.md #4).
# Usage: bash scripts/sweep_serving.sh [n_requests]
# ONE TPU process at a time; each cell runs serially with a timeout.
set -u
N=${1:-128}
COMMON="--max_batch 32 --n_requests $N --mixed_prompts true --max_seq_length 256"

run() {
  local label="$1"; shift
  echo "=== $label ==="
  timeout 2400 env "$@" python scripts/bench_serving.py $COMMON 2>&1 \
    | grep -E "continuous batching|Error|EXCEPTION" | tail -2
}

run "XLA matmuls + pipelined-mxu attention (MAX_B=16 default)" \
  LIT_LLAMA_TPU_SERVE_ATTN=pipelined
run "XLA matmuls + pipelined-vpu attention" \
  LIT_LLAMA_TPU_SERVE_ATTN=pipelined_vpu
run "XLA matmuls + manual (r3) attention" \
  LIT_LLAMA_TPU_SERVE_ATTN=manual
run "fused block kernels + pipelined-mxu attention" \
  LIT_LLAMA_TPU_SERVE_ATTN=pipelined LIT_LLAMA_TPU_SERVE_KERNEL_MAX_B=64
run "fused block kernels (arith unpack) + pipelined-mxu" \
  LIT_LLAMA_TPU_SERVE_ATTN=pipelined LIT_LLAMA_TPU_SERVE_KERNEL_MAX_B=64 \
  LIT_LLAMA_TPU_UNPACK=arith
run "pure XLA (no serving kernels at all)" \
  LIT_LLAMA_TPU_SERVE_KERNEL=0
