#!/bin/bash
# Round-4 serving A/B matrix at 32 slots (CHIP_RUNBOOK.md #4).
# Usage: bash scripts/sweep_serving.sh [n_requests]
#
# The attention-kernel A/B only exists inside the FUSED serving path: the
# engine packs the cache (uint32 bf16 pairs) only when the batched block
# kernels are on, and the write+attention kernels require the packed layout —
# so every attention variant runs with SERVE_KERNEL_MAX_B=64 (kernels on at
# B=32), against the two kernel-free baselines.
set -u
N=${1:-128}
COMMON="--max_batch 32 --n_requests $N --mixed_prompts true --max_seq_length 256"

run() {
  local label="$1"; shift
  echo "=== $label ==="
  timeout 2400 env "$@" python scripts/bench_serving.py $COMMON 2>&1 \
    | grep -E "continuous batching|Error|EXCEPTION" | tail -2
}

run "A. pure XLA (no serving kernels)" LIT_LLAMA_TPU_SERVE_KERNEL=0
run "B. shipping default (MAX_B=16: XLA path at 32 slots)" \
  LIT_LLAMA_TPU_SERVE_ATTN=pipelined
run "C. fused blocks + manual (r3) attention" \
  LIT_LLAMA_TPU_SERVE_KERNEL_MAX_B=64 LIT_LLAMA_TPU_SERVE_ATTN=manual
run "D. fused blocks + pipelined-vpu attention" \
  LIT_LLAMA_TPU_SERVE_KERNEL_MAX_B=64 LIT_LLAMA_TPU_SERVE_ATTN=pipelined_vpu
run "E. fused blocks + pipelined-MXU attention" \
  LIT_LLAMA_TPU_SERVE_KERNEL_MAX_B=64 LIT_LLAMA_TPU_SERVE_ATTN=pipelined
run "F. E + arith nibble decode in the block kernels" \
  LIT_LLAMA_TPU_SERVE_KERNEL_MAX_B=64 LIT_LLAMA_TPU_SERVE_ATTN=pipelined \
  LIT_LLAMA_TPU_UNPACK=arith
