#!/bin/bash
# Serving A/B matrix at 32 slots (re-run when kernels/models/toolchain change).
# Usage: bash scripts/sweep_serving.sh [n_requests]
#
# Round-4 measured results (TPU v5e, 7B int4, S=256, 128 mixed requests):
#   A. pure XLA                      685 tok/s
#   D. fused + pipelined-vpu         837 tok/s   <- shipping default
#   E. fused + pipelined-MXU         666 tok/s
# The attention-kernel A/B only exists inside the FUSED serving path: the
# engine packs the cache (uint32 bf16 pairs) only when the batched block
# kernels are on, and the write+attention kernels require the packed layout.
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
run "B. shipping default (fused blocks + pipelined-vpu attention)" \
  LIT_LLAMA_TPU_SERVE_ATTN=pipelined_vpu
run "C. fused blocks + manual (r3) attention" \
  LIT_LLAMA_TPU_SERVE_ATTN=manual
run "D. fused blocks + pipelined-MXU attention" \
  LIT_LLAMA_TPU_SERVE_ATTN=pipelined
run "E. B + arith nibble decode in the block kernels" \
  LIT_LLAMA_TPU_SERVE_ATTN=pipelined_vpu LIT_LLAMA_TPU_UNPACK=arith
