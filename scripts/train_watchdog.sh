#!/bin/bash
# Supervise a pretrain run against axon-relay hangs: the failure mode is a
# live process whose device call never returns — metrics.jsonl stops aging
# while the PID stays up. The watchdog owns the training process (kills ONLY
# its own child) and resumes from the newest iter-* checkpoint.
# Usage: bash scripts/train_watchdog.sh <out_dir> -- <pretrain args...>
set -u
OUT=$1; shift
[ "$1" = "--" ] && shift
STALL_S=${STALL_S:-300}

while :; do
  if [ -d "$OUT/final" ]; then
    echo "watchdog: $OUT/final exists — training complete" >> "$OUT/watchdog.log"
    exit 0
  fi
  CK=$(ls -d "$OUT"/iter-* 2>/dev/null | sort | tail -1)
  RESUME=()
  [ -n "$CK" ] && RESUME=(--resume "$CK")
  echo "watchdog: launching (resume=${CK:-none}) $(date -u +%H:%M:%S)" >> "$OUT/watchdog.log"
  timeout 18000 python "$@" "${RESUME[@]}" >> "$OUT/train_r4.log" 2>&1 &
  CHILD=$!
  sleep 180  # compile + first steps
  while kill -0 "$CHILD" 2>/dev/null; do
    sleep 60
    AGE=$(( $(date +%s) - $(stat -c %Y "$OUT/metrics.jsonl" 2>/dev/null || echo 0) ))
    if [ "$AGE" -gt "$STALL_S" ]; then
      echo "watchdog: stall ${AGE}s — killing $CHILD $(date -u +%H:%M:%S)" >> "$OUT/watchdog.log"
      kill "$CHILD" 2>/dev/null
      sleep 10
      kill -9 "$CHILD" 2>/dev/null
      sleep 5
      break
    fi
  done
  wait "$CHILD" 2>/dev/null
done
