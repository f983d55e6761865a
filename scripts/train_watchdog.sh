#!/bin/bash
# Supervise a pretrain run against axon-relay hangs: the failure mode is a
# live process whose device call never returns — metrics.jsonl stops aging
# while the PID stays up. The watchdog owns the training process (kills ONLY
# its own child, the python process itself — no timeout wrapper, which would
# orphan it) and resumes from the newest VALID iter-* checkpoint.
#
# Usage: TARGET_ITER=8000 bash scripts/train_watchdog.sh <out_dir> -- python pretrain/... args
set -u
OUT=$1; shift
[ "$1" = "--" ] && shift
# STALL_S must exceed the LONGEST legitimate metrics silence, which is the
# FIRST eval+checkpoint boundary (fresh eval-step compile + full optimizer
# state save — measured 330-350s at 0.44B on v5e; it killed two healthy runs
# at 300s). Checkpoint saves land only at that boundary, so a kill there can
# leave no resumable checkpoint and restart the run from scratch.
STALL_S=${STALL_S:-900}       # no metrics progress for this long = hung
GRACE_S=${GRACE_S:-900}       # startup budget: resume load + compile + first step
MAX_CHILD_S=${MAX_CHILD_S:-18000}
TARGET_ITER=${TARGET_ITER:-0} # completion = metrics reaches this iter (0: final/ only)

log() { echo "watchdog: $* $(date -u +%H:%M:%S)" >> "$OUT/watchdog.log"; }

# NOTE: completion is final/ ONLY. Round 5 learned the hard way that keying
# done on the metrics iter kills the child DURING its final eval+checkpoint
# save (the last metrics line lands minutes before final/ does), losing the
# run's tail. TARGET_ITER now only caps how long we let a child that has
# REACHED the target keep running without producing final/ (grace below).
done_yet() {
  [ -d "$OUT/final" ]
}

target_reached() {
  if [ "$TARGET_ITER" -gt 0 ] && [ -f "$OUT/metrics.jsonl" ]; then
    LAST=$(tail -5 "$OUT/metrics.jsonl" | sed -n 's/.*"iter": \([0-9]*\).*/\1/p' | sort -n | tail -1)
    [ -n "$LAST" ] && [ "$LAST" -ge $((TARGET_ITER - 1)) ] && return 0
  fi
  return 1
}

while :; do
  if done_yet; then
    log "complete"
    exit 0
  fi
  # newest VALID checkpoint only: a kill can land mid-save; manifest.json is
  # written last, so a dir without one is partial and must be skipped
  CK=$(
    for d in "$OUT"/iter-* "$OUT"/preempt-*; do
      [ -f "$d/manifest.json" ] || continue
      step=$(basename "$d" | tr -cd '0-9')
      echo "$step $d"
    done | sort -n -r | head -1 | cut -d' ' -f2
  )
  RESUME=()
  [ -n "$CK" ] && RESUME=(--resume "$CK")
  log "launching (resume=${CK:-none})"
  "$@" "${RESUME[@]}" >> "$OUT/train_r4.log" 2>&1 &
  CHILD=$!
  LAUNCH=$(date +%s)
  TGT_T=
  while kill -0 "$CHILD" 2>/dev/null; do
    sleep 60
    NOW=$(date +%s)
    MT=$(stat -c %Y "$OUT/metrics.jsonl" 2>/dev/null || echo "$LAUNCH")
    REF=$(( MT > LAUNCH ? MT : LAUNCH ))  # progress clock starts at launch
    AGE=$(( NOW - REF ))
    LIMIT=$STALL_S
    [ "$MT" -le "$LAUNCH" ] && LIMIT=$GRACE_S  # still starting up
    if [ "$AGE" -gt "$LIMIT" ] || [ $(( NOW - LAUNCH )) -gt "$MAX_CHILD_S" ]; then
      log "stall ${AGE}s (limit ${LIMIT}s) — killing $CHILD"
      kill "$CHILD" 2>/dev/null
      sleep 10
      kill -9 "$CHILD" 2>/dev/null
      sleep 5
      break
    fi
    if done_yet; then
      # final/ exists: the run finished cleanly; let the child exit on its own
      log "final checkpoint present — waiting for child $CHILD to exit"
      wait "$CHILD" 2>/dev/null
      log "complete"
      exit 0
    fi
    if target_reached; then
      # the metrics hit the target but final/ hasn't landed: the child is in
      # its final eval+save (measured 330-350s at 0.44B). Give it a bounded
      # grace, then treat it as hung.
      TGT_T=${TGT_T:-$NOW}
      if [ $(( NOW - TGT_T )) -gt "${FINAL_GRACE_S:-900}" ]; then
        log "target reached but no final/ after $(( NOW - TGT_T ))s — killing $CHILD"
        kill "$CHILD" 2>/dev/null
        sleep 10
        kill -9 "$CHILD" 2>/dev/null
        break
      fi
    fi
  done
  wait "$CHILD" 2>/dev/null
done
