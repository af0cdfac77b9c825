#!/bin/bash
# Round-3 follow-up on-chip sequence: reruns of the stages that failed in
# r3_measure.sh — the transient worker crash on the headline bench, and the
# train-step OOM (now with mixed frozen-param bf16 + 8-bit Adam).
set -u
cd /root/repo
RES=/tmp/r3_results2.jsonl
log() { echo "[r3-measure2 $(date +%H:%M:%S)] $*" >&2; }

run_stage() {
  local name="$1"; shift
  log "START $name"
  if timeout 4000 "$@" >/tmp/r3b_${name}.json 2>/tmp/r3b_${name}.log; then
    log "DONE $name: $(tail -c 300 /tmp/r3b_${name}.json)"
    tail -1 /tmp/r3b_${name}.json >> "$RES"
  else
    log "FAIL $name rc=$? (see /tmp/r3b_${name}.log)"
    echo "{\"stage\": \"${name}\", \"failed\": true}" >> "$RES"
  fi
}

: > "$RES"
# 1. headline exact + fast profile (crashed transiently in r3_measure.sh;
#    compiles are now cached)
run_stage bench python bench.py
# 2. stage-2 full-width training step, mixed + 8-bit Adam (the OOM fix)
run_stage train_step python scripts/bench_train_step.py
# 3. A/B: XLA recompute backward at the same memory budget
run_stage train_step_xla_bwd env HALLO_FLASH_BWD=xla python scripts/bench_train_step.py
log "ALL DONE"
cat "$RES"
