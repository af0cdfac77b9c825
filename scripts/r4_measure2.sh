#!/bin/bash
# Round-4 second on-chip sequence (serial — ONE process on the chip, no
# concurrent CPU-heavy jobs: host contention inflates clip times ~20%).
# Runs AFTER the motion remat_inner + sliced-temporal-backward OOM fixes:
#   1. stage-2 full-width train step (BASELINE config 5). r4a datapoint:
#      OOM 17.48G vs 15.75G with top temps = motion-FF GEGLU (320M) and
#      lane-padded temporal q/k/v copies — exactly what the fixes target.
#      Retried once (transient worker-crash rule, CLAUDE.md r3).
#   2+3. ref-KV-hoist A/B on the exact path (VERDICT item 2):
#      HALLO_HOIST_REF_KV=1 then =0, same session, uncontended host.
set -u
cd /root/repo
RES=/tmp/r4_results2.jsonl
log() { echo "[r4-measure2 $(date +%H:%M:%S)] $*" >&2; }

run_stage() {
  local name="$1"; shift
  log "START $name"
  if timeout 5400 "$@" >/tmp/r4b_${name}.json 2>/tmp/r4b_${name}.log; then
    log "DONE $name: $(tail -c 400 /tmp/r4b_${name}.json)"
    tail -1 /tmp/r4b_${name}.json >> "$RES"
  else
    log "FAIL $name rc=$? (see /tmp/r4b_${name}.log)"
    echo "{\"stage\": \"${name}\", \"failed\": true}" >> "$RES"
    return 1
  fi
}

: > "$RES"
if ! run_stage train_step python scripts/bench_train_step.py; then
  if grep -q "Ran out of memory" /tmp/r4b_train_step.log; then
    # OOM is a deterministic compile error — retrying wastes ~20 min of
    # chip (measured r4b: the retry OOM'd identically).
    log "train_step OOM (deterministic) — skipping retry"
  else
    log "train_step retry (transient worker-crash rule)"
    sleep 120
    run_stage train_step_retry python scripts/bench_train_step.py
  fi
fi
run_stage bench_hoist1 env HALLO_BENCH_FAST=0 HALLO_HOIST_REF_KV=1 python bench.py
run_stage bench_hoist0 env HALLO_BENCH_FAST=0 HALLO_HOIST_REF_KV=0 python bench.py
log "ALL DONE"
cat "$RES"
