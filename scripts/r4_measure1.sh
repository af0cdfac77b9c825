#!/bin/bash
# Round-4 first on-chip sequence (serial — ONE process on the chip, no
# concurrent CPU-heavy jobs: host contention inflates clip times ~20%):
#   1. stage-2 full-width train step (BASELINE config 5) with nested
#      per-layer remat + mixed frozen-bf16 + 8-bit Adam — the r3-verdict
#      headline deliverable (last on-chip datapoint: OOM 22.16G vs 15.75G).
#      Retried once: the TPU worker can crash transiently on a first big
#      dispatch (CLAUDE.md r3) — a retry distinguishes that from real OOM.
#   2+3. ref-KV-hoist A/B on the exact path (VERDICT item 2): bench.py
#      exact-only with HALLO_HOIST_REF_KV=1 then =0, same session.
set -u
cd /root/repo
RES=/tmp/r4_results1.jsonl
log() { echo "[r4-measure1 $(date +%H:%M:%S)] $*" >&2; }

run_stage() {
  local name="$1"; shift
  log "START $name"
  if timeout 5400 "$@" >/tmp/r4a_${name}.json 2>/tmp/r4a_${name}.log; then
    log "DONE $name: $(tail -c 400 /tmp/r4a_${name}.json)"
    tail -1 /tmp/r4a_${name}.json >> "$RES"
  else
    log "FAIL $name rc=$? (see /tmp/r4a_${name}.log)"
    echo "{\"stage\": \"${name}\", \"failed\": true}" >> "$RES"
    return 1
  fi
}

: > "$RES"
run_stage train_step python scripts/bench_train_step.py \
  || { log "train_step retry (transient worker-crash rule)"; sleep 120; \
       run_stage train_step_retry python scripts/bench_train_step.py; }
run_stage bench_hoist1 env HALLO_BENCH_FAST=0 HALLO_HOIST_REF_KV=1 python bench.py
run_stage bench_hoist0 env HALLO_BENCH_FAST=0 HALLO_HOIST_REF_KV=0 python bench.py
log "ALL DONE"
cat "$RES"
