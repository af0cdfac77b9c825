#!/bin/bash
# Round-4 fifth on-chip sequence (serial — ONE process on the chip; host
# stays idle during measured windows). Runs AFTER the r4_measure4 eval
# matrix finishes:
#   1. profile_step: fresh hlo_stats breakdown of the exact denoiser step
#      (locates the HBM-bound fusions — the remaining <=12% kernel headroom).
#   2. bench exact + fast in one run (fast profile now unipc@12+cfg3 if the
#      matrix confirmed its dominance): the BENCH_r04 numbers.
set -u
cd /root/repo
RES=/tmp/r4_results5.jsonl
log() { echo "[r4-measure5 $(date +%H:%M:%S)] $*" >&2; }

run_stage() {
  local name="$1"; shift
  log "START $name"
  if timeout 10800 "$@" >/tmp/r4e_${name}.json 2>/tmp/r4e_${name}.log; then
    log "DONE $name: $(tail -c 400 /tmp/r4e_${name}.json)"
    tail -1 /tmp/r4e_${name}.json >> "$RES"
  else
    log "FAIL $name rc=$? (see /tmp/r4e_${name}.log)"
    echo "{\"stage\": \"${name}\", \"failed\": true}" >> "$RES"
    return 1
  fi
}

: > "$RES"
run_stage profile_step python scripts/profile_step.py --loops 4 --top 30
run_stage bench_full env HALLO_BENCH_FAST=1 python bench.py
log "ALL DONE"
cat "$RES"
