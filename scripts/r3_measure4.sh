#!/bin/bash
# Round-3 fourth on-chip sequence (serial — ONE process on the chip, no
# concurrent CPU-heavy jobs: host contention inflates clip times ~20%):
#   1. stage-2 full-width train step with NESTED per-layer remat
#      (UNetConfig.remat_inner — the 22.16G-vs-15.75G HBM OOM fix).
#   2. bench.py exact + fast profile, both now with the hoisted ref-KV
#      projections (A/B baselines: exact 0.7771 fps, fast 2.1666 fps).
#   3. bench_static.py (BASELINE config 2) with the hoist (baseline 0.915).
set -u
cd /root/repo
RES=/tmp/r3_results4.jsonl
log() { echo "[r3-measure4 $(date +%H:%M:%S)] $*" >&2; }

run_stage() {
  local name="$1"; shift
  log "START $name"
  if timeout 5000 "$@" >/tmp/r3d_${name}.json 2>/tmp/r3d_${name}.log; then
    log "DONE $name: $(tail -c 400 /tmp/r3d_${name}.json)"
    tail -1 /tmp/r3d_${name}.json >> "$RES"
  else
    log "FAIL $name rc=$? (see /tmp/r3d_${name}.log)"
    echo "{\"stage\": \"${name}\", \"failed\": true}" >> "$RES"
  fi
}

: > "$RES"
run_stage train_step python scripts/bench_train_step.py
run_stage bench python bench.py
run_stage bench_static python scripts/bench_static.py
log "ALL DONE"
cat "$RES"
