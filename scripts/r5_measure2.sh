#!/bin/bash
# Round-5 second on-chip sequence (serial; host idle during measured
# windows — run only after the full test suite finishes):
#   1. turbo sustained: bench.py with the turbo program (unipc@8 pure) as
#      the main metric, fast sub-measurement disabled.
#   2. unipc@20 nested-grid quality row: the near-lossless 2x option
#      (completes the measured speed/quality frontier for the docs).
#   3. e2e product timing with --profile fast (updated seconds-per-1s).
#   4. hlo_stats of the fast-profile program (device-time composition).
set -u
cd /root/repo
RES=/tmp/r5_results2.jsonl
log() { echo "[r5-measure2 $(date +%H:%M:%S)] $*" >&2; }

run_stage() {
  local name="$1"; shift
  log "START $name"
  if timeout 10800 "$@" >/tmp/r5e2_${name}.json 2>/tmp/r5e2_${name}.log; then
    log "DONE $name: $(tail -c 400 /tmp/r5e2_${name}.json)"
    tail -1 /tmp/r5e2_${name}.json >> "$RES"
  else
    log "FAIL $name rc=$? (see /tmp/r5e2_${name}.log)"
    echo "{\"stage\": \"${name}\", \"failed\": true}" >> "$RES"
  fi
}

: > "$RES"
run_stage turbo_bench env HALLO_BENCH_FAST=0 HALLO_BENCH_SAMPLER=unipc \
  HALLO_BENCH_STEPS=8 python bench.py
run_stage unipc20_row env HALLO_EVAL_SEEDS=0,1,2 HALLO_EVAL_SIZES=512 \
  HALLO_EVAL_MODES=r5_unipc20 python scripts/eval_cache_quality.py
run_stage profile_fast python scripts/profile_step.py --loops 4 --top 20
log "ALL DONE"
cat "$RES"
