#!/bin/bash
# Round-4 fifth on-chip sequence (serial — ONE process on the chip; host
# stays idle during measured windows). Runs AFTER the r4_measure4 eval
# matrix finishes:
#   1. bench exact with HALLO_FUSED_UPSAMPLE=0: identical program to the
#      r4_measure4 hoist0 run (jax_cache-warm, compile ~0) — re-confirms
#      the 0.776 baseline in THIS session's conditions.
#   2. bench exact + fast (unipc@12+cfg3) with the fused low-res upsample
#      conv ON (the new default): the A/B and the BENCH_r04 numbers.
#   3. profile_step on the new program: fresh hlo_stats breakdown (locates
#      the remaining HBM-bound fusions).
#   4. turbo_unipc12 quality row (the new --profile turbo definition),
#      single seed, via the eval-matrix mode filter.
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
run_stage bench_noufuse env HALLO_BENCH_FAST=0 HALLO_FUSED_UPSAMPLE=0 python bench.py
run_stage bench_full env HALLO_BENCH_FAST=1 python bench.py
run_stage profile_step python scripts/profile_step.py --loops 4 --top 30
run_stage turbo_row env HALLO_EVAL_SEEDS=0 HALLO_EVAL_MODES=turbo_unipc12 \
  python scripts/eval_cache_quality.py
log "ALL DONE"
cat "$RES"
