#!/bin/bash
# Round-4 third on-chip sequence (serial — ONE process on the chip; no
# concurrent CPU-heavy host jobs during measurement):
#   1. stage-2 full-width train step (BASELINE config 5) — now with chunked
#      motion-FF backward + chunked 8-bit Adam update on top of r4b's
#      motion remat_inner + sliced temporal backward (r4b datapoint:
#      OOM 17.07G vs 15.75G; the two chunking fixes target the measured
#      ~960 MB FF-backward peak and ~780 MB optimizer-dequant overlap).
#   2+3. ref-KV-hoist A/B on the exact path (VERDICT item 2).
#   4. true end-to-end product timing (VERDICT item 3): reference example
#      assets, exact profile, audio trimmed to 8 s.
#   5. speed/quality matrix with error bars (VERDICT item 5): 3 init seeds
#      at 512² and 256².
set -u
cd /root/repo
RES=/tmp/r4_results3.jsonl
log() { echo "[r4-measure3 $(date +%H:%M:%S)] $*" >&2; }

run_stage() {
  local name="$1"; shift
  log "START $name"
  if timeout 9000 "$@" >/tmp/r4c_${name}.json 2>/tmp/r4c_${name}.log; then
    log "DONE $name: $(tail -c 400 /tmp/r4c_${name}.json)"
    tail -1 /tmp/r4c_${name}.json >> "$RES"
  else
    log "FAIL $name rc=$? (see /tmp/r4c_${name}.log)"
    echo "{\"stage\": \"${name}\", \"failed\": true}" >> "$RES"
    return 1
  fi
}

: > "$RES"
if ! run_stage train_step python scripts/bench_train_step.py; then
  if grep -q "Ran out of memory" /tmp/r4c_train_step.log; then
    log "train_step OOM (deterministic) — skipping retry"
  else
    log "train_step retry (transient worker-crash rule)"
    sleep 120
    run_stage train_step_retry python scripts/bench_train_step.py
  fi
fi
run_stage bench_hoist1 env HALLO_BENCH_FAST=0 HALLO_HOIST_REF_KV=1 python bench.py
run_stage bench_hoist0 env HALLO_BENCH_FAST=0 HALLO_HOIST_REF_KV=0 python bench.py
run_stage e2e_exact env HALLO_E2E_MAX_AUDIO_S=8 python scripts/bench_e2e.py --profile exact
run_stage eval_matrix env HALLO_EVAL_SEEDS=0,1,2 HALLO_EVAL_SIZES=512,256 \
  python scripts/eval_cache_quality.py
log "ALL DONE"
cat "$RES"
