#!/bin/bash
# Round-4 fourth on-chip sequence (serial — ONE process on the chip; no
# concurrent CPU-heavy host jobs during measurement). The config-5 train
# step landed in r4_measure3 (1.891 s/step, BASELINE.md); this sequence
# finishes the round's remaining measured deliverables:
#   1+2. ref-KV-hoist A/B on the exact path (VERDICT item 2):
#        HALLO_HOIST_REF_KV=1 then =0, same session, uncontended host.
#   3. true end-to-end product timing (VERDICT item 3): reference example
#      assets, exact profile, audio trimmed to 8 s.
#   4. speed/quality matrix with error bars (VERDICT item 5): 3 init seeds
#      at 512^2 and 256^2 (seeds reuse compiles; sizes each pay one).
set -u
cd /root/repo
RES=/tmp/r4_results4.jsonl
log() { echo "[r4-measure4 $(date +%H:%M:%S)] $*" >&2; }

run_stage() {
  local name="$1"; shift
  log "START $name"
  if timeout 10800 "$@" >/tmp/r4d_${name}.json 2>/tmp/r4d_${name}.log; then
    log "DONE $name: $(tail -c 400 /tmp/r4d_${name}.json)"
    tail -1 /tmp/r4d_${name}.json >> "$RES"
  else
    log "FAIL $name rc=$? (see /tmp/r4d_${name}.log)"
    echo "{\"stage\": \"${name}\", \"failed\": true}" >> "$RES"
    return 1
  fi
}

: > "$RES"
run_stage bench_hoist1 env HALLO_BENCH_FAST=0 HALLO_HOIST_REF_KV=1 python bench.py
run_stage bench_hoist0 env HALLO_BENCH_FAST=0 HALLO_HOIST_REF_KV=0 python bench.py
run_stage e2e_exact env HALLO_E2E_MAX_AUDIO_S=8 python scripts/bench_e2e.py --profile exact
run_stage eval_matrix env HALLO_EVAL_SEEDS=0,1,2 HALLO_EVAL_SIZES=512,256 \
  python scripts/eval_cache_quality.py
log "ALL DONE"
cat "$RES"
