#!/bin/bash
# Round-5 first on-chip sequence (serial — ONE process on the chip; host
# stays idle during measured windows). Runs AFTER the CPU/tiny pre-screen
# (scripts/sweep_fast_profile.py) picked the logsnr rho.
#   1. r5 candidate quality matrix at 512², seeds {0,1,2}: the r4 legacy
#      fast row (continuity anchor) + the four r5 rows (adaptive mask,
#      guidance tail, logsnr schedule, composed) vs the 40-step exact path.
# The winner becomes --profile fast; bench.py then measures it in a second
# sequence (r5_measure2) so BENCH_r05 carries exact + new-fast numbers.
set -u
cd /root/repo
RES=/tmp/r5_results1.jsonl
log() { echo "[r5-measure1 $(date +%H:%M:%S)] $*" >&2; }

run_stage() {
  local name="$1"; shift
  log "START $name"
  if timeout 14400 "$@" >/tmp/r5e_${name}.json 2>/tmp/r5e_${name}.log; then
    log "DONE $name: $(tail -c 400 /tmp/r5e_${name}.json)"
    tail -1 /tmp/r5e_${name}.json >> "$RES"
  else
    log "FAIL $name rc=$? (see /tmp/r5e_${name}.log)"
    echo "{\"stage\": \"${name}\", \"failed\": true}" >> "$RES"
    return 1
  fi
}

: > "$RES"
RHO="${HALLO_EVAL_RHO:-1.0}"
run_stage r5_matrix env \
  HALLO_EVAL_SEEDS=0,1,2 HALLO_EVAL_SIZES=512 \
  HALLO_EVAL_MODES=fast_unipc12_legacy,r5 HALLO_EVAL_RHO="$RHO" \
  python scripts/eval_cache_quality.py
log "ALL DONE"
cat "$RES"
