#!/bin/bash
# Serial on-chip measurement sequence for round 2 (run when the TPU tunnel
# is healthy; each stage logs to /tmp and appends a JSON line to
# /tmp/r2_results.jsonl). ONE process may hold the chip — keep this the
# only TPU job, and do not run CPU-heavy work concurrently.
set -u
cd /root/repo
RES=/tmp/r2_results.jsonl
log() { echo "[r2-measure $(date +%H:%M:%S)] $*" >&2; }

run_stage() {
  local name="$1"; shift
  log "START $name"
  if timeout 3000 "$@" >/tmp/r2_${name}.json 2>/tmp/r2_${name}.log; then
    log "DONE $name: $(tail -c 200 /tmp/r2_${name}.json)"
    tail -1 /tmp/r2_${name}.json >> "$RES"
  else
    log "FAIL $name rc=$? (see /tmp/r2_${name}.log)"
    echo "{\"stage\": \"${name}\", \"failed\": true}" >> "$RES"
  fi
}

: > "$RES"
# 1. exact headline (validates the pipeline refactor didn't regress; warms
#    the compile cache for the driver's round-end bench run)
run_stage bench_exact python bench.py
# 2. stage-2 full-width training step (BASELINE config 5) with the Pallas
#    flash backward + frozen-module DCE
run_stage train_step python scripts/bench_train_step.py
# 3. train step with the XLA recompute backward for the A/B (may OOM — that
#    itself is the datum)
run_stage train_step_xla_bwd env HALLO_FLASH_BWD=xla python scripts/bench_train_step.py
# 4. CFG-uncond caching alone (exact steps, uncond every 3rd)
run_stage bench_cfg3 env HALLO_BENCH_CFG_STRIDE=3 python bench.py
# 5. dynamic cache + CFG cache composed
run_stage bench_dyn_cfg3 env HALLO_BENCH_STEP_CACHE=dynamic HALLO_BENCH_CFG_STRIDE=3 python bench.py
# 6. quality audit of the cache modes vs exact
run_stage eval_quality env HALLO_EVAL_THRESHOLDS=0.05,0.10 python scripts/eval_cache_quality.py
log "ALL DONE"
cat "$RES"
