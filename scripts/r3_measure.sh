#!/bin/bash
# Serial on-chip measurement sequence for round 3 (VERDICT r2 items 1, 2, 6).
# ONE process may hold the chip — keep this the only TPU job and do NOT run
# CPU-heavy work (pytest, CPU compiles) concurrently (host dispatch starves,
# clip times inflate ~20% — CLAUDE.md).
set -u
cd /root/repo
RES=/tmp/r3_results.jsonl
log() { echo "[r3-measure $(date +%H:%M:%S)] $*" >&2; }

run_stage() {
  local name="$1"; shift
  log "START $name"
  if timeout 4000 "$@" >/tmp/r3_${name}.json 2>/tmp/r3_${name}.log; then
    log "DONE $name: $(tail -c 300 /tmp/r3_${name}.json)"
    tail -1 /tmp/r3_${name}.json >> "$RES"
  else
    log "FAIL $name rc=$? (see /tmp/r3_${name}.log)"
    echo "{\"stage\": \"${name}\", \"failed\": true}" >> "$RES"
  fi
}

: > "$RES"
# 1. headline: exact path + the named fast profile (dpm++2m@15 + cfg3) in one
#    run — this is exactly what the driver's round-end bench will execute, so
#    it also warms the compile cache for it.
run_stage bench python bench.py
# 2. MFU / ceiling quantification (reuses the bench-warmed clip compile)
run_stage mfu python scripts/mfu_report.py
# 3. BASELINE config 5: stage-2 full-width training step (Pallas flash bwd)
run_stage train_step python scripts/bench_train_step.py
# 4. A/B: XLA recompute backward (may OOM — that is the datum)
run_stage train_step_xla_bwd env HALLO_FLASH_BWD=xla python scripts/bench_train_step.py
# 5. BASELINE config 4: long-form batch-2 identities, pipelined sustained
run_stage bench_b2 env HALLO_BENCH_BATCH=2 HALLO_BENCH_FAST=0 python bench.py
# 6. quality audit incl. the fast-profile PSNR/SSIM-vs-exact row
run_stage eval_quality env HALLO_EVAL_THRESHOLDS=0.05,0.10 python scripts/eval_cache_quality.py
log "ALL DONE"
cat "$RES"
