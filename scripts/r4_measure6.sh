#!/bin/bash
# Round-4 sixth on-chip sequence: A/B the compute-dtype norm affine
# (GroupNorm + LayerNorm normalize pass in bf16; f32 stats unchanged —
# layers.py HALLO_NORM_F32 escape). Serial, host idle during windows.
#   1. profile_step on the NEW default (norm affine in bf16): ms/step +
#      hlo_stats; compare against the r4_measure5 497.7 ms/step baseline
#      (same script, same shapes; old trace kept at /tmp/hallo_prof).
#   2. bench exact + fast on the new default: the headline A/B
#      (old: 0.7783 exact / 2.526 fast, warm-cache conditions).
#   3. quality guard: single-seed fast-profile row vs the NEW exact path
#      (PSNR/SSIM must stay in family with 28.6 dB / 0.983).
set -u
cd /root/repo
RES=/tmp/r4_results6.jsonl
log() { echo "[r4-measure6 $(date +%H:%M:%S)] $*" >&2; }

run_stage() {
  local name="$1"; shift
  log "START $name"
  if timeout 10800 "$@" >/tmp/r4f_${name}.json 2>/tmp/r4f_${name}.log; then
    log "DONE $name: $(tail -c 400 /tmp/r4f_${name}.json)"
    tail -1 /tmp/r4f_${name}.json >> "$RES"
  else
    log "FAIL $name rc=$? (see /tmp/r4f_${name}.log)"
    echo "{\"stage\": \"${name}\", \"failed\": true}" >> "$RES"
    return 1
  fi
}

: > "$RES"
run_stage profile_norm python scripts/profile_step.py --loops 4 --top 30 \
  --trace-dir /tmp/hallo_prof_norm
run_stage bench_norm env HALLO_BENCH_FAST=1 python bench.py
run_stage fast_quality env HALLO_EVAL_SEEDS=0 HALLO_EVAL_MODES=fast_unipc12 \
  python scripts/eval_cache_quality.py
log "ALL DONE"
cat "$RES"
