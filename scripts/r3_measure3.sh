#!/bin/bash
# Round-3 third on-chip sequence: the stage-2 train step with the FIXED
# channel-aware flash-backward blocks (the C=640 scoped-VMEM OOM), then two
# exact-path bench reruns to bound run-to-run variance on the tunnel.
# Waits for r3_measure2.sh (and any pytest) to finish first — one process on
# the chip, and CPU contention inflates clip times ~20% (CLAUDE.md).
set -u
cd /root/repo
RES=/tmp/r3_results3.jsonl
log() { echo "[r3-measure3 $(date +%H:%M:%S)] $*" >&2; }

wait_pid_file() {
  local f="$1"
  [ -f "$f" ] || return 0
  local p
  p=$(cat "$f")
  while kill -0 "$p" 2>/dev/null; do sleep 20; done
}

wait_pid_file /tmp/r3m2.pid
wait_pid_file /tmp/r3_tests.pid
log "predecessors done"

run_stage() {
  local name="$1"; shift
  log "START $name"
  if timeout 4000 "$@" >/tmp/r3c_${name}.json 2>/tmp/r3c_${name}.log; then
    log "DONE $name: $(tail -c 300 /tmp/r3c_${name}.json)"
    tail -1 /tmp/r3c_${name}.json >> "$RES"
  else
    log "FAIL $name rc=$? (see /tmp/r3c_${name}.log)"
    echo "{\"stage\": \"${name}\", \"failed\": true}" >> "$RES"
  fi
}

: > "$RES"
# 1. stage-2 full-width training step, pallas backward with the VMEM fix
run_stage train_step python scripts/bench_train_step.py
# 2+3. exact-path headline, twice (no fast-profile recompile: measured at
#      2.17 fps already this round)
run_stage bench_a env HALLO_BENCH_FAST=0 python bench.py
run_stage bench_b env HALLO_BENCH_FAST=0 python bench.py
log "ALL DONE"
cat "$RES"
