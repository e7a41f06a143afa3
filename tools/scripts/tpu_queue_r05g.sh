#!/bin/bash
# Round-5 queue G: final batch-sweep rows with the r5 kernel defaults
# (updown + devox pallas on): distinct-scan batch 2/4 — the rate a user of
# the shipped BATCH_SIZE_PER_GPU>=2 configs actually sees. Runs AFTER
# tpu_queue_r05f.sh (one TPU process at a time).
set -uo pipefail
cd "$(dirname "$0")/../.."
LOG=${LOG:-logs/tpu_queue_r05g.log}
mkdir -p logs

wait_for () {
  while [ -f "$1" ] && kill -0 "$(cat "$1")" 2>/dev/null; do sleep 60; done
}

run () {
  echo "=== $* $(date +%T) ===" | tee -a "$LOG"
  timeout 1500 "$@" 2>&1 | grep -vE "WARNING|landlock" | tail -3 \
    | tee -a "$LOG"
  echo "--- exit=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

wait_for /tmp/r05f.pid
run env BENCH_BATCH=2 python bench.py
run env BENCH_BATCH=4 python bench.py
echo "=== queue-g done $(date +%T) ===" | tee -a "$LOG"
