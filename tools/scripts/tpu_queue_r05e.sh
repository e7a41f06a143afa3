#!/bin/bash
# Round-5 queue E: downsample-sort elision A/B (VERDICT r4 #1a).
#   1. blocksort microprobe at the real level sizes/displacements.
#   2. bench.py A/B: defaults vs OPENPCSEG_BLOCKSORT=16384 (and 32768 if
#      16384 wins) — end-to-end is the decider, the probe only sizes blocks.
# Run AFTER tpu_queue_r05d.sh finishes (one TPU process at a time).
set -uo pipefail
cd "$(dirname "$0")/../.."
LOG=${LOG:-logs/tpu_queue_r05e.log}
mkdir -p logs

wait_for_tpu () {
  while [ -f /tmp/r05d.pid ] && kill -0 "$(cat /tmp/r05d.pid)" 2>/dev/null; do
    sleep 60
  done
}

run () {
  echo "=== $* $(date +%T) ===" | tee -a "$LOG"
  timeout 1500 "$@" 2>&1 | grep -vE "WARNING|landlock" | tail -20 \
    | tee -a "$LOG"
  echo "--- exit=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

wait_for_tpu
run python tools/perf/blocksort_probe.py
run python bench.py
run env OPENPCSEG_BLOCKSORT=16384 python bench.py
run env OPENPCSEG_BLOCKSORT=32768 python bench.py
echo "=== queue-e done $(date +%T) ===" | tee -a "$LOG"
