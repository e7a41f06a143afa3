#!/bin/bash
# Round-5 queue A: cond-elimination A/B + MFU baseline.
#   1. baseline re-measure (now with MFU/FLOPs fields)
#   2. OPENPCSEG_PALLAS_STRICT=1 (no per-conv lax.cond; NaN-poison guard)
#   3. strict + trace for the updated per-source breakdown
set -uo pipefail
cd "$(dirname "$0")/../.."
LOG=${LOG:-logs/tpu_queue_r05a.log}
mkdir -p logs

run_bench () {
  local name=$1; shift
  echo "=== bench $name env=[$*] $(date +%T) ===" | tee -a "$LOG"
  env "$@" timeout 2400 python bench.py 2>&1 | grep -v -e WARNING -e landlock | tee -a "$LOG"
  echo "--- bench $name exit=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

run_bench baseline-mfu
run_bench strict OPENPCSEG_PALLAS_STRICT=1
rm -rf /tmp/trace_strict
run_bench strict-trace OPENPCSEG_PALLAS_STRICT=1 BENCH_PROFILE=/tmp/trace_strict
echo "=== self-time strict ===" | tee -a "$LOG"
python tools/perf/source_buckets.py /tmp/trace_strict 4 30 2>&1 | tee -a "$LOG"
echo "=== queue-a done $(date +%T) ===" | tee -a "$LOG"

run_bench group3 OPENPCSEG_PALLAS_GROUP=3
run_bench group3-strict OPENPCSEG_PALLAS_GROUP=3 OPENPCSEG_PALLAS_STRICT=1
echo "=== queue-a+ done $(date +%T) ===" | tee -a "$LOG"
