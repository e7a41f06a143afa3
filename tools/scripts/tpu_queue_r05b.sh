#!/bin/bash
# Round-5 queue B:
#   1. strict-mode diagnostic trace (conds gone -> conv internals visible
#      as separate leaf ops in the per-line breakdown)
#   2. per-scan-table batch sweep (BENCH_DUP dup-scan, batch 1/2/4):
#      target dup b2 per-scan throughput >= 0.97x b1 (VERDICT #2)
set -uo pipefail
cd "$(dirname "$0")/../.."
LOG=${LOG:-logs/tpu_queue_r05b.log}
mkdir -p logs

run_bench () {
  local name=$1; shift
  echo "=== bench $name env=[$*] $(date +%T) ===" | tee -a "$LOG"
  env "$@" timeout 2400 python bench.py 2>&1 | grep -v -e WARNING -e landlock | tee -a "$LOG"
  echo "--- bench $name exit=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

rm -rf /tmp/trace_strict_r05
run_bench strict-diag OPENPCSEG_PALLAS_STRICT=1 BENCH_PROFILE=/tmp/trace_strict_r05
echo "=== self-time strict (diagnostic) ===" | tee -a "$LOG"
python tools/perf/source_buckets.py /tmp/trace_strict_r05 4 40 2>&1 | tee -a "$LOG"

run_bench dup_b2_perscan BENCH_DUP=1 BENCH_BATCH=2
run_bench dup_b4_perscan BENCH_DUP=1 BENCH_BATCH=4
run_bench dup_b2_summed BENCH_DUP=1 BENCH_BATCH=2 OPENPCSEG_PER_SCAN=0
echo "=== queue-b done $(date +%T) ===" | tee -a "$LOG"
