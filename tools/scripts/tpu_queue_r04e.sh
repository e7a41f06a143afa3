#!/bin/bash
# Round-4 queue E: trace the BENCH_DUP batch sweep to root-cause the
# ~8%/18% super-linear per-scan regression at batch 2/4 (BASELINE.md).
# Captures a 4-step device trace per batch size and prints the per-source
# SELF-time breakdown right away so a tunnel outage can't eat the analysis.
set -uo pipefail
cd "$(dirname "$0")/../.."
LOG=${LOG:-tpu_queue_r04e.log}

run_bench () {
  local name=$1; shift
  echo "=== bench $name env=[$*] $(date +%T) ===" | tee -a "$LOG"
  env "$@" timeout 2400 python bench.py 2>&1 | grep -v -e WARNING -e "landlock" | tee -a "$LOG"
  local code=${PIPESTATUS[0]}
  echo "--- bench $name exit=$code ---" | tee -a "$LOG"
}

for b in 1 2 4; do
  rm -rf "/tmp/trace_dup_b$b"
  run_bench "dup_b$b-trace" BENCH_DUP=1 BENCH_BATCH=$b BENCH_PROFILE=/tmp/trace_dup_b$b
  echo "=== self-time dup_b$b ===" | tee -a "$LOG"
  python tools/perf/source_buckets.py "/tmp/trace_dup_b$b" 4 30 2>&1 | tee -a "$LOG"
done
echo "=== queue-e done $(date +%T) ===" | tee -a "$LOG"
