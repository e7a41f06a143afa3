#!/bin/bash
# Round-5 queue H: restart of the tail of queue F (machine restart killed
# it mid cylinder_s1) + queue G's batch-sweep benches. Finishes the
# fixed-schedule golden sweep (cylinder s1, rpvnet s0/s1) and then runs
# the distinct-scan batch 2/4 benches with the r5 kernel defaults.
set -uo pipefail
cd "$(dirname "$0")/../.."
LOG=${LOG:-logs/tpu_queue_r05h.log}
mkdir -p logs

run_golden () {
  local out=$1; shift
  echo "=== golden $out args=[$*] $(date +%T) ===" | tee -a "$LOG"
  timeout 2400 python tools/scripts/golden_run.py --steps 800 \
    --eval_every 100 --warmup_frac 0.1 --out "$out" "$@" 2>&1 \
    | grep -vE "WARNING|landlock" | tail -6 | tee -a "$LOG"
  echo "--- golden $out exit=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

run () {
  echo "=== $* $(date +%T) ===" | tee -a "$LOG"
  timeout 1500 "$@" 2>&1 | grep -vE "WARNING|landlock" | tail -3 \
    | tee -a "$LOG"
  echo "--- exit=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

run_golden GOLDEN_r05f_cylinder_s1.json --model cylinder --seed 1
run_golden GOLDEN_r05f_rpvnet_s0.json --model rpvnet --seed 0
run_golden GOLDEN_r05f_rpvnet_s1.json --model rpvnet --seed 1
run env BENCH_BATCH=2 python bench.py
run env BENCH_BATCH=4 python bench.py
echo "=== queue-h done $(date +%T) ===" | tee -a "$LOG"
