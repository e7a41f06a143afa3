#!/bin/bash
# Round-5 queue F: fixed-schedule golden sweep (VERDICT r4 #3 root cause).
# The pre-r5 protocol spent the ENTIRE run in LR warmup (golden_run.py
# iters_per_epoch=steps/total_epochs=1 with WARMUP_EPOCH=1): LR was maximal
# at the final eval and never decayed — root cause of the CENet +-8 tail
# swing and the range-model whole-class collapse oscillations. This sweep
# re-runs all 8 models x 2 seeds under the fixed protocol (10% linear
# warmup + cosine decay to ~0 by the last step) to establish the
# decision-grade acceptance thresholds in GOLDEN_r05_summary.json.
# Runs AFTER tpu_queue_r05e.sh (one TPU process at a time).
set -uo pipefail
cd "$(dirname "$0")/../.."
LOG=${LOG:-logs/tpu_queue_r05f.log}
mkdir -p logs

wait_for () {
  while [ -f "$1" ] && kill -0 "$(cat "$1")" 2>/dev/null; do sleep 60; done
}

run_golden () {
  local out=$1; shift
  echo "=== golden $out args=[$*] $(date +%T) ===" | tee -a "$LOG"
  timeout 2400 python tools/scripts/golden_run.py --steps 800 \
    --eval_every 100 --warmup_frac 0.1 --out "$out" "$@" 2>&1 \
    | grep -vE "WARNING|landlock" | tail -6 | tee -a "$LOG"
  echo "--- golden $out exit=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

wait_for /tmp/r05d.pid
wait_for /tmp/r05e.pid

# range models first (cheap, and they are the noisy ones the fix targets)
for m in cenet fidnet rangenet salsanext; do
  for s in 0 1; do
    run_golden GOLDEN_r05f_${m}_s${s}.json --model "$m" --seed "$s"
  done
done
for m in minkunet spvcnn cylinder rpvnet; do
  for s in 0 1; do
    run_golden GOLDEN_r05f_${m}_s${s}.json --model "$m" --seed "$s"
  done
done
echo "=== queue-f done $(date +%T) ===" | tee -a "$LOG"
