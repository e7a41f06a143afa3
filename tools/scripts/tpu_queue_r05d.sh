#!/bin/bash
# Round-5 queue D: make the golden gate decision-grade (VERDICT r4 #3).
#   1. Second seed for the 5 flagships (mean +- spread bands; seed-0 curves
#      are GOLDEN_r04_*.json, backfilled with the data-derived GT-present
#      denominator in golden_fix_denominator.py).
#   2. First golden curves for the 3 uncovered range models (fidnet,
#      rangenet, salsanext), two seeds each (they are cheap: ~200 s).
#   3. CENet instability probe: lr_scale 0.5 / 0.25 (the +-8 swing in the
#      r4 tail persists with the fixed metric, so it is a training
#      dynamic, not a denominator artifact).
set -uo pipefail
cd "$(dirname "$0")/../.."
LOG=${LOG:-logs/tpu_queue_r05d.log}
mkdir -p logs

run_golden () {
  local out=$1; shift
  echo "=== golden $out args=[$*] $(date +%T) ===" | tee -a "$LOG"
  timeout 2400 python tools/scripts/golden_run.py --steps 800 \
    --eval_every 100 --out "$out" "$@" 2>&1 \
    | grep -vE "WARNING|landlock" | tail -30 | tee -a "$LOG"
  echo "--- golden $out exit=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

for m in cenet fidnet rangenet salsanext; do
  run_golden GOLDEN_r05_${m}_s1.json --model "$m" --seed 1
done
for m in fidnet rangenet salsanext; do
  run_golden GOLDEN_r05_${m}_s0.json --model "$m" --seed 0
done
run_golden GOLDEN_r05_cenet_lr05.json --model cenet --seed 0 --lr_scale 0.5
run_golden GOLDEN_r05_cenet_lr025.json --model cenet --seed 0 --lr_scale 0.25

for m in minkunet spvcnn cylinder rpvnet; do
  run_golden GOLDEN_r05_${m}_s1.json --model "$m" --seed 1
done
echo "=== queue-d done $(date +%T) ===" | tee -a "$LOG"
