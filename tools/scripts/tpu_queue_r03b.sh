#!/bin/bash
# Round-3 session-3 trimmed TPU queue, run AFTER the kernel-decision benches
# (bench_sweep_r03.sh items 1-3). Skips the combined-env bench (the driver's
# end-of-round bench.py measures the flipped defaults) and prioritizes the
# batch-2 inversion check + golden convergence curves over the batch-4 point.
# Usage: BEST_ENV="OPENPCSEG_PALLAS_POLICY=auto" bash tpu_queue_r03b.sh
set -u
cd "$(dirname "$0")/../.."
log() { echo "=== $* $(date -u +%H:%M:%S) ==="; }

log "batch sweep BENCH_BATCH=2 (${BEST_ENV:-})"
env ${BEST_ENV:-} BENCH_BATCH=2 timeout 2400 python bench.py 2>&1 | tail -2

for m in spvcnn cylinder rpvnet cenet minkunet; do
  log "golden $m (${GOLDEN_STEPS:-600} steps)"
  timeout 3600 env ${BEST_ENV:-} python tools/scripts/golden_run.py \
    --model "$m" --steps "${GOLDEN_STEPS:-600}" --eval_every 150 \
    --n_train 96 --out "GOLDEN_r03_${m}.json" 2>&1 | tail -8
  echo "=== done $m exit=$? ==="
done

python - << 'PY'
import json, glob
merged = {}
for f in sorted(glob.glob("GOLDEN_r03_*.json")):
    with open(f) as fh:
        merged[f.split("_")[-1].split(".")[0]] = json.load(fh)
with open("GOLDEN_r03.json", "w") as fh:
    json.dump(merged, fh, indent=1)
print("merged ->", "GOLDEN_r03.json", list(merged))
PY
log "queue done"
