#!/bin/bash
# Round-3 golden surrogate sweep (VERDICT r2 next-#3): sequential runs for
# the non-MinkUNet flagships, each writing GOLDEN_r03_<model>.json. Run ONE
# at a time (1 CPU core + 1 TPU; concurrent runs serialize and look hung).
set -u
cd "$(dirname "$0")/../.."
for m in minkunet spvcnn cylinder rpvnet cenet; do
  echo "=== golden $m $(date -u +%H:%M:%S) ==="
  timeout 5400 python tools/scripts/golden_run.py --model "$m" \
    --steps "${GOLDEN_STEPS:-800}" --eval_every 200 \
    --out "GOLDEN_r03_${m}.json" 2>&1 | tail -20
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
