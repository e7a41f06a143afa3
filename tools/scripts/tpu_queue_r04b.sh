#!/bin/bash
# Round-4 TPU queue, part 2: the golden runs that died with the prior
# session (rpvnet, cenet) + merge. Serial; survives session death via
# setsid/nohup at the call site.
set -u -o pipefail
cd "$(dirname "$0")/../.."
log() { echo "=== $* $(date -u +%H:%M:%S) ==="; }

for m in rpvnet cenet; do
  log "golden $m"
  timeout 5400 python tools/scripts/golden_run.py --model "$m" \
    --steps "${GOLDEN_STEPS:-800}" --eval_every "${GOLDEN_EVAL_EVERY:-100}" \
    --out "GOLDEN_r04_${m}.json" 2>&1 | tail -24
  echo "--- golden $m exit=$? ---"
done
python - << 'PY'
import json
merged, missing = {}, []
for m in ["minkunet", "spvcnn", "cylinder", "rpvnet", "cenet"]:
    f = f"GOLDEN_r04_{m}.json"
    try:
        with open(f) as fh:
            merged[m] = json.load(fh)
    except FileNotFoundError:
        missing.append(m)
with open("GOLDEN_r04.json", "w") as fh:
    json.dump(merged, fh, indent=1)
print("merged ->", "GOLDEN_r04.json", list(merged),
      ("MISSING: " + ", ".join(missing)) if missing else "all present")
PY
log "queue-b done"
