#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r3 next-#1): serial, one python at
# a time (1 CPU core + 1 TPU; concurrent runs serialize and look hung).
#
# Phase A: kernel-policy A-Bs + batch sweep w/ profile traces.
# Phase B: 5-flagship golden surrogate sweep (GOLDEN_r04_<model>.json).
#
# ADVICE r3 fixes: pipefail so timeouts/crashes are not masked by tail;
# stale GOLDEN files removed before the loop; per-run env recorded.
set -u -o pipefail
cd "$(dirname "$0")/../.."
log() { echo "=== $* $(date -u +%H:%M:%S) ==="; }

bench() { # bench <label> [ENV=VAL ...]
  local label="$1"; shift
  log "bench $label env=[$*]"
  env "$@" timeout 2400 python bench.py 2>&1 | tail -3
  echo "--- bench $label exit=$? ---"
}

log "phase A: kernel A-Bs + batch sweep"
bench "policy_auto"  OPENPCSEG_PALLAS_POLICY=auto
bench "devox_pallas" OPENPCSEG_DEVOX_PALLAS=1
rm -rf /tmp/trace_b2 /tmp/trace_b1
bench "batch2_trace" BENCH_BATCH=2 BENCH_PROFILE=/tmp/trace_b2
bench "batch1_trace" BENCH_PROFILE=/tmp/trace_b1

log "phase B: golden sweep (5 flagships)"
rm -f GOLDEN_r04_*.json
for m in minkunet spvcnn cylinder rpvnet cenet; do
  log "golden $m"
  timeout 5400 python tools/scripts/golden_run.py --model "$m" \
    --steps "${GOLDEN_STEPS:-800}" --eval_every "${GOLDEN_EVAL_EVERY:-100}" \
    --out "GOLDEN_r04_${m}.json" 2>&1 | tail -24
  echo "--- golden $m exit=$? ---"
done
python - << 'PY'
import json, glob
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
log "queue done"
