#!/bin/bash
# Round-4 TPU queue, part 3: waits for part-b (golden rpvnet/cenet) to
# finish, then runs the next perf experiments:
#  - asymmetric conv policy (BLK up, WIN fixed): halves the per-item DMA
#    stall count at ~constant total one-hot MXU FLOPs — unlike the failed
#    'auto' 2x-both ladder whose FLOPs grew quadratically with WIN
#  - BENCH_DUP=1 batch scaling (same scan duplicated: clean per-scan A/B;
#    distinct generator scans differ ~1.4x in density)
set -u -o pipefail
cd "$(dirname "$0")/../.."
log() { echo "=== $* $(date -u +%H:%M:%S) ==="; }

log "part C waiting for GOLDEN_r04.json (part-b merge)"
while [ ! -f GOLDEN_r04.json ]; do sleep 30; done

bench() { # bench <label> [ENV=VAL ...]
  local label="$1"; shift
  log "bench $label env=[$*]"
  env "$@" timeout 2400 python bench.py 2>&1 | tail -3
  echo "--- bench $label exit=$? ---"
}

bench "policy_1024x512" OPENPCSEG_PALLAS_POLICY=1024:512
bench "policy_2048x512" OPENPCSEG_PALLAS_POLICY=2048:512
bench "dup_batch1" BENCH_DUP=1
bench "dup_batch2" BENCH_DUP=1 BENCH_BATCH=2
bench "dup_batch4" BENCH_DUP=1 BENCH_BATCH=4
log "queue-c done"
