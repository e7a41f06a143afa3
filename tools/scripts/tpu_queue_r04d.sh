#!/bin/bash
# Round-4 TPU queue, part 4: waits for part-c, then
#  - A/B the new devoxelize window kernels (ops/pallas_devox.py)
#  - conv WIN sweep DOWN (one-hot dot FLOPs scale with WIN; coverage only
#    needs the per-block cluster spread, mean ~1.1 windows at 512)
#  - combined best
set -u -o pipefail
cd "$(dirname "$0")/../.."
log() { echo "=== $* $(date -u +%H:%M:%S) ==="; }

log "part D waiting for part-c"
while ! grep -q "queue-c done" tpu_queue_r04.log; do sleep 30; done

bench() { # bench <label> [ENV=VAL ...]
  local label="$1"; shift
  log "bench $label env=[$*]"
  env "$@" timeout 2400 python bench.py 2>&1 | tail -3
  echo "--- bench $label exit=$? ---"
}

bench "devox_pallas_v2" OPENPCSEG_DEVOX_PALLAS=1
bench "conv_win256" OPENPCSEG_PALLAS_WIN=256
bench "conv_win384" OPENPCSEG_PALLAS_WIN=384
bench "devox+win256" OPENPCSEG_DEVOX_PALLAS=1 OPENPCSEG_PALLAS_WIN=256
log "queue-d done"
