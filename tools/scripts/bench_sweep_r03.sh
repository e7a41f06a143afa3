#!/bin/bash
# Round-3 TPU measurement queue: serial, one python at a time.
# (lives in-repo so a tunnel outage surviving the session does not lose the
# queue; see ROADMAP round-3 session-2 notes)
cd /root/repo
log() { echo "=== $* $(date -u +%H:%M:%S) ==="; }

log "bench baseline (current defaults)"
timeout 1800 python bench.py 2>&1 | tail -3

log "bench POLICY=auto (2x blk/win)"
OPENPCSEG_PALLAS_POLICY=auto timeout 2400 python bench.py 2>&1 | tail -3

log "bench DEVOX_PALLAS=1"
OPENPCSEG_DEVOX_PALLAS=1 timeout 2400 python bench.py 2>&1 | tail -3

log "bench POLICY=auto + DEVOX_PALLAS=1"
OPENPCSEG_PALLAS_POLICY=auto OPENPCSEG_DEVOX_PALLAS=1 \
  timeout 2400 python bench.py 2>&1 | tail -3

log "batch sweep BENCH_BATCH=2 (best envs TBD manually after above)"
BENCH_BATCH=2 timeout 2400 python bench.py 2>&1 | tail -3
log "batch sweep BENCH_BATCH=4"
BENCH_BATCH=4 timeout 2400 python bench.py 2>&1 | tail -3
log "queue done"
