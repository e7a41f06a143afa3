#!/bin/bash
# Round-5 queue C:
#   1. A/B the pallas k2/s2 up/down conv kernels (ops/pallas_updown.py)
#      against the XLA strided paths (the 26 ms bucket)
#   2. host-input-pipeline-under-load (VERDICT r4 #5): drive the REAL
#      training CLI on materialized 126k-pt raycast scans (/tmp/kitti_rc,
#      tools/scripts/make_raycast_kitti.py) at batch 2 for ~240 steps and
#      read the interval-true `step Xms data Yms` meters.
set -uo pipefail
cd "$(dirname "$0")/../.."
LOG=${LOG:-logs/tpu_queue_r05c.log}
mkdir -p logs

run_bench () {
  local name=$1; shift
  echo "=== bench $name env=[$*] $(date +%T) ===" | tee -a "$LOG"
  env "$@" timeout 2400 python bench.py 2>&1 | grep -v -e WARNING -e landlock | tee -a "$LOG"
  echo "--- bench $name exit=${PIPESTATUS[0]} ---" | tee -a "$LOG"
}

run_bench updown OPENPCSEG_UPDOWN_PALLAS=1
run_bench updown_b2 OPENPCSEG_UPDOWN_PALLAS=1 BENCH_DUP=1 BENCH_BATCH=2

echo "=== hostpipe: train.py on /tmp/kitti_rc batch 2 $(date +%T) ===" | tee -a "$LOG"
timeout 3600 python train.py \
  --cfg_file tools/cfgs/voxel/semantic_kitti/minkunet_mk34_cr10.yaml \
  --extra_tag hostpipe_r5 --log_dir /tmp/hostpipe_logs --epochs 10 \
  --batch_size 2 --workers 4 --log_interval 8 --eval_interval 100 \
  --ckp_save_interval 100 \
  --set DATA.DATA_PATH /tmp/kitti_rc/sequences 2>&1 \
  | grep -E "loss|data|overflow|error|Error" | tail -40 | tee -a "$LOG"
echo "=== queue-c done $(date +%T) ===" | tee -a "$LOG"
