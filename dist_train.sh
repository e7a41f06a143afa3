#!/usr/bin/env bash
# Data-parallel training launcher (counterpart of the reference dist_train.sh,
# which wrapped torch.distributed.launch). On TPU all local chips are used
# automatically via the device mesh; multi-host pods initialize through
# jax.distributed (set JAX_COORDINATOR_ADDRESS / JAX_PROCESS_ID / JAX_NUM_PROCESSES
# or rely on the TPU pod runtime's auto-detection).
#
#   sh dist_train.sh <NUM_DEVICES> --cfg_file ... [train.py args]
set -e
NGPUS=$1
shift
python train.py --num_devices "$NGPUS" "$@"
