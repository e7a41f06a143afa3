#!/usr/bin/env bash
#   sh infer.sh <NUM_DEVICES> --cfg_file ... [infer.py args]
set -e
NGPUS=$1
shift
python infer.py --num_devices "$NGPUS" "$@"
