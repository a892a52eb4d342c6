#!/bin/bash
# Training launcher (reference scripts/train.sh analog, SLURM-free).
# Usage: scripts/train.sh <config> [extra args...]
set -e
CONFIG=${1:-STMask_plus_resnet50}
shift || true
python train.py --config "$CONFIG" \
    --batch_size "${BATCH_SIZE:-8}" \
    --save_folder "${SAVE_FOLDER:-weights/}" \
    "$@"
