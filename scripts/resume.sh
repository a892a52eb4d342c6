#!/bin/bash
# Resume training from the latest (or interrupt) checkpoint
# (reference scripts/resume.sh analog).
set -e
CONFIG=${1:-STMask_plus_resnet50}
shift || true
python train.py --config "$CONFIG" --resume latest "$@"
