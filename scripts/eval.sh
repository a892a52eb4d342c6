#!/bin/bash
# Evaluation launcher (reference scripts/eval.sh analog).
# Usage: scripts/eval.sh <trained_model> <ann_file> <img_prefix> [extra...]
set -e
MODEL=$1; ANN=$2; IMGS=$3
shift 3 || true
python eval.py --trained_model "$MODEL" --ann_file "$ANN" \
    --img_prefix "$IMGS" "$@"
