#!/bin/bash
# Single-host TPU training launcher (replaces reference scripts/gpu.sh).
# All local TPU chips form the 1-axis data mesh automatically.
# Usage: ./scripts/tpu.sh configs/expr/synthetic_ngp.yaml [extra --overrides]
CFG=${1:?usage: tpu.sh <config.yaml> [overrides...]}
shift
python train.py --configs "$CFG" "$@"
