#!/bin/bash
# Multi-host TPU pod launcher (replaces reference scripts/slurm_gpu.sh).
# Run this same script on every host of the pod slice; jax.distributed
# discovers the topology from the TPU runtime (or set
# COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID for manual rendezvous —
# arcnerf_tpu.parallel.mesh.init_distributed picks them up).
# The data mesh then spans all chips of all hosts; each process feeds its
# local devices; gradients all-reduce over ICI/DCN via GSPMD.
CFG=${1:?usage: pod.sh <config.yaml> [overrides...]}
shift
python train.py --configs "$CFG" "$@"
