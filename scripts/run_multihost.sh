#!/usr/bin/env bash
# Multi-host TPU pod launch (replaces dist_run_multi.sh / dist_run_slurm.sh):
# run this same command on every host of the pod slice; jax.distributed
# discovers peers from the TPU runtime (no MASTER_ADDR/RANK env needed).
# Usage: ./scripts/run_multihost.sh <script> <cfg> <model_dir> [extra args...]
set -e
SCRIPT=$1; CFG=$2; MODEL_DIR=$3; shift 3 || true
python "$SCRIPT" --cfg "$CFG" --model-dir "$MODEL_DIR" --dist "$@"
