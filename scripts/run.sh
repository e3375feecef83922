#!/usr/bin/env bash
# Single-host TPU launch (replaces dist_run_single.sh: one process drives all
# local chips via the mesh — no per-device process spawning).
# Usage: ./scripts/run.sh <script> <cfg> <model_dir> [extra args...]
set -e
SCRIPT=$1; CFG=$2; MODEL_DIR=$3; shift 3 || true
python "$SCRIPT" --cfg "$CFG" --model-dir "$MODEL_DIR" "$@"
