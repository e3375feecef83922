#!/usr/bin/env bash
# SLURM-managed launch (surface parity with the reference's
# scripts/dist_run_slurm.sh:1-30): one srun task per HOST of the TPU slice
# (not per chip — one JAX process drives all local chips).
#
# jax.distributed.initialize() auto-derives coordinator address, process
# count and process id from the SLURM step environment (SLURM_STEP_NODELIST
# / SLURM_NTASKS / SLURM_PROCID via jax's built-in SlurmCluster detector),
# so no MASTER_ADDR/RANK plumbing is needed — `--dist` is enough.
#
# Usage:
#   ./scripts/run_slurm.sh <partition> <job_name> <script> <cfg> <model_dir> [hosts]
# e.g.
#   ./scripts/run_slurm.sh tpu vlbert-pretrain pretrain/train_end2end.py \
#       cfgs/pretrain/base_e2e_16x16G_fp16.yaml ./ckpts 4
#
# Env knobs: CPUS_PER_TASK (default 96: feed the chips — SURVEY §7.3-5),
# SRUN_ARGS, PY_ARGS.
set -e

PARTITION=$1
JOB_NAME=$2
RUN_SCRIPT=$3
CONFIG=$4
WORK_DIR=$5
HOSTS=${6:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-96}
SRUN_ARGS=${SRUN_ARGS:-""}
PY_ARGS=${PY_ARGS:-""}

# --kill-on-bad-exit matches the reference's failure semantics: any task
# dying kills the job; recovery is resharpened restart + AUTO_RESUME
# (training/checkpoint.py smart_resume scan).
srun -p "${PARTITION}" \
    --job-name="${JOB_NAME}" \
    --ntasks="${HOSTS}" \
    --ntasks-per-node=1 \
    --cpus-per-task="${CPUS_PER_TASK}" \
    --kill-on-bad-exit=1 \
    ${SRUN_ARGS} \
    python -u "${RUN_SCRIPT}" \
    --cfg "${CONFIG}" \
    --model-dir "${WORK_DIR}" \
    --dist ${PY_ARGS}
