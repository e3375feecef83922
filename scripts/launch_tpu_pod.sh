#!/usr/bin/env bash
# Cluster-scheduler pod launch — the TPU-world equivalent of the reference's
# SLURM wrapper (ref scripts/dist_run_slurm.sh: srun spawns one task per GPU
# with --kill-on-bad-exit). On Cloud TPU the scheduler is the queued-resource
# API + per-worker ssh fan-out: provisioning replaces `srun -p PARTITION`,
# `--worker=all ssh` replaces the task spawn, and jax.distributed inside
# run_multihost.sh replaces MASTER_ADDR/RANK wiring.
#
# Usage:
#   ./scripts/launch_tpu_pod.sh TPU_NAME ZONE ACCEL_TYPE RUN_SCRIPT CFG MODEL_DIR [extra args...]
# e.g.
#   ./scripts/launch_tpu_pod.sh vlbert-pod us-east5-b v5litepod-32 \
#       pretrain/train_end2end.py cfgs/pretrain/base_prec_4x16G_fp32.yaml gs://bucket/ckpts
#
# Env knobs (mirroring the reference's GPUS_PER_NODE/SRUN_ARGS style):
#   RUNTIME_VERSION  TPU software version     (default v2-alpha-tpuv5-lite)
#   REPO_DIR         repo path on the workers (default ~/vlbert_tpu)
#   PROVISION=1      create the slice first via queued-resources (else reuse)
#   BEST_EFFORT=1    provision as preemptible/best-effort capacity
#
# A GKE alternative (JobSet, one pod per TPU-VM host) is documented in
# docs/MIGRATION.md "Launchers"; this script is the direct-ssh path.
set -euo pipefail

TPU_NAME=$1; ZONE=$2; ACCEL=$3; RUN_SCRIPT=$4; CFG=$5; MODEL_DIR=$6; shift 6 || true
RUNTIME_VERSION=${RUNTIME_VERSION:-v2-alpha-tpuv5-lite}
REPO_DIR=${REPO_DIR:-'~/vlbert_tpu'}

if [[ "${PROVISION:-0}" == "1" ]]; then
  # queued-resources = the cluster queue (the SLURM partition equivalent):
  # the request waits for capacity, then materializes the slice.
  gcloud compute tpus queued-resources create "${TPU_NAME}-qr" \
    --node-id "${TPU_NAME}" \
    --zone "${ZONE}" \
    --accelerator-type "${ACCEL}" \
    --runtime-version "${RUNTIME_VERSION}" \
    $([[ "${BEST_EFFORT:-0}" == "1" ]] && echo --best-effort)
  echo "waiting for ${TPU_NAME} to become ACTIVE..."
  while :; do
    STATE=$(gcloud compute tpus queued-resources describe "${TPU_NAME}-qr" \
      --zone "${ZONE}" --format='value(state.state)')
    case "${STATE}" in
      ACTIVE) break ;;
      FAILED|SUSPENDED|SUSPENDING)
        echo "queued-resource ${TPU_NAME}-qr entered ${STATE}; aborting" >&2
        exit 1 ;;
      *) sleep 30 ;;
    esac
  done
fi

# One command on EVERY host of the slice (srun's task fan-out). ssh
# --worker=all runs them concurrently and propagates a nonzero exit from any
# worker (the --kill-on-bad-exit analogue: jax.distributed aborts the
# remaining hosts when one dies — see parallel/mesh.py heartbeat notes).
exec gcloud compute tpus tpu-vm ssh "${TPU_NAME}" --zone "${ZONE}" \
  --worker=all \
  --command "cd ${REPO_DIR} && ./scripts/run_multihost.sh ${RUN_SCRIPT} ${CFG} ${MODEL_DIR} $*"
