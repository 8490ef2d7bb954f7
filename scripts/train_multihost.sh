#!/bin/bash
# Multi-host training job: one process per TPU host (reference train.sh:1-19
# scaled past one node — the DDP-under-SLURM analogue for pods/multi-slice).
#
# Under SLURM: request one task per host; jax.distributed auto-detects the
# rank/coordinator from the SLURM env (mvd_tpu/distributed.py:initialize),
# so no explicit flags are needed:
#   sbatch --nodes=4 --ntasks-per-node=1 scripts/train_multihost.sh
#
# Without SLURM (e.g. a GCE TPU pod via `gcloud compute tpus tpu-vm ssh
# --worker=all`): export the explicit wiring on every host —
#   MVD_COORDINATOR=<host0>:8476 MVD_NUM_PROCESSES=<N> MVD_PROCESS_ID=<i> \
#     bash scripts/train_multihost.sh
#
# Mesh note: the data axis spans hosts (gradient all-reduce rides DCN
# between hosts, ICI within); keep --mesh-view/--mesh-model within one
# host's chips. Metrics/W&B/PNGs come from process 0 only.
#SBATCH --job-name=mvd-tpu-pod
#SBATCH --ntasks-per-node=1
#SBATCH --cpus-per-task=16
#SBATCH --mem=128G
#SBATCH --time=47:59:00

set -euo pipefail

CONFIG="${CONFIG:-config/train_config.yaml}"
DATASET_PATH="${MVD_DATASET_PATH:?set MVD_DATASET_PATH}"
OUTPUT_DIR="${OUTPUT_DIR:-outputs}"

RUN=(python -m mvd_tpu.cli.train
    --config "$CONFIG"
    --dataset-path "$DATASET_PATH"
    --output-dir "$OUTPUT_DIR")

if [[ -n "${SLURM_JOB_ID:-}" && -z "${SLURM_STEP_ID:-}" ]]; then
    # batch-script context: launch one task per host
    exec srun "${RUN[@]}" "$@"
fi
exec "${RUN[@]}" "$@"
