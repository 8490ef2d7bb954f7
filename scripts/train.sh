#!/bin/bash
# Single training job (reference train.sh:1-19, retargeted at TPU).
# Works both as a SLURM batch script (TPU-VM partition) and standalone.
#SBATCH --job-name=mvd-tpu
#SBATCH --ntasks=1
#SBATCH --cpus-per-task=16
#SBATCH --mem=128G
#SBATCH --time=47:59:00

set -euo pipefail

CONFIG="${CONFIG:-config/train_config.yaml}"
DATASET_PATH="${MVD_DATASET_PATH:?set MVD_DATASET_PATH}"
OUTPUT_DIR="${OUTPUT_DIR:-outputs}"

exec python -m mvd_tpu.cli.train \
    --config "$CONFIG" \
    --dataset-path "$DATASET_PATH" \
    --output-dir "$OUTPUT_DIR" \
    "$@"
