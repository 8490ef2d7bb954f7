#!/bin/bash
# VLM caption/filter job (reference clean.sh:1-16).
#SBATCH --job-name=mvd-clean
#SBATCH --cpus-per-task=8
#SBATCH --mem=64G
#SBATCH --time=24:00:00
set -euo pipefail
DATA="${MVD_DATA_ROOT:?set MVD_DATA_ROOT}"
exec python -m tools.cleaning.caption_filter \
    --input-dir "$DATA/renders" \
    --output-dir "$DATA/renders_final" \
    --rejected-dir "$DATA/rejected" "$@"
