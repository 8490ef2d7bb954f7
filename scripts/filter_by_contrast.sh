#!/bin/bash
# Contrast filter job (reference filter_by_contrast.sh:1-16).
#SBATCH --job-name=mvd-contrast
#SBATCH --cpus-per-task=8
#SBATCH --mem=32G
#SBATCH --time=12:00:00
set -euo pipefail
DATA="${MVD_DATA_ROOT:?set MVD_DATA_ROOT}"
exec python -m tools.cleaning.filter_by_contrast \
    --input-dir "$DATA/renders" \
    --output-dir "$DATA/renders_final" \
    --rejected-dir "$DATA/rejected" "$@"
