#!/bin/bash
# Objaverse-XL render job (reference render_objaverse.sh:1-21). CPU/GPU-side
# offline tool — Blender renders, not TPU work.
#SBATCH --job-name=mvd-render
#SBATCH --cpus-per-task=16
#SBATCH --mem=64G
#SBATCH --time=48:00:00
set -euo pipefail
DATA="${MVD_DATA_ROOT:?set MVD_DATA_ROOT}"
exec python -m tools.rendering.orchestrate \
    --render-dir "$DATA/renders" "$@"
