#!/bin/bash
# GSO download job (reference download_gso.sh:1-19).
#SBATCH --job-name=mvd-gso
#SBATCH --cpus-per-task=4
#SBATCH --mem=16G
#SBATCH --time=24:00:00
set -euo pipefail
DATA="${MVD_DATA_ROOT:?set MVD_DATA_ROOT}"
exec python -m tools.downloaders.download_gso --output-dir "$DATA/gso" "$@"
