#!/bin/bash
# Elastic training wrapper with self-resubmission (reference
# auto_train.sh:14-156): traps SIGTERM/SIGINT, starts a background timer
# that requeues the job RESUBMIT_TIME seconds into the allocation, resumes
# from the newest checkpoint dir, and also resubmits on non-zero exit.
#
# Usage:
#   bash scripts/auto_train.sh --config config/train_config.yaml \
#       --checkpoint-dir outputs [--wandb-id ID]

set -uo pipefail

RESUBMIT_TIME="${RESUBMIT_TIME:-162000}"   # 45h of a 47h allocation
CONFIG="config/train_config.yaml"
CKPT_DIR="outputs"
WANDB_ID=""
EXTRA_ARGS=()

while [[ $# -gt 0 ]]; do
  case "$1" in
    --config) CONFIG="$2"; shift 2 ;;
    --checkpoint-dir) CKPT_DIR="$2"; shift 2 ;;
    --wandb-id) WANDB_ID="$2"; shift 2 ;;
    *) EXTRA_ARGS+=("$1"); shift ;;
  esac
done

latest_run_dir() {
  # newest timestamped run dir containing checkpoints (reference
  # auto_train.sh:68-113's glob-by-timestamp)
  ls -1dt "$CKPT_DIR"/*/checkpoints 2>/dev/null | head -1 || true
}

resubmit_job() {
  echo "[auto_train] resubmitting..."
  local resume
  resume="$(latest_run_dir)"
  local args=(--config "$CONFIG" --checkpoint-dir "$CKPT_DIR")
  [[ -n "$WANDB_ID" ]] && args+=(--wandb-id "$WANDB_ID")
  if command -v sbatch >/dev/null 2>&1 && [[ -n "${SLURM_JOB_ID:-}" ]]; then
    sbatch "$0" "${args[@]}"
  else
    exec bash "$0" "${args[@]}"
  fi
}

on_signal() {
  echo "[auto_train] caught termination signal"
  kill "$TRAIN_PID" 2>/dev/null
  resubmit_job
  exit 0
}
trap on_signal SIGTERM SIGINT

# background resubmission timer (reference auto_train.sh:120-131)
(
  sleep "$RESUBMIT_TIME"
  echo "[auto_train] allocation nearly exhausted; requeueing"
  kill -TERM $$ 2>/dev/null
) &
TIMER_PID=$!

RESUME_DIR="$(latest_run_dir)"
RESUME_ARGS=()
[[ -n "$RESUME_DIR" ]] && RESUME_ARGS+=(--resume "$RESUME_DIR")
WANDB_ARGS=()
[[ -n "$WANDB_ID" ]] && WANDB_ARGS+=(--wandb-id "$WANDB_ID")

# multi-node allocations launch one process per host (they join the
# multi-host runtime via SLURM auto-detect, mvd_tpu/distributed.py);
# single-node runs stay a plain python invocation
LAUNCH=(python -m mvd_tpu.cli.train)
if [[ -n "${SLURM_JOB_ID:-}" && "${SLURM_JOB_NUM_NODES:-1}" -gt 1 && -z "${SLURM_STEP_ID:-}" ]]; then
  LAUNCH=(srun --ntasks-per-node=1 python -m mvd_tpu.cli.train)
fi
"${LAUNCH[@]}" \
    --config "$CONFIG" \
    --output-dir "$CKPT_DIR" \
    "${RESUME_ARGS[@]}" "${WANDB_ARGS[@]}" "${EXTRA_ARGS[@]}" &
TRAIN_PID=$!
wait "$TRAIN_PID"
CODE=$?
kill "$TIMER_PID" 2>/dev/null

if [[ $CODE -ne 0 ]]; then
  # non-zero exit also triggers resubmission (reference auto_train.sh:148-156)
  echo "[auto_train] training exited with $CODE"
  resubmit_job
fi
exit $CODE
