#!/bin/bash
# TPU VM launch script — the TPU-native equivalent of the reference's
# scripts/mnist.sh SLURM/torchrun launcher: same checkpoint-directory and
# preemption-resume conventions, no torchrun (JAX multi-host processes
# discover each other via jax.distributed at the library level).
#
# Usage:
#   scripts/train_tpu.sh [--config configs/midi.yaml] [any cli.train flags...]
#
# Environment:
#   CKPT_ROOT        checkpoint root directory          (default: ./checkpoints)
#   JOB_LABEL        run label                          (default: timestamp)
#   JOB_OUTPUT_DIR   long-term storage target; when set, outputs rsync there
#                    after training (mirrors scripts/mnist.sh:174-197 — the
#                    reference disables this by default to save disk, same here)
#
# Preemption contract (mirrors scripts/mnist.sh:75-106,149-160): the job
# always passes --checkpoint=$CKPT_PTH; a missing file means fresh start,
# an existing one resumes config + state + counters. The trainer is
# backgrounded and waited on so SIGTERM (TPU preemption notice) can be
# forwarded for a final checkpoint. Restarts are accounted per-job in
# restart_count.txt (the TPU-VM stand-in for $SLURM_RESTART_COUNT,
# scripts/mnist.sh:165,205).

set -euo pipefail

CKPT_ROOT="${CKPT_ROOT:-./checkpoints}"
JOB_LABEL="${JOB_LABEL:-$(date +%Y%m%d_%H%M%S)}"
CKPT_DIR="${CKPT_ROOT}/${JOB_LABEL}"
CKPT_PTH="${CKPT_DIR}/checkpoint_latest.msgpack"
JOB_OUTPUT_DIR="${JOB_OUTPUT_DIR:-}"
START_TIME=${SECONDS}

mkdir -p "${CKPT_DIR}"
ln -sfn "${CKPT_DIR}" "${CKPT_ROOT}/checkpoints_working"

# Restart accounting: preemption re-launches reuse the same JOB_LABEL, so a
# counter file in the checkpoint dir plays the role of SLURM_RESTART_COUNT.
RESTART_FILE="${CKPT_DIR}/restart_count.txt"
RESTART_COUNT=0
if [[ -f "${RESTART_FILE}" ]]; then
  RESTART_COUNT=$(( $(cat "${RESTART_FILE}") + 1 ))
fi
echo "${RESTART_COUNT}" > "${RESTART_FILE}"
echo "Job ${JOB_LABEL} starting (restart ${RESTART_COUNT})"

# Environment snapshot (scripts/mnist.sh:110-111 equivalent)
{
  python -V
  pip freeze 2>/dev/null | head -50
  python -c "import jax; print('jax', jax.__version__, jax.devices())"
} > "${CKPT_DIR}/env_snapshot.txt" 2>&1 || true

echo "Checkpoints: ${CKPT_PTH}"

# Launchable from any cwd: the package lives next to this script's parent
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}${PYTHONPATH:+:${PYTHONPATH}}"

# Persistent XLA compilation cache inside the job dir: every preemption
# restart re-jits the train step from disk instead of re-running the
# 20-40 s XLA compile (core/compile_cache.py). Lives with the checkpoint
# so it survives exactly as long as the job does.
python -m midi_vae_tpu.cli.train \
  --checkpoint "${CKPT_PTH}" \
  --compilation-cache "${CKPT_DIR}/xla_cache" \
  "$@" &
TRAIN_PID=$!

_forward() { kill -TERM "${TRAIN_PID}" 2>/dev/null || true; }
trap _forward TERM INT

# first wait returns immediately (status 128+SIG) when the trapped signal
# arrives; the second actually waits for the trainer to flush its final
# checkpoint after the forwarded TERM.
wait "${TRAIN_PID}" || true
wait "${TRAIN_PID}" || true

ELAPSED=$(( SECONDS - START_TIME ))
echo "Job ${JOB_LABEL} finished (restart ${RESTART_COUNT}, ${ELAPSED}s this invocation)"

# The job is done: retire the working symlink (scripts/mnist.sh:169-171)
rm -f "${CKPT_ROOT}/checkpoints_working"

# Long-term storage stage (scripts/mnist.sh:174-197): opt-in via
# JOB_OUTPUT_DIR; off by default to preserve disk space, exactly like the
# reference.
if [[ -z "${CKPT_DIR}" ]]; then
  echo "CKPT_DIR is unset. Will not copy outputs."  # belt-and-braces guard
elif [[ -z "${JOB_OUTPUT_DIR}" ]]; then
  echo "JOB_OUTPUT_DIR is unset. Outputs stay in ${CKPT_DIR}."
else
  echo "Saving outputs for long-term storage: ${CKPT_DIR} -> ${JOB_OUTPUT_DIR}"
  mkdir -p "${JOB_OUTPUT_DIR}"
  if command -v rsync >/dev/null 2>&1; then
    rsync -rutl "${CKPT_DIR}/" "${JOB_OUTPUT_DIR}/"
  else
    cp -ru "${CKPT_DIR}/." "${JOB_OUTPUT_DIR}/"
  fi
  ln -sfn "${JOB_OUTPUT_DIR}" "${CKPT_ROOT}/checkpoints_finished"
  ls -lh "${JOB_OUTPUT_DIR}"
fi
