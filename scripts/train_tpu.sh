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
#   CKPT_ROOT   checkpoint root directory   (default: ./checkpoints)
#   JOB_LABEL   run label                   (default: timestamp)
#
# Preemption contract (mirrors scripts/mnist.sh:75-106,149-160): the job
# always passes --checkpoint=$CKPT_PTH; a missing file means fresh start,
# an existing one resumes config + state + counters. The trainer is
# backgrounded and waited on so SIGTERM (TPU preemption notice) can be
# forwarded for a final checkpoint.

set -euo pipefail

CKPT_ROOT="${CKPT_ROOT:-./checkpoints}"
JOB_LABEL="${JOB_LABEL:-$(date +%Y%m%d_%H%M%S)}"
CKPT_DIR="${CKPT_ROOT}/${JOB_LABEL}"
CKPT_PTH="${CKPT_DIR}/checkpoint_latest.msgpack"

mkdir -p "${CKPT_DIR}"
ln -sfn "${CKPT_DIR}" "${CKPT_ROOT}/checkpoints_working"

# Environment snapshot (scripts/mnist.sh:110-111 equivalent)
{
  python -V
  pip freeze 2>/dev/null | head -50
  python -c "import jax; print('jax', jax.__version__, jax.devices())"
} > "${CKPT_DIR}/env_snapshot.txt" 2>&1 || true

echo "Checkpoints: ${CKPT_PTH}"

python -m midi_vae_tpu.cli.train \
  --checkpoint "${CKPT_PTH}" \
  "$@" &
TRAIN_PID=$!

_forward() { kill -TERM "${TRAIN_PID}" 2>/dev/null || true; }
trap _forward TERM INT

# first wait returns immediately (status 128+SIG) when the trapped signal
# arrives; the second actually waits for the trainer to flush its final
# checkpoint after the forwarded TERM.
wait "${TRAIN_PID}" || true
wait "${TRAIN_PID}" || true
