"""Atomic checkpoint I/O (reference: ``utils.py:311-351``, ``train.py:59-99,320-329,442-464``).

Payload parity with the reference checkpoint dict (utils.py:344-347):
model/optimizer state (as one ``TrainState`` pytree — including the
latent heads and final layer the reference's save path drops,
train.py:447-451), ``config``, ``epoch``, ``total_step``,
``n_samples_seen``, ``encoder_config``, ``transform_args``,
``best_epoch``. Semantics preserved:

- atomic write via ``.tmp.``-prefixed file + ``os.rename``
  (utils.py:342-350)
- ``checkpoint_latest`` + optional ``best_model`` copy (train.py:300,461-464)
- resume restores omitted config values with mismatch warnings
  (train.py:76-88, :func:`restore_config`)
- "premature resumption" tolerated when the file doesn't exist yet
  (train.py:67-71 — callers check ``os.path.isfile`` first)

Format: flax msgpack over a pytree of numpy arrays + JSON-able scalars
(replaces ``torch.save`` pickle — no arbitrary-code-execution surface,
readable from any JAX process). Save happens on process 0 — the
reference's rank gate is inverted (``not config.global_rank == 0``,
train.py:444) so its rank 0 never saves; SURVEY §2 C10 flags this as a
bug not to replicate.
"""

from __future__ import annotations

import os
import warnings
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np
from flax import serialization

CHECKPOINT_LATEST = "checkpoint_latest.msgpack"
BEST_MODEL = "best_model.msgpack"
ORBAX_CHECKPOINT_LATEST = "checkpoint_latest.orbax"
ORBAX_BEST_MODEL = "best_model.orbax"


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    checkpoint_path: str,
    state,
    *,
    config: Optional[Dict[str, Any]] = None,
    epoch: int = 0,
    total_step: int = 0,
    n_samples_seen: int = 0,
    encoder_config: Optional[Dict[str, Any]] = None,
    transform_args: Optional[Dict[str, Any]] = None,
    best_epoch: int = 0,
    backend: str = "msgpack",
    **extra,
) -> None:
    """Serialize a checkpoint atomically (utils.py:311-351 semantics).

    ``state`` is any pytree (normally a ``TrainState``); it is stored as
    a flax state-dict so it restores into a freshly-built state of the
    same structure. ``backend="orbax"`` writes a sharded Orbax directory
    instead of one msgpack file (``io/orbax_io.py``) — same logical
    payload either way.
    """
    if backend == "orbax":
        from midi_vae_tpu.io.orbax_io import save_checkpoint_orbax

        save_checkpoint_orbax(
            checkpoint_path,
            state,
            config=config or {},
            epoch=epoch,
            total_step=total_step,
            n_samples_seen=n_samples_seen,
            encoder_config=encoder_config or {},
            transform_args=transform_args or {},
            best_epoch=best_epoch,
            **extra,
        )
        return
    os.makedirs(os.path.dirname(os.path.abspath(checkpoint_path)), exist_ok=True)
    payload = {
        "state": _to_numpy(serialization.to_state_dict(state)),
        "config": config or {},
        "epoch": epoch,
        "total_step": total_step,
        "n_samples_seen": n_samples_seen,
        "encoder_config": encoder_config or {},
        "transform_args": transform_args or {},
        "best_epoch": best_epoch,
        **extra,
    }
    blob = serialization.msgpack_serialize(payload)
    head, tail = os.path.split(checkpoint_path)
    tmp_path = os.path.join(head, ".tmp." + tail)
    with open(tmp_path, "wb") as f:
        f.write(blob)
    os.rename(tmp_path, checkpoint_path)  # atomic on POSIX (utils.py:349-350)


def load_checkpoint(checkpoint_path: str, state_template=None) -> Dict[str, Any]:
    """Load a checkpoint; if ``state_template`` is given, ``"state"`` is
    restored into that pytree structure (device placement deferred to
    first use). Orbax directories (``io/orbax_io.py``) are detected and
    routed automatically, so resume works across both backends."""
    from midi_vae_tpu.io.orbax_io import is_orbax_checkpoint, load_checkpoint_orbax

    if is_orbax_checkpoint(checkpoint_path):
        return load_checkpoint_orbax(checkpoint_path, state_template)
    with open(checkpoint_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    if state_template is not None:
        payload["state"] = serialization.from_state_dict(state_template, payload["state"])
    return payload


class AsyncCheckpointWriter:
    """Background-thread checkpoint writes so the train loop never stalls
    on serialization/disk (TPU-preemption-friendly frequent saves).

    Semantics match Orbax's async checkpointing contract: ``save`` hands
    off host arrays (the caller does ``jax.device_get`` first — cheap
    relative to the write) and returns immediately; a new save waits for
    the previous one, so at most one write is in flight and the latest
    file is always a complete atomic snapshot (tmp + rename, as the sync
    path).
    """

    def __init__(self):
        import threading

        self._thread: Optional["threading.Thread"] = None
        self._error: Optional[BaseException] = None

    def save(self, checkpoint_path: str, state, **kwargs) -> None:
        import threading

        self.wait()  # at most one write in flight; surfaces prior errors

        def _write():
            try:
                save_checkpoint(checkpoint_path, state, **kwargs)
            except BaseException as e:  # surfaced on the next save/wait
                self._error = e

        # non-daemon: interpreter shutdown joins the thread, so a crash
        # mid-run still lands the last handed-off checkpoint on disk
        self._thread = threading.Thread(target=_write, daemon=False)
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight write (if any) lands; re-raise its error."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


def copy_best(checkpoint_path: str, best_path: Optional[str] = None) -> str:
    """Copy the latest checkpoint to the best-model file (train.py:461-464).
    Handles both backends: msgpack files and Orbax directories."""
    import shutil

    if os.path.isdir(checkpoint_path):
        if best_path is None:
            best_path = os.path.join(os.path.dirname(checkpoint_path), ORBAX_BEST_MODEL)
        # same crash model as save_checkpoint: stage the full copy, then
        # swap — rmtree-before-copytree left NO best model at all if the
        # process died inside the copy window
        staging = best_path + ".staging"
        if os.path.isdir(staging):
            shutil.rmtree(staging)
        shutil.copytree(checkpoint_path, staging)
        old = best_path + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        if os.path.isdir(best_path):
            os.rename(best_path, old)
        os.rename(staging, best_path)
        if os.path.isdir(old):
            shutil.rmtree(old)
        return best_path
    if best_path is None:
        best_path = os.path.join(os.path.dirname(checkpoint_path), BEST_MODEL)
    # tmp+rename: a preemption mid-copy must not leave a truncated best file
    shutil.copyfile(checkpoint_path, best_path + ".tmp")
    os.replace(best_path + ".tmp", best_path)
    return best_path


# Keys that never restore from a checkpoint (identity/hardware of THIS run;
# reference list at train.py:77). Per-run execution knobs (async writes,
# profiling) belong here too — they aren't training state.
NON_RESTORED_KEYS = frozenset(
    {
        "resume",
        "gpu",
        "global_rank",
        "local_rank",
        "cpu_workers",
        "checkpoint_path",
        "async_checkpoint",
        "checkpoint_backend",  # resume auto-detects the on-disk format
        "profile_dir",
        "profile_epochs",
        # execution knobs of THIS run's host/link, not training state: a
        # checkpoint from a device-resident scan-chunked run must resume
        # cleanly on a host whose corpus placement/dispatch mode differs
        "data_placement",
        "scan_steps",
        "prefetch",
    }
)


def restore_config(
    config: Dict[str, Any],
    checkpoint_config: Dict[str, Any],
    skip_keys: Iterable[str] = NON_RESTORED_KEYS,
) -> Dict[str, Any]:
    """Backfill missing config values from a checkpoint (train.py:76-88).

    Values that are ``None`` in the live config are restored from the
    checkpoint; values that differ raise a warning but keep the live
    value, exactly like the reference.
    """
    merged = dict(config)
    skip = set(skip_keys)
    for key, ckpt_value in checkpoint_config.items():
        if key in skip or ckpt_value is None:
            continue
        if merged.get(key) is None:
            merged[key] = ckpt_value
        elif merged[key] != ckpt_value:
            warnings.warn(
                f"config value for {key} differs from checkpoint:"
                f" {merged[key]} (ours) vs {ckpt_value} (checkpoint)",
                UserWarning,
                stacklevel=2,
            )
    return merged
