"""Optional Orbax checkpoint backend.

The default format (``io/checkpoint.py``) is a single msgpack file —
simple, atomic, dependency-free, right for models that fit one host.
This module offers Orbax as an alternative, keeping the SAME logical
payload contract (state + config + counters) so ``restore_config`` and
the resume path work unchanged. The save is an all-hosts collective
(Orbax synchronizes processes internally), so under multi-host training
every process must call it — the train loop does. State arrays are
currently gathered to host before writing (fully-addressable arrays);
per-shard distributed writes are future work.

Select with ``save_checkpoint_orbax`` / ``load_checkpoint_orbax``; a
checkpoint path is recognized as Orbax when it is a directory created
here (``is_orbax_checkpoint``).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

_META_NAME = "midi_vae_meta.json"


def save_checkpoint_orbax(checkpoint_path: str, state, **meta) -> None:
    """Save ``state`` (a pytree) via Orbax's StandardCheckpointer plus a JSON
    sidecar for the config/counters (utils.py:344-347 payload parity).

    Crash-safe overwrite: the new checkpoint builds in a staging dir and
    swaps in via renames, so a preemption mid-save leaves either the old
    complete checkpoint or (in the brief swap window) no checkpoint at
    all — never a directory that looks valid but is broken.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(checkpoint_path)
    staging = path + ".staging"
    old = path + ".old"
    is_leader = jax.process_index() == 0
    if is_leader and os.path.isdir(staging):
        shutil.rmtree(staging)
    state_dict = serialization.to_state_dict(jax.device_get(state))
    # collective: every process must reach this call (Orbax barriers inside)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.join(staging, "state"), state_dict, force=True)
    if not is_leader:
        return
    with open(os.path.join(staging, _META_NAME), "w") as f:
        json.dump(_jsonable(meta), f)
    # swap: current → .old, staging → current, drop .old
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)


def load_checkpoint_orbax(checkpoint_path: str, state_template=None) -> Dict[str, Any]:
    """Load an Orbax checkpoint into the msgpack backend's payload shape."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(checkpoint_path)
    with open(os.path.join(path, _META_NAME)) as f:
        payload: Dict[str, Any] = json.load(f)
    with ocp.StandardCheckpointer() as ckptr:
        state_dict = ckptr.restore(os.path.join(path, "state"))
    if state_template is not None:
        state_dict = serialization.from_state_dict(state_template, state_dict)
    payload["state"] = state_dict
    return payload


def is_orbax_checkpoint(checkpoint_path: str) -> bool:
    return os.path.isdir(checkpoint_path) and os.path.isfile(os.path.join(checkpoint_path, _META_NAME))


def _jsonable(tree):
    """Make the sidecar JSON-safe (numpy scalars → python, tuples → lists)."""
    if isinstance(tree, dict):
        return {k: _jsonable(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_jsonable(v) for v in tree]
    if isinstance(tree, (np.integer,)):
        return int(tree)
    if isinstance(tree, (np.floating,)):
        return float(tree)
    return tree
