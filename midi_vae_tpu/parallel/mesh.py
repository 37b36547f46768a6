"""Device mesh construction and sharding helpers.

The data-parallel layer the reference intended but never finished
(SURVEY §2.3: world-size env scaling, rank flags, gather helpers, but
no process group or gradient sync — C12). TPU-native version: a 1-D
``jax.sharding.Mesh`` over a ``"data"`` axis; batches are sharded along
it, model/optimizer state is replicated, and ``jit`` auto-partitioning
inserts the gradient ``psum`` over ICI. Multi-host extension is the
same mesh built from ``jax.devices()`` after
``jax.distributed.initialize`` — no NCCL/torchrun machinery.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SLICE_AXIS = "slice"


def make_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(f"requested {num_devices} devices, only {len(devs)} available")
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def make_mesh_multislice(
    n_slices: int, chips_per_slice: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """2-D ``(slice, data)`` mesh for hierarchical (multi-slice) data parallelism.

    The ``data`` axis runs *within* a slice (collectives ride ICI); the
    ``slice`` axis crosses slices (collectives ride DCN). Batches shard
    over both axes (:func:`batch_sharding` returns
    ``P((slice, data))`` for this mesh) and the gradient all-reduce
    lowers hierarchically: reduce-scatter/all-gather inside each slice
    over ICI, with only the per-slice partials crossing the slow DCN hop
    — the standard multi-pod recipe.

    Device order: when the platform reports a per-device ``slice_index``
    (real multi-slice TPU deployments), devices are grouped by it so the
    fast axis genuinely stays inside a slice. Otherwise (single slice,
    CPU, or the virtual test mesh) a row-major reshape stands in — the
    sharding semantics are identical, only the physical hop assignment
    is hypothetical.
    """
    devs = list(devices) if devices is not None else jax.devices()
    slice_ids = [getattr(d, "slice_index", None) for d in devs]
    if all(s is not None for s in slice_ids) and len(set(slice_ids)) > 1:
        by_slice: dict = {}
        for d, sid in zip(devs, slice_ids):
            by_slice.setdefault(sid, []).append(d)
        groups = [by_slice[k] for k in sorted(by_slice)]
        if n_slices > len(groups):
            raise ValueError(f"requested {n_slices} slices, platform reports {len(groups)}")
        groups = groups[:n_slices]
        cps = chips_per_slice if chips_per_slice is not None else min(len(g) for g in groups)
        if any(len(g) < cps for g in groups):
            raise ValueError(f"need {cps} chips per slice, smallest slice has {min(len(g) for g in groups)}")
        grid = np.asarray([g[:cps] for g in groups])
    else:
        if chips_per_slice is None:
            if len(devs) % n_slices:
                raise ValueError(f"{len(devs)} devices do not divide into {n_slices} slices")
            chips_per_slice = len(devs) // n_slices
        need = n_slices * chips_per_slice
        if need > len(devs):
            raise ValueError(f"mesh {n_slices}x{chips_per_slice} needs {need} devices, have {len(devs)}")
        grid = np.asarray(devs[:need]).reshape(n_slices, chips_per_slice)
    return Mesh(grid, (SLICE_AXIS, DATA_AXIS))


def make_mesh_2d(n_data: int, n_model: int, devices: Optional[Sequence] = None) -> Mesh:
    """2-D ``(data, model)`` mesh for combined data + tensor parallelism.

    The model axis shards the dense latent heads / decoder-input matmuls
    (``parallel/sharding_rules.py``); convs stay replicated over it (a
    1.3M-param CNN gains nothing from conv sharding, SURVEY §2.3 — the
    machinery is here for when dense layers grow).
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_data * n_model > len(devs):
        raise ValueError(f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, have {len(devs)}")
    grid = np.asarray(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_axes(mesh: Mesh) -> tuple:
    """The batch-sharding axes of ``mesh``: ``(slice, data)`` on a
    multi-slice mesh, ``(data,)`` on the 1-D / ``(data, model)`` meshes."""
    return tuple(a for a in mesh.axis_names if a in (SLICE_AXIS, DATA_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis (both the
    slice and data axes on a multi-slice mesh)."""
    return NamedSharding(mesh, P(data_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (model/optimizer state) across the mesh."""
    return jax.device_put(tree, replicated(mesh))


def shard_batch(tree, mesh: Mesh):
    """Place a host batch with its leading axis sharded across the mesh."""
    return jax.device_put(tree, batch_sharding(mesh))
