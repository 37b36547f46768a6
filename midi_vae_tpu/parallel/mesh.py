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


def make_mesh(num_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(f"requested {num_devices} devices, only {len(devs)} available")
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


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


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (model/optimizer state) across the mesh."""
    return jax.device_put(tree, replicated(mesh))


def shard_batch(tree, mesh: Mesh):
    """Place a host batch with its leading axis sharded across the mesh."""
    return jax.device_put(tree, batch_sharding(mesh))
