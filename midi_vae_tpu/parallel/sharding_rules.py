"""Tensor-parallel sharding rules for the VAE's dense layers.

Megatron-style pairing over the 2-D ``(data, model)`` mesh
(``mesh.make_mesh_2d``): the latent heads ``fc_mu``/``fc_var`` are
column-parallel (output latent dim split over ``model``), so the latent
vector z lives sharded; ``decoder_input`` is row-parallel (input latent
dim split), and XLA inserts the single all-reduce after it. Convs and
norms stay replicated over ``model`` — for this CNN they are small and
spatially dominated (SURVEY §2.3: TP is out of the reference's
capability scope; this module exists so the framework scales when the
dense layers grow).

Usage::

    mesh = make_mesh_2d(4, 2)
    specs = tp_param_specs(state.params)
    state = shard_state(state, mesh, specs)
    x = jax.device_put(batch, batch_sharding(mesh))
    state, lo, gn = train_step(state, x, key)   # jit propagates shardings
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from midi_vae_tpu.parallel.mesh import MODEL_AXIS, replicated


def _spec_for(path: str, shape) -> P:
    if path.startswith(("fc_mu/", "fc_var/")):
        if path.endswith("kernel"):  # [features_in, latent] — column parallel
            return P(None, MODEL_AXIS)
        return P(MODEL_AXIS)  # bias [latent]
    if path == "decoder_input/kernel":  # [latent, features_out] — row parallel
        return P(MODEL_AXIS, None)
    # decoder_input bias adds after the all-reduce → replicated, like convs/norms
    return P()


def tp_param_specs(params):
    """PartitionSpec pytree for the tensor-parallel layout."""

    def spec(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        return _spec_for(name, leaf.shape)

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_state(state, mesh: Mesh, param_specs):
    """Place a TrainState on the mesh: params per the TP specs, everything
    else (optimizer moments, batch stats, counters) replicated — jit's
    sharding propagation re-shards moments to match params on first use."""
    sharded_params = jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)), state.params, param_specs
    )
    # replicate the REST only: putting the params tree here too would upload
    # a full per-device copy of the largest tensors just to discard it
    rest = jax.device_put(state.replace(params={}), replicated(mesh))
    return rest.replace(params=sharded_params)
