"""Hierarchical multi-slice data parallelism on the virtual 8-device mesh.

``make_mesh_multislice`` builds the 2-D ``(slice, data)`` mesh of the
standard multi-pod recipe: batch sharded over BOTH axes, state
replicated, gradient all-reduce over both (ICI within a slice, DCN
across — on the virtual CPU mesh the hop assignment is hypothetical but
the SPMD semantics are identical). These tests pin the semantics: the
hierarchical mesh must train bit-for-bit like flat DP and single-device.
"""

import jax
import jax.numpy as jnp
import numpy as np

from midi_vae_tpu.losses.schedules import kl_weight_schedule
from midi_vae_tpu.models import MLPVAE
from midi_vae_tpu.models.vae import param_group_label
from midi_vae_tpu.parallel.mesh import (
    batch_sharding,
    data_axes,
    make_mesh,
    make_mesh_multislice,
    replicate,
)
from midi_vae_tpu.parallel.spmd import make_spmd_train_step
from midi_vae_tpu.train.optim import build_optimizer
from midi_vae_tpu.train.state import create_train_state, make_train_step

KL = kl_weight_schedule("constant", 1e-3)


def _setup(mesh, optimizer="SGD"):
    model = MLPVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,))
    bundle = build_optimizer(
        None, param_group_label, optimizer=optimizer, lr=0.1, scheduler="constant",
        total_steps=10, cycle_momentum=False,
    )
    state = create_train_state(model, bundle.tx, jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 1)))
    state = replicate(state, mesh)
    return model, bundle, state


def test_multislice_mesh_construction(eight_devices):
    mesh = make_mesh_multislice(2, 4)
    assert mesh.axis_names == ("slice", "data")
    assert mesh.shape == {"slice": 2, "data": 4}
    assert data_axes(mesh) == ("slice", "data")
    spec = batch_sharding(mesh).spec
    assert spec == jax.sharding.PartitionSpec(("slice", "data"))
    # chips_per_slice inferred from the device count
    mesh_auto = make_mesh_multislice(4)
    assert mesh_auto.shape == {"slice": 4, "data": 2}


def test_multislice_mesh_rejects_bad_shapes(eight_devices):
    try:
        make_mesh_multislice(3)  # 8 % 3 != 0
    except ValueError as e:
        assert "divide" in str(e)
    else:
        raise AssertionError("expected ValueError")
    try:
        make_mesh_multislice(4, 4)  # needs 16
    except ValueError as e:
        assert "16" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_multislice_auto_path_matches_single_device(eight_devices):
    """jit auto-partitioning over the (2, 4) hierarchical mesh computes the
    same step as one device on the same global batch."""
    x = np.random.default_rng(0).uniform(0, 1, (16, 16, 16, 1)).astype(np.float32)
    key = jax.random.PRNGKey(7)

    mesh1 = make_mesh(1)
    model, bundle, state1 = _setup(mesh1)
    step = make_train_step(model, bundle.tx, KL, donate=False)
    state1, lo1, gn1 = step(state1, jax.device_put(x, batch_sharding(mesh1)), key)

    mesh_ms = make_mesh_multislice(2, 4)
    _, _, state_ms = _setup(mesh_ms)
    state_ms, lo_ms, gn_ms = step(state_ms, jax.device_put(x, batch_sharding(mesh_ms)), key)

    np.testing.assert_allclose(float(lo1.loss), float(lo_ms.loss), rtol=2e-5)
    np.testing.assert_allclose(float(gn1), float(gn_ms), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params), jax.tree_util.tree_leaves(state_ms.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_multislice_spmd_matches_auto_path(eight_devices):
    """The explicit shard_map step on the hierarchical mesh == the auto path,
    with the reparam noise neutralized exactly as in test_spmd.py (log_var
    pinned to -60 so z == mu at float32 resolution)."""
    clamp = (-60.0, -60.0)
    mesh = make_mesh_multislice(2, 4)
    model, bundle, state0 = _setup(mesh)
    params = dict(state0.params)
    params["fc_var"] = dict(params["fc_var"])
    params["fc_var"]["kernel"] = jnp.zeros_like(params["fc_var"]["kernel"])
    params["fc_var"]["bias"] = jnp.full_like(params["fc_var"]["bias"], -60.0)
    state0 = state0.replace(params=params)

    x = jax.device_put(
        np.random.default_rng(1).uniform(0, 1, (16, 16, 16, 1)).astype(np.float32),
        batch_sharding(mesh),
    )
    auto_step = make_train_step(model, bundle.tx, KL, log_var_clamp=clamp, donate=False)
    spmd_step = make_spmd_train_step(model, bundle.tx, KL, mesh, log_var_clamp=clamp, donate=False)

    sa, sm = state0, state0
    for _ in range(3):
        sa, lo_a, gn_a = auto_step(sa, x, jax.random.PRNGKey(7))
        sm, lo_m, gn_m = spmd_step(sm, x, jax.random.PRNGKey(7))
        np.testing.assert_allclose(float(lo_a.loss), float(lo_m.loss), rtol=1e-6)
        np.testing.assert_allclose(float(gn_a), float(gn_m), rtol=1e-5)
    for pa, pm in zip(jax.tree_util.tree_leaves(sa.params), jax.tree_util.tree_leaves(sm.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pm), rtol=1e-5, atol=1e-7)


def test_multislice_spmd_noise_decorrelated_across_slices(eight_devices):
    """Every (slice, data) coordinate folds its own key: identical rows on
    all 8 shards must produce 8 distinct per-shard latent means."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh_multislice(2, 4)
    model, _, state = _setup(mesh)
    row = np.random.default_rng(2).uniform(0, 1, (1, 16, 16, 1)).astype(np.float32)
    x = jax.device_put(np.repeat(row, 16, axis=0).astype(np.float32), batch_sharding(mesh))

    def local_latents(params, xs, key):
        for ax in ("slice", "data"):
            key = jax.random.fold_in(key, jax.lax.axis_index(ax))
        out = model.apply({"params": params}, xs, train=True, rngs={"reparam": key})
        return out.latents

    latents = jax.jit(
        jax.shard_map(
            local_latents,
            mesh=mesh,
            in_specs=(P(), P(("slice", "data")), P()),
            out_specs=P(("slice", "data")),
            check_vma=False,
        )
    )(state.params, x, jax.random.PRNGKey(0))
    per_shard = np.asarray(latents).reshape(8, 2, 4)
    assert np.unique(per_shard.mean(axis=(1, 2))).size == 8


def test_spmd_still_rejects_model_axis_mesh(eight_devices):
    from midi_vae_tpu.parallel.mesh import make_mesh_2d

    model, bundle, _ = _setup(make_mesh(8))
    try:
        make_spmd_train_step(model, bundle.tx, KL, make_mesh_2d(4, 2))
    except ValueError as e:
        assert "slice" in str(e)
    else:
        raise AssertionError("expected ValueError for (data, model) mesh")


def test_trainer_runs_on_multislice_mesh(tmp_path, eight_devices):
    """--mesh-slices 2 end-to-end: the trainer builds the (2, 4) mesh,
    trains an epoch, and the flag survives the CLI→config mapping."""
    from midi_vae_tpu.cli.train import args_to_config, get_parser
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    argv = ["--dataset", "vae-lines-synthetic", "--mesh-slices", "2", "--num-devices", "8"]
    config = args_to_config(get_parser().parse_args(argv), argv)
    assert config.mesh_slices == 2

    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=16,
        arch="MLPVAE",
        n_features=4,
        hidden_dims=(32,),
        epochs=1,
        batch_size_per_device=8,
        num_devices=8,
        mesh_slices=2,
        lr_relative=0.01,
        seed=0,
        models_dir=str(tmp_path / "models"),
        log_images=False,
    )
    results = run(config)
    assert np.isfinite(results["train"]["loss"])
    assert results["n_samples_seen"] > 0


def test_trainer_rejects_indivisible_mesh_slices(tmp_path, eight_devices):
    import pytest

    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        image_size=16,
        arch="MLPVAE",
        n_features=4,
        hidden_dims=(32,),
        epochs=1,
        batch_size_per_device=8,
        num_devices=8,
        mesh_slices=3,  # 8 % 3 != 0 — must fail loudly, not drop devices
        models_dir=str(tmp_path / "m"),
        log_images=False,
    )
    with pytest.raises(ValueError, match="divide"):
        run(config)
