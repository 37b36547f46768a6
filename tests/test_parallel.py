"""Distributed-without-a-cluster tests (SURVEY §4): sharded training on the
virtual 8-device CPU mesh must agree with single-device training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from midi_vae_tpu.losses.schedules import kl_weight_schedule
from midi_vae_tpu.models import MLPVAE
from midi_vae_tpu.models.vae import param_group_label
from midi_vae_tpu.parallel.collectives import concat_all_gather, concat_all_gather_ragged, psum_mean
from midi_vae_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
from midi_vae_tpu.train.optim import build_optimizer
from midi_vae_tpu.train.state import create_train_state, make_train_step


def _setup(num_devices):
    model = MLPVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,))
    bundle = build_optimizer(
        None, param_group_label, optimizer="SGD", lr=0.1, scheduler="constant",
        total_steps=10, cycle_momentum=False,
    )
    mesh = make_mesh(num_devices)
    sample = jnp.zeros((2, 16, 16, 1))
    state = create_train_state(model, bundle.tx, jax.random.PRNGKey(0), sample)
    state = replicate(state, mesh)
    step = make_train_step(model, bundle.tx, kl_weight_schedule("constant", 1e-3), donate=False)
    return model, mesh, state, step


def test_dp_training_matches_single_device(eight_devices):
    """Gradients reduced over the 8-way mesh == single-device gradients
    on the same global batch (same model, same key)."""
    x = np.random.default_rng(0).uniform(0, 1, (16, 16, 16, 1)).astype(np.float32)
    key = jax.random.PRNGKey(7)

    _, mesh1, state1, step1 = _setup(1)
    x1 = jax.device_put(x, batch_sharding(mesh1))
    state1, lo1, gn1 = step1(state1, x1, key)

    _, mesh8, state8, step8 = _setup(8)
    x8 = jax.device_put(x, batch_sharding(mesh8))
    state8, lo8, gn8 = step8(state8, x8, key)

    np.testing.assert_allclose(float(lo1.loss), float(lo8.loss), rtol=2e-5)
    np.testing.assert_allclose(float(gn1), float(gn8), rtol=2e-5)
    flat1 = jax.tree_util.tree_leaves(state1.params)
    flat8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_multi_step_dp_stays_in_sync(eight_devices):
    _, mesh, state, step = _setup(8)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(1)
    for i in range(3):
        x = jax.device_put(rng.uniform(0, 1, (16, 16, 16, 1)).astype(np.float32), batch_sharding(mesh))
        state, lo, _ = step(state, x, key)
        assert np.isfinite(float(lo.loss))
    assert int(state.step) == 3
    # replicated state remains fully addressable and identical across devices
    w = state.params["fc_mu"]["kernel"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


class TestCollectives:
    def test_concat_all_gather(self, eight_devices):
        mesh = make_mesh(8)

        @jax.jit
        def gather(x):
            return jax.shard_map(
                lambda lx: concat_all_gather(lx, "data"),
                mesh=mesh, in_specs=P("data"), out_specs=P(), check_vma=False,
            )(x)

        x = np.arange(16, dtype=np.float32).reshape(16, 1)
        out = np.asarray(gather(x))
        np.testing.assert_array_equal(out[:, 0], np.arange(16))

    def test_ragged_gather_mask(self, eight_devices):
        """Pad-to-max + mask semantics of utils.py:244-299."""
        mesh = make_mesh(8)
        max_count = 4

        @jax.jit
        def gather(x, counts):
            def local(lx, lc):
                return concat_all_gather_ragged(lx, lc[0], "data", max_count)

            return jax.shard_map(
                local, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=(P(), P()), check_vma=False
            )(x, counts)

        x = np.arange(32, dtype=np.float32).reshape(32, 1)  # 4 rows per device
        counts = np.array([1, 2, 3, 4, 0, 4, 2, 1], dtype=np.int32)  # valid rows per device
        values, masks = gather(x, counts)
        values, masks = np.asarray(values), np.asarray(masks)
        assert values.shape == (32, 1) and masks.shape == (32,)
        assert masks.sum() == counts.sum()
        # device 0 contributes exactly 1 valid row (value 0)
        np.testing.assert_array_equal(masks[:4], [1, 0, 0, 0])
        # trim semantics: masked concat equals the ragged concat of the reference
        valid_values = values[masks > 0, 0]
        expected = np.concatenate([np.arange(4 * d, 4 * d + c) for d, c in enumerate(counts)])
        np.testing.assert_array_equal(valid_values, expected)

    def test_psum_mean(self, eight_devices):
        mesh = make_mesh(8)

        @jax.jit
        def reduce(x):
            return jax.shard_map(
                lambda lx: psum_mean(lx, "data"), mesh=mesh, in_specs=P("data"), out_specs=P(), check_vma=False
            )(x)

        x = np.arange(8, dtype=np.float32).reshape(8, 1)
        out = np.asarray(reduce(x))
        np.testing.assert_allclose(out, np.mean(np.arange(8)))


def test_graft_entry_single_and_multichip(eight_devices):
    """The driver contract: entry() compiles; dryrun_multichip(8) executes."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    ge.dryrun_multichip(8)


class TestTensorParallel:
    """2-D (data, model) mesh: dense layers sharded, gradients match 1-device."""

    def _setup(self, latent=8):
        import optax

        from midi_vae_tpu.models import VanillaVAE

        model = VanillaVAE(in_channels=1, latent_dim=latent, input_dim=32, hidden_dims=(8, 16))
        x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (8, 32, 32, 1)), jnp.float32)
        tx = optax.adamw(1e-3)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), x[:2])
        step = make_train_step(model, tx, kl_weight_schedule("constant", 2.5e-4), donate=False)
        return model, state, step, x

    def test_tp_step_matches_single_device(self, eight_devices):
        from midi_vae_tpu.parallel.mesh import batch_sharding, make_mesh_2d
        from midi_vae_tpu.parallel.sharding_rules import shard_state, tp_param_specs

        model, state, step, x = self._setup()
        ref_state, ref_lo, ref_gn = step(state, x, jax.random.PRNGKey(1))

        mesh = make_mesh_2d(4, 2)
        specs = tp_param_specs(state.params)
        tp_state = shard_state(state, mesh, specs)
        xs = jax.device_put(x, batch_sharding(mesh))
        tp_state, tp_lo, tp_gn = step(tp_state, xs, jax.random.PRNGKey(1))

        np.testing.assert_allclose(float(tp_lo.loss), float(ref_lo.loss), rtol=1e-5)
        np.testing.assert_allclose(float(tp_gn), float(ref_gn), rtol=1e-4)
        # updated dense params agree with the single-device update
        np.testing.assert_allclose(
            np.asarray(tp_state.params["fc_mu"]["kernel"]),
            np.asarray(ref_state.params["fc_mu"]["kernel"]),
            rtol=1e-4, atol=1e-6,
        )

    def test_tp_specs_shape(self, eight_devices):
        from midi_vae_tpu.parallel.mesh import MODEL_AXIS
        from midi_vae_tpu.parallel.sharding_rules import tp_param_specs

        model, state, _, _ = self._setup()
        specs = tp_param_specs(state.params)
        assert specs["fc_mu"]["kernel"] == jax.sharding.PartitionSpec(None, MODEL_AXIS)
        assert specs["decoder_input"]["kernel"] == jax.sharding.PartitionSpec(MODEL_AXIS, None)
        assert specs["encoder"]["ConvBlock_0"]["Conv_0"]["kernel"] == jax.sharding.PartitionSpec()

    def test_mesh_2d_shape(self, eight_devices):
        from midi_vae_tpu.parallel.mesh import make_mesh_2d

        mesh = make_mesh_2d(4, 2)
        assert dict(mesh.shape) == {"data": 4, "model": 2}
        with pytest.raises(ValueError):
            make_mesh_2d(8, 2)


def test_shard_batch_places_leading_axis_on_data_mesh(eight_devices):
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from midi_vae_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(8)
    x = shard_batch(np.zeros((16, 4, 4, 1), np.float32), mesh)
    assert x.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, P("data")), ndim=x.ndim
    )
    # each device holds 16/8 = 2 rows
    assert x.addressable_shards[0].data.shape[0] == 2
