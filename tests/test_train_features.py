"""Gradient accumulation, EMA tracking, and rematerialization.

These are capability extensions with no reference implementation
(the reference's torch equivalents would be manual ``loss.backward()``
accumulation, ``torch.optim.swa_utils.AveragedModel``, and
``torch.utils.checkpoint``); the tests pin their exact semantics:

- ``--grad-accum N``: identical optimizer update to the mean of the N
  microbatch gradients computed with the step's documented key
  derivation (fold step, then fold microbatch index).
- ``--ema-decay``: ``ema ← d·ema + (1−d)·params`` after each update,
  seeded from the init params; checkpoint round-trips across EMA and
  pre-EMA generations.
- ``--remat``: bitwise-identical loss and numerically identical
  gradients to the non-remat model (same param tree), for both
  VanillaVAE and FoldedVAE.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import serialization

from midi_vae_tpu.losses.elbo import elbo_loss
from midi_vae_tpu.losses.schedules import kl_weight_schedule
from midi_vae_tpu.models import MLPVAE, VanillaVAE
from midi_vae_tpu.models.folded import FoldedVAE
from midi_vae_tpu.train.state import (
    create_train_state,
    ema_update,
    make_train_step,
    reconcile_ema_state_dict,
)

KLW = 2.5e-4


def _mlp_setup(batch=8, ema=False):
    model = MLPVAE(input_dim=8, latent_dim=3, hidden_dims=(16,))
    tx = optax.sgd(0.1)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 1)), ema=ema)
    x = jax.random.uniform(jax.random.PRNGKey(7), (batch, 8, 8, 1))
    return model, tx, state, x


def test_grad_accum_matches_mean_of_microbatch_grads():
    model, tx, state, x = _mlp_setup(batch=8)
    sched = kl_weight_schedule("constant", KLW)
    step = make_train_step(model, tx, sched, grad_accum=2, donate=False)

    epoch_key = jax.random.PRNGKey(42)
    # the step's documented key derivation: fold in the step counter,
    # then the microbatch index
    key = jax.random.fold_in(epoch_key, state.step)

    def manual_grads(x_half, k):
        def lf(p):
            out = model.apply({"params": p}, x_half, train=True, rngs={"reparam": k})
            return elbo_loss(out, kld_weight=KLW).loss

        return jax.value_and_grad(lf)(state.params)

    l0, g0 = manual_grads(x[:4], jax.random.fold_in(key, 0))
    l1, g1 = manual_grads(x[4:], jax.random.fold_in(key, 1))
    expected_grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g0, g1)
    expected_params = optax.apply_updates(
        state.params, tx.update(expected_grads, state.opt_state, state.params)[0]
    )

    new_state, lo, grad_norm = step(state, x, epoch_key)
    assert int(new_state.step) == 1  # ONE optimizer update per batch
    np.testing.assert_allclose(float(lo.loss), (float(l0) + float(l1)) / 2.0, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params), jax.tree_util.tree_leaves(expected_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    assert np.isfinite(float(grad_norm))


def test_grad_accum_rejects_indivisible_batch():
    model, tx, state, x = _mlp_setup(batch=8)
    step = make_train_step(model, tx, kl_weight_schedule("constant", KLW), grad_accum=3, donate=False)
    with pytest.raises(ValueError, match="not divisible"):
        step(state, x, jax.random.PRNGKey(0))


def test_grad_accum_conv_model_runs_and_is_finite():
    model = VanillaVAE(input_dim=16, latent_dim=4, hidden_dims=(8, 16))
    tx = optax.adamw(1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 1)))
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 1))
    step = make_train_step(model, tx, kl_weight_schedule("constant", KLW), grad_accum=4, donate=False)
    new_state, lo, _ = step(state, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(lo.loss))
    # BN running stats saw 4 sequential microbatch updates inside the step
    assert int(new_state.step) == 1


def test_ema_decay_tracks_average():
    model, tx, state, x = _mlp_setup(batch=8, ema=True)
    # seeded from init params
    for a, b in zip(jax.tree_util.tree_leaves(state.ema_params), jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step = make_train_step(model, tx, kl_weight_schedule("constant", KLW), ema_decay=0.5, donate=False)
    p0 = state.params
    s1, _, _ = step(state, x, jax.random.PRNGKey(3))
    expected = jax.tree_util.tree_map(lambda e, p: 0.5 * e + 0.5 * p, p0, s1.params)
    for a, b in zip(jax.tree_util.tree_leaves(s1.ema_params), jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # params and EMA diverge after an update
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(s1.ema_params)[0]),
        np.asarray(jax.tree_util.tree_leaves(s1.params)[0]),
    )


def test_ema_update_seeds_from_params_when_empty():
    params = {"w": jnp.ones((2,))}
    out = ema_update({}, params, 0.9)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.ones((2,)))


def test_ema_reconcile_pre_ema_checkpoint():
    model, tx, state_ema, _ = _mlp_setup(ema=True)
    _, _, state_plain, _ = _mlp_setup(ema=False)

    # pre-EMA checkpoint (no ema_params key at all) into an EMA run:
    # shadow copy seeds from the restored params
    old_payload = serialization.to_state_dict(state_plain)
    old_payload.pop("ema_params")
    fixed = reconcile_ema_state_dict(old_payload, state_ema)
    restored = serialization.from_state_dict(state_ema, fixed)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.ema_params), jax.tree_util.tree_leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # EMA checkpoint into a non-EMA run: ema dropped, params intact
    ema_payload = serialization.to_state_dict(state_ema)
    fixed2 = reconcile_ema_state_dict(ema_payload, state_plain)
    restored2 = serialization.from_state_dict(state_plain, fixed2)
    assert restored2.ema_params == {}

    # same-generation round-trip unchanged
    fixed3 = reconcile_ema_state_dict(serialization.to_state_dict(state_ema), state_ema)
    restored3 = serialization.from_state_dict(state_ema, fixed3)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored3.ema_params), jax.tree_util.tree_leaves(state_ema.ema_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("cls", [VanillaVAE, FoldedVAE])
def test_remat_matches_no_remat(cls):
    kwargs = dict(input_dim=16, latent_dim=4, hidden_dims=(8, 16))
    if cls is FoldedVAE:
        kwargs["fold"] = 2
    base = cls(**kwargs)
    remat = cls(remat=True, **kwargs)
    x = jax.random.uniform(jax.random.PRNGKey(5), (4, 16, 16, 1))
    variables = base.init({"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, x, train=True)
    # identical param tree: remat is a pure recompute schedule, not an arch change
    v2 = remat.init({"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, x, train=True)
    assert jax.tree_util.tree_structure(variables["params"]) == jax.tree_util.tree_structure(v2["params"])

    def loss(model, p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            x,
            train=True,
            rngs={"reparam": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        return elbo_loss(out, kld_weight=KLW).loss

    l_base, g_base = jax.value_and_grad(lambda p: loss(base, p))(variables["params"])
    l_remat, g_remat = jax.value_and_grad(lambda p: loss(remat, p))(variables["params"])
    np.testing.assert_allclose(float(l_base), float(l_remat), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_base), jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_cli_flags_reach_config():
    from midi_vae_tpu.cli.train import args_to_config, get_parser

    argv = ["--grad-accum", "4", "--ema-decay", "0.999", "--remat"]
    args = get_parser().parse_args(argv)
    config = args_to_config(args, argv)
    assert config.grad_accum == 4
    assert config.ema_decay == 0.999
    assert config.remat is True

    argv0 = []
    config0 = args_to_config(get_parser().parse_args(argv0), argv0)
    assert config0.grad_accum == 1 and config0.ema_decay is None and config0.remat is False


def test_kl_schedule_knobs_reach_the_schedule(tmp_path, monkeypatch):
    """--kl-cycle-steps/--kl-ramp-fraction/--kl-growth/--kl-cap must flow
    from TrainConfig into kl_weight_schedule (they were silently pinned to
    the schedule defaults before, making 'cyclical' uncontrollable)."""
    import midi_vae_tpu.train.loop as loop_mod
    from midi_vae_tpu.losses.schedules import kl_weight_schedule
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    seen = {}

    def spy(kind, weight, **kw):
        seen.update(kind=kind, weight=weight, **kw)
        return kl_weight_schedule(kind, weight, **kw)

    monkeypatch.setattr(loop_mod, "kl_weight_schedule", spy)
    run(
        TrainConfig(
            dataset_name="vae-lines-synthetic",
            transform_type="noaug",
            image_size=32,
            arch="MLPVAE",
            n_features=8,
            hidden_dims=(64,),
            epochs=1,
            batch_size_per_device=16,
            num_devices=1,
            seed=0,
            models_dir=str(tmp_path / "kl"),
            log_images=False,
            kl_schedule="cyclical",
            kld_weight=0.25,
            kl_cycle_steps=7,
            kl_ramp_fraction=0.25,
            kl_growth=1.01,
            kl_cap=0.5,
        )
    )
    assert seen["kind"] == "cyclical" and seen["weight"] == 0.25
    assert seen["period"] == 7 and seen["ramp_fraction"] == 0.25
    assert seen["growth"] == 1.01 and seen["cap"] == 0.5


class TestScanChunkedTraining:
    """--scan-steps N: lax.scan epochs over the device-resident corpus."""

    def _config(self, tmp_path, tag, **kw):
        from midi_vae_tpu.train.config import TrainConfig

        return TrainConfig(
            dataset_name="vae-lines-synthetic",
            transform_type="noaug",
            image_size=32,
            arch="MLPVAE",
            n_features=8,
            hidden_dims=(64,),
            epochs=2,
            batch_size_per_device=16,
            num_devices=1,
            seed=0,
            models_dir=str(tmp_path / tag),
            log_images=False,
            run_name=tag,
            run_id=tag,
            **{"data_placement": "device", **kw},
        )

    def test_scan_matches_per_batch_dispatch(self, tmp_path):
        """Identical data order, keys, and step semantics: the scan-chunked
        epoch must reproduce the per-batch path's final loss closely."""
        from midi_vae_tpu.train.loop import run

        r_scan = run(self._config(tmp_path, "scan", scan_steps=8))
        r_base = run(self._config(tmp_path, "base"))
        assert abs(r_scan["train"]["loss"] - r_base["train"]["loss"]) < 1e-4
        assert r_scan["total_step"] == r_base["total_step"]
        ce_s = r_scan["final_test"]["cross-entropy"]
        ce_b = r_base["final_test"]["cross-entropy"]
        assert abs(ce_s - ce_b) < 1e-3

    def test_scan_requires_auto_step(self, tmp_path):
        from midi_vae_tpu.train.loop import run

        with pytest.raises(ValueError, match="scan-steps"):
            run(self._config(tmp_path, "sm", scan_steps=4, step_impl="shard_map"))

    def test_scan_falls_back_on_host_loader(self, tmp_path, capsys):
        from midi_vae_tpu.train.loop import run

        r = run(self._config(tmp_path, "fb", scan_steps=4, data_placement="host"))
        assert r["total_step"] > 0
        assert "falling back to per-batch dispatch" in capsys.readouterr().out

    def test_scan_composes_with_grad_accum_and_ema(self, tmp_path):
        """The scanned chunk wraps the SAME raw step, so grad-accum and EMA
        ride along unchanged (scan-of-scan compiles and trains)."""
        from midi_vae_tpu.train.loop import run

        r = run(self._config(
            tmp_path, "sc_ga", scan_steps=4, grad_accum=2, ema_decay=0.9,
        ))
        assert r["total_step"] > 0
        import numpy as np

        assert np.isfinite(r["train"]["loss"])
