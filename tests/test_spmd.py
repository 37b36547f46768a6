"""Explicit shard_map train step (parallel/spmd.py) vs the jit-auto path.

The equivalence test uses the MLP VAE (no BatchNorm — the conv model's
per-shard BN is a documented semantic difference) and neutralizes the
reparam noise, the ONE part that is decorrelated between the paths by
design: the fc_var head is pinned to output log_var = -60 (kernel 0,
bias -60) so z == mu at float32 resolution (std = e^-30), and
``log_var_clamp=(-60, -60)`` zeroes the KL gradient through log_var.
SGD (not Adam) keeps the residual ~1e-13 noise-path gradients from
being preconditioner-amplified. Both paths then compute the exact same
math, differing only in who wrote the psum.
"""

import jax
import jax.numpy as jnp
import numpy as np

from midi_vae_tpu.losses.schedules import kl_weight_schedule
from midi_vae_tpu.models.mlp import MLPVAE
from midi_vae_tpu.models.registry import build_model
from midi_vae_tpu.models.vae import param_group_label
from midi_vae_tpu.parallel.mesh import batch_sharding, make_mesh, make_mesh_2d, replicate
from midi_vae_tpu.parallel.spmd import make_spmd_train_step
from midi_vae_tpu.train.optim import build_optimizer
from midi_vae_tpu.train.state import create_train_state, make_train_step

KL = kl_weight_schedule("constant", 2.5e-4)
CLAMP = (-60.0, -60.0)  # z == mu at float32 resolution


def _setup(model, mesh, n_steps=4, optimizer="AdamW"):
    bundle = build_optimizer(
        None, param_group_label, optimizer=optimizer, lr=1e-3, scheduler="OneCycle", total_steps=n_steps
    )
    state = create_train_state(model, bundle.tx, jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 1)))
    state = replicate(state, mesh)
    x = jax.device_put(
        np.random.default_rng(1).uniform(0, 1, (16, 16, 16, 1)).astype(np.float32),
        batch_sharding(mesh),
    )
    return bundle, state, x


def test_spmd_step_matches_auto_path(eight_devices):
    mesh = make_mesh(8)
    model = MLPVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,))
    bundle, state0, x = _setup(model, mesh, optimizer="SGD")
    # pin log_var = -60: z == mu at float32 resolution (see module docstring)
    params = jax.tree_util.tree_map(lambda p: p, state0.params)
    params["fc_var"]["kernel"] = jnp.zeros_like(params["fc_var"]["kernel"])
    params["fc_var"]["bias"] = jnp.full_like(params["fc_var"]["bias"], -60.0)
    state0 = state0.replace(params=params)

    auto_step = make_train_step(model, bundle.tx, KL, log_var_clamp=CLAMP, donate=False)
    spmd_step = make_spmd_train_step(model, bundle.tx, KL, mesh, log_var_clamp=CLAMP, donate=False)

    sa, sm = state0, state0
    for _ in range(4):
        sa, lo_a, gn_a = auto_step(sa, x, jax.random.PRNGKey(7))
        sm, lo_m, gn_m = spmd_step(sm, x, jax.random.PRNGKey(7))
        np.testing.assert_allclose(float(lo_a.loss), float(lo_m.loss), rtol=1e-6)
        np.testing.assert_allclose(float(gn_a), float(gn_m), rtol=1e-5)
    for pa, pm in zip(jax.tree_util.tree_leaves(sa.params), jax.tree_util.tree_leaves(sm.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pm), rtol=1e-5, atol=1e-7)
    assert int(sm.step) == 4


def test_spmd_step_conv_vae_runs(eight_devices):
    """Conv VAE (BatchNorm): per-shard BN is the documented semantics —
    assert the step executes, stays finite, and returns replicated state."""
    mesh = make_mesh(8)
    model = build_model("VanillaVAE", in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(8, 16))
    bundle, state, x = _setup(model, mesh)
    step = make_spmd_train_step(model, bundle.tx, KL, mesh, donate=False)
    state, lo, gn = step(state, x, jax.random.PRNGKey(3))
    assert np.isfinite(float(lo.loss)) and np.isfinite(float(gn))
    assert int(state.step) == 1
    # batch_stats were psum-averaged: one consistent replicated value
    for leaf in jax.tree_util.tree_leaves(state.batch_stats):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_spmd_step_folded_vae_runs(eight_devices):
    """The flagship FoldedVAE composes with the explicit SPMD step."""
    from midi_vae_tpu.models.folded import FoldedVAE

    mesh = make_mesh(8)
    model = FoldedVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(8, 16), fold=2)
    bundle, state, x = _setup(model, mesh)
    step = make_spmd_train_step(model, bundle.tx, KL, mesh, donate=False)
    state, lo, gn = step(state, x, jax.random.PRNGKey(3))
    assert np.isfinite(float(lo.loss)) and np.isfinite(float(gn))
    assert int(state.step) == 1


def test_spmd_rejects_non_data_mesh(eight_devices):
    model = MLPVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,))
    bundle = build_optimizer(
        None, param_group_label, optimizer="AdamW", lr=1e-3, scheduler="OneCycle", total_steps=4
    )
    mesh2 = make_mesh_2d(4, 2)
    try:
        make_spmd_train_step(model, bundle.tx, KL, mesh2)
    except ValueError as e:
        assert "1-D" in str(e)
    else:
        raise AssertionError("expected ValueError for 2-D mesh")


def test_spmd_per_shard_noise_decorrelated(eight_devices):
    """Without the clamp, shards draw independent reparam noise: the same
    per-shard slice of a duplicated batch yields different latents across
    shards (fold of lax.axis_index), while the replicated loss is finite."""
    mesh = make_mesh(8)
    model = MLPVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,))
    bundle, state, _ = _setup(model, mesh)
    # identical rows on every shard -> any latent difference is noise-driven
    row = np.random.default_rng(2).uniform(0, 1, (1, 16, 16, 1)).astype(np.float32)
    x = jax.device_put(np.repeat(row, 16, axis=0).astype(np.float32), batch_sharding(mesh))

    from jax.sharding import PartitionSpec as P

    def local_latents(params, xs, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))
        out = model.apply({"params": params}, xs, train=True, rngs={"reparam": key})
        return out.latents

    latents = jax.jit(
        jax.shard_map(
            local_latents,
            mesh=mesh,
            in_specs=(P(), P("data"), P()),
            out_specs=P("data"),
            check_vma=False,
        )
    )(state.params, x, jax.random.PRNGKey(0))
    z = np.asarray(latents)  # [16, 4]; rows 0,2,4,... live on different shards
    per_shard = z.reshape(8, 2, 4)
    # identical inputs, per-shard keys: shard means must differ
    assert np.unique(per_shard.mean(axis=(1, 2))).size == 8


def test_spmd_step_updates_ema(eight_devices):
    """EMA tracking works through the explicit shard_map path too."""
    mesh = make_mesh(8)
    model = MLPVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,))
    bundle = build_optimizer(
        None, param_group_label, optimizer="SGD", lr=1e-3, scheduler="OneCycle", total_steps=4
    )
    state = create_train_state(
        model, bundle.tx, jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 1)), ema=True
    )
    state = replicate(state, mesh)
    x = jax.device_put(
        np.random.default_rng(1).uniform(0, 1, (16, 16, 16, 1)).astype(np.float32),
        batch_sharding(mesh),
    )
    p0 = jax.device_get(state.params)
    step = make_spmd_train_step(model, bundle.tx, KL, mesh, donate=False, ema_decay=0.5)
    s1, lo, _ = step(state, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(lo.loss))
    expected = jax.tree_util.tree_map(lambda e, p: 0.5 * e + 0.5 * np.asarray(p), p0, s1.params)
    for a, b in zip(jax.tree_util.tree_leaves(s1.ema_params), jax.tree_util.tree_leaves(expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_spmd_step_free_bits(eight_devices):
    """--free-bits composes with the explicit shard_map step: the loss
    carries the floored KL term while the reported KL stays true."""
    mesh = make_mesh(8)
    model = MLPVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,))
    bundle = build_optimizer(
        None, param_group_label, optimizer="SGD", lr=1e-3, scheduler="OneCycle", total_steps=2
    )
    state = create_train_state(model, bundle.tx, jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 1)))
    state = replicate(state, mesh)
    x = jax.device_put(
        np.random.default_rng(1).uniform(0, 1, (16, 16, 16, 1)).astype(np.float32),
        batch_sharding(mesh),
    )
    # a floor far above any real per-dim KL at init: the KL term becomes
    # the constant 4 * fb, so loss == recon + w * 4 * fb exactly
    fb = 100.0
    step = make_spmd_train_step(model, bundle.tx, KL, mesh, free_bits=fb, donate=False)
    state, lo, gn = step(state, x, jax.random.PRNGKey(3))
    w = float(lo.kld_weight)
    np.testing.assert_allclose(
        float(lo.loss), float(lo.reconstruction_loss) + w * 4 * fb, rtol=1e-5
    )
    # reported KL is the true KL — far below the floor at init
    assert float(lo.kl) < 4 * fb
    assert np.isfinite(float(gn))


def test_spmd_grad_accum_matches_auto_path(eight_devices):
    """--step-impl shard_map --grad-accum 4 == the auto path at accum=4:
    same noise-neutralization recipe as test_spmd_step_matches_auto_path
    (pinned log_var, SGD, no BN). The microbatch groupings differ
    (per-shard slices vs global slices) but the batch-averaged gradient
    is identical for per-sample losses."""
    mesh = make_mesh(8)
    model = MLPVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,))
    bundle, state0, _ = _setup(model, mesh, optimizer="SGD")
    # 64 rows → local shard slice 8, microbatch 2 at accum=4
    x = jax.device_put(
        np.random.default_rng(3).uniform(0, 1, (64, 16, 16, 1)).astype(np.float32),
        batch_sharding(mesh),
    )
    params = jax.tree_util.tree_map(lambda p: p, state0.params)
    params["fc_var"]["kernel"] = jnp.zeros_like(params["fc_var"]["kernel"])
    params["fc_var"]["bias"] = jnp.full_like(params["fc_var"]["bias"], -60.0)
    state0 = state0.replace(params=params)

    auto_step = make_train_step(model, bundle.tx, KL, log_var_clamp=CLAMP, donate=False, grad_accum=4)
    spmd_step = make_spmd_train_step(
        model, bundle.tx, KL, mesh, log_var_clamp=CLAMP, donate=False, grad_accum=4
    )

    sa, sm = state0, state0
    for _ in range(3):
        sa, lo_a, gn_a = auto_step(sa, x, jax.random.PRNGKey(7))
        sm, lo_m, gn_m = spmd_step(sm, x, jax.random.PRNGKey(7))
        np.testing.assert_allclose(float(lo_a.loss), float(lo_m.loss), rtol=1e-5)
        np.testing.assert_allclose(float(gn_a), float(gn_m), rtol=1e-5)
    for pa, pm in zip(jax.tree_util.tree_leaves(sa.params), jax.tree_util.tree_leaves(sm.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pm), rtol=1e-5, atol=1e-7)
    assert int(sm.step) == 3  # ONE optimizer update per batch


def test_spmd_conv_groupnorm_matches_auto_path(eight_devices):
    """--norm group removes the ONE conv-model semantic difference between
    the step implementations (per-shard BatchNorm statistics): GroupNorm
    normalizes within-sample, so the explicit shard_map step is gradient-
    EXACT vs the auto path for conv architectures too. Same noise
    neutralization as the MLP test (pinned log_var, SGD)."""
    from midi_vae_tpu.models.folded import FoldedVAE

    mesh = make_mesh(8)
    model = FoldedVAE(
        in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(8, 16), fold=2, norm="group"
    )
    bundle, state0, x = _setup(model, mesh, optimizer="SGD")
    assert not state0.batch_stats  # GroupNorm: nothing to sync across shards
    params = jax.tree_util.tree_map(lambda p: p, state0.params)
    params["fc_var"]["kernel"] = jnp.zeros_like(params["fc_var"]["kernel"])
    params["fc_var"]["bias"] = jnp.full_like(params["fc_var"]["bias"], -60.0)
    state0 = state0.replace(params=params)

    auto_step = make_train_step(model, bundle.tx, KL, log_var_clamp=CLAMP, donate=False)
    spmd_step = make_spmd_train_step(model, bundle.tx, KL, mesh, log_var_clamp=CLAMP, donate=False)

    sa, sm = state0, state0
    for _ in range(3):
        sa, lo_a, gn_a = auto_step(sa, x, jax.random.PRNGKey(7))
        sm, lo_m, gn_m = spmd_step(sm, x, jax.random.PRNGKey(7))
        np.testing.assert_allclose(float(lo_a.loss), float(lo_m.loss), rtol=1e-5)
        np.testing.assert_allclose(float(gn_a), float(gn_m), rtol=1e-4)
    for pa, pm in zip(jax.tree_util.tree_leaves(sa.params), jax.tree_util.tree_leaves(sm.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pm), rtol=1e-5, atol=1e-7)


def test_spmd_fused_loss_matches_auto_path(eight_devices):
    """--fused under --step-impl shard_map == the single-device fused
    path: the Pallas ELBO operates on each shard's local batch and its
    mean psums to the global mean. Same noise-neutralization recipe as
    test_spmd_step_matches_auto_path (pinned log_var, SGD, no BN). The
    single-device reference is deliberate: in interpreter mode the
    kernel is an io_callback that XLA's auto-partitioner cannot
    replicate (inside shard_map it is per-shard, which is fine) — and
    8-shard-vs-1-device is the stronger equivalence anyway."""
    mesh = make_mesh(8)
    model = MLPVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,))
    bundle = build_optimizer(
        None, param_group_label, optimizer="SGD", lr=1e-3, scheduler="OneCycle", total_steps=4
    )
    state0 = create_train_state(model, bundle.tx, jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 1)))
    params = jax.tree_util.tree_map(lambda p: p, state0.params)
    params["fc_var"]["kernel"] = jnp.zeros_like(params["fc_var"]["kernel"])
    params["fc_var"]["bias"] = jnp.full_like(params["fc_var"]["bias"], -60.0)
    state0 = state0.replace(params=params)
    x_host = np.random.default_rng(1).uniform(0, 1, (16, 16, 16, 1)).astype(np.float32)
    x = jax.device_put(x_host, batch_sharding(mesh))

    auto_step = make_train_step(
        model, bundle.tx, KL, log_var_clamp=CLAMP, donate=False, fused_loss=True
    )
    spmd_step = make_spmd_train_step(
        model, bundle.tx, KL, mesh, log_var_clamp=CLAMP, donate=False, fused_loss=True
    )

    sa, sm = state0, replicate(state0, mesh)
    for _ in range(3):
        sa, lo_a, gn_a = auto_step(sa, jnp.asarray(x_host), jax.random.PRNGKey(7))
        sm, lo_m, gn_m = spmd_step(sm, x, jax.random.PRNGKey(7))
        np.testing.assert_allclose(float(lo_a.loss), float(lo_m.loss), rtol=1e-5)
        np.testing.assert_allclose(float(gn_a), float(gn_m), rtol=1e-4)
    for pa, pm in zip(jax.tree_util.tree_leaves(sa.params), jax.tree_util.tree_leaves(sm.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pm), rtol=1e-5, atol=1e-7)


def test_spmd_beta_tc_gather_matches_full_batch(eight_devices):
    """The β-TC estimator inside a shard_map body (per-shard latents +
    ``gather_axes``) equals the full-batch computation — value AND
    gradients wrt (z, mu, log_var). This is the property the full-step
    equivalence test cannot isolate (reparam noise enters the TC density
    matrix at O(1), unlike the plain ELBO where pinning log_var makes it
    vanish), so it is tested at the loss level with fixed latents."""
    from jax.sharding import PartitionSpec as P

    from midi_vae_tpu.core.types import EncoderOutput, ModelOutput
    from midi_vae_tpu.losses.tcvae import beta_tc_elbo_loss

    mesh = make_mesh(8)
    rng = np.random.default_rng(5)
    B, D = 16, 4
    z = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    lv = jnp.asarray(rng.normal(size=(B, D)) * 0.1, jnp.float32)
    logits = jnp.asarray(rng.normal(size=(B, 8, 8, 1)), jnp.float32)
    targets = jnp.asarray(rng.uniform(0.0, 1.0, size=(B, 8, 8, 1)), jnp.float32)

    def make_out(z, mu, lv, lg, tg):
        enc = EncoderOutput(mu=mu, log_var=lv, pre_latents=mu)
        return ModelOutput(
            output=jax.nn.sigmoid(lg), logits=lg, input=tg, encoded=enc, latents=z
        )

    kw = dict(tc_beta=6.0, dataset_size=100, kld_weight=1e-3)

    def auto_loss(z, mu, lv):
        return beta_tc_elbo_loss(make_out(z, mu, lv, logits, targets), **kw).loss

    def shard_loss(z, mu, lv):
        def body(z_s, mu_s, lv_s, lg_s, tg_s):
            lo = beta_tc_elbo_loss(
                make_out(z_s, mu_s, lv_s, lg_s, tg_s), gather_axes=("data",), **kw
            )
            return lo.loss[None]

        f = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P("data"),) * 5,
            out_specs=P("data"),
            check_vma=False,
        )
        # psum-mean over shards, exactly what the spmd step reports
        return jnp.mean(f(z, mu, lv, logits, targets))

    la, ga = jax.value_and_grad(auto_loss, argnums=(0, 1, 2))(z, mu, lv)
    lm, gm = jax.value_and_grad(shard_loss, argnums=(0, 1, 2))(z, mu, lv)
    np.testing.assert_allclose(float(la), float(lm), rtol=1e-6)
    for a, m in zip(ga, gm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(m), rtol=1e-5, atol=1e-7)


def test_spmd_beta_tc_full_step_runs(eight_devices):
    """--loss beta-tc under the explicit shard_map step: executes, stays
    finite, and the KL block is identical across shards (every shard
    computes the same gathered decomposition)."""
    mesh = make_mesh(8)
    model = MLPVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,))
    bundle, state, x = _setup(model, mesh)
    step = make_spmd_train_step(
        model, bundle.tx, KL, mesh, donate=False,
        loss_type="beta-tc", tc_beta=6.0, dataset_size=128,
    )
    state, lo, gn = step(state, x, jax.random.PRNGKey(3))
    assert np.isfinite(float(lo.loss)) and np.isfinite(float(gn))
    assert np.isfinite(float(lo.kl))
    assert int(state.step) == 1


def test_spmd_grad_accum_rejects_indivisible_local_batch(eight_devices):
    """Local shard slice (global/8 = 2) not divisible by accum=3 → clear error."""
    import pytest

    mesh = make_mesh(8)
    model = MLPVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,))
    bundle, state, x = _setup(model, mesh, optimizer="SGD")
    step = make_spmd_train_step(model, bundle.tx, KL, mesh, donate=False, grad_accum=3)
    with pytest.raises(ValueError, match="not divisible"):
        step(state, x, jax.random.PRNGKey(0))


def test_spmd_conditional_matches_auto_path(eight_devices):
    """Conditional models under shard_map: labels shard over the data axis
    alongside the images, and the step matches the auto path exactly
    (same noise-neutralization recipe as test_spmd_step_matches_auto_path)."""
    mesh = make_mesh(8)
    model = MLPVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,),
                   num_classes=4)
    bundle, state0, x = _setup(model, mesh, optimizer="SGD")
    y = jax.device_put(
        np.arange(16, dtype=np.int32) % 4, batch_sharding(mesh)
    )
    params = jax.tree_util.tree_map(lambda p: p, state0.params)
    params["fc_var"]["kernel"] = jnp.zeros_like(params["fc_var"]["kernel"])
    params["fc_var"]["bias"] = jnp.full_like(params["fc_var"]["bias"], -60.0)
    state0 = state0.replace(params=params)

    auto_step = make_train_step(model, bundle.tx, KL, log_var_clamp=CLAMP, donate=False)
    spmd_step = make_spmd_train_step(model, bundle.tx, KL, mesh, log_var_clamp=CLAMP, donate=False)
    assert auto_step.conditional and spmd_step.conditional

    sa, sm = state0, state0
    for _ in range(3):
        sa, lo_a, _ = auto_step(sa, x, y, jax.random.PRNGKey(7))
        sm, lo_m, _ = spmd_step(sm, x, y, jax.random.PRNGKey(7))
        np.testing.assert_allclose(float(lo_a.loss), float(lo_m.loss), rtol=1e-6)
    for pa, pm in zip(jax.tree_util.tree_leaves(sa.params), jax.tree_util.tree_leaves(sm.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pm), rtol=1e-5, atol=1e-7)
