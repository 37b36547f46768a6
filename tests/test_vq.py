"""VQ-VAE family: quantizer math, straight-through gradients, training,
inference paths, and SPMD equivalence.

Capability extension over the reference (which implements only the
Gaussian VanillaVAE, midi_autoencoder/models.py:7-272); the tests pin
the van den Oord 2017 semantics: nearest-code assignment, EMA codebook
updates (Appendix A.1), commitment loss, straight-through estimator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midi_vae_tpu.losses.schedules import constant
from midi_vae_tpu.losses.vq import vq_loss
from midi_vae_tpu.models.registry import build_model
from midi_vae_tpu.models.vae import param_group_label
from midi_vae_tpu.models.vq import VQVAE, VectorQuantizerEMA, codebook_metrics
from midi_vae_tpu.train.state import create_train_state, make_loss, make_train_step

COMMIT = constant(0.25)


def _small_vq(input_dim=32, **kw):
    kw.setdefault("hidden_dims", (8, 16, 32, 32))
    kw.setdefault("codebook_size", 32)
    kw.setdefault("latent_dim", 8)
    return build_model("VQVAE", in_channels=1, input_dim=input_dim, **kw)


def _init(model, batch=4, input_dim=32, seed=0):
    x = jax.random.uniform(jax.random.PRNGKey(seed), (batch, input_dim, input_dim, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "reparam": jax.random.PRNGKey(1)}, x, train=True
    )
    return variables, x


# -- quantizer unit tests ----------------------------------------------------


def test_quantizer_nearest_code_assignment():
    q = VectorQuantizerEMA(num_codes=3, embed_dim=2)
    v = q.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)), False)
    # plant a known codebook
    cb = jnp.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    v = {"batch_stats": {**v["batch_stats"], "codebook": cb}}
    z = jnp.array([[0.1, -0.2], [9.0, 1.0], [1.0, 11.0]])
    (z_st, idx) = q.apply(v, z, False)
    assert idx.tolist() == [0, 1, 2]
    np.testing.assert_allclose(np.asarray(z_st), np.asarray(cb)[idx.tolist()], atol=1e-6)


def test_quantizer_ema_update_matches_hand_math():
    decay, eps, K, D = 0.5, 1e-5, 2, 2
    q = VectorQuantizerEMA(num_codes=K, embed_dim=D, decay=decay, epsilon=eps)
    v = q.init(jax.random.PRNGKey(0), jnp.zeros((1, D)), False)
    cb0 = jnp.array([[0.0, 0.0], [10.0, 10.0]])
    cs0 = jnp.array([1.0, 1.0])
    ea0 = jnp.array(cb0)
    v = {"batch_stats": {"codebook": cb0, "cluster_size": cs0, "embed_avg": ea0}}
    z = jnp.array([[1.0, 1.0], [9.0, 9.0], [11.0, 11.0]])  # code 0 gets 1, code 1 gets 2
    (_, _), mut = q.apply(v, z, True, mutable=["batch_stats"])
    bs = mut["batch_stats"]
    counts = np.array([1.0, 2.0])
    dw = np.array([[1.0, 1.0], [20.0, 20.0]])
    cs1 = 0.5 * np.asarray(cs0) + 0.5 * counts
    ea1 = 0.5 * np.asarray(ea0) + 0.5 * dw
    n = cs1.sum()
    smoothed = (cs1 + eps) / (n + K * eps) * n
    np.testing.assert_allclose(np.asarray(bs["cluster_size"]), cs1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bs["embed_avg"]), ea1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bs["codebook"]), ea1 / smoothed[:, None], rtol=1e-6)


def test_quantizer_no_update_in_eval_mode():
    q = VectorQuantizerEMA(num_codes=4, embed_dim=2)
    v = q.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)), False)
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    (_, _), mut = q.apply(v, z, False, mutable=["batch_stats"])
    for name in ("codebook", "cluster_size", "embed_avg"):
        np.testing.assert_array_equal(
            np.asarray(mut["batch_stats"][name]), np.asarray(v["batch_stats"][name])
        )


def test_straight_through_gradient_passes_to_input():
    """d(sum(z_st))/d(z_e) must be identity (the straight-through estimator):
    quantization contributes no gradient of its own."""
    q = VectorQuantizerEMA(num_codes=4, embed_dim=3)
    v = q.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), False)
    z = jax.random.normal(jax.random.PRNGKey(1), (5, 3))

    def f(z):
        z_st, _ = q.apply(v, z, False)
        return jnp.sum(z_st * jnp.arange(1.0, 16.0).reshape(5, 3))

    g = jax.grad(f)(z)
    np.testing.assert_allclose(np.asarray(g), np.arange(1.0, 16.0).reshape(5, 3), atol=1e-6)


# -- model contracts ---------------------------------------------------------


@pytest.mark.parametrize("input_dim", [28, 32, 128])
def test_vqvae_shape_contracts(input_dim):
    model = _small_vq(input_dim=input_dim)
    variables, x = _init(model, batch=2, input_dim=input_dim)
    out = model.apply(variables, x, train=False, rngs={"reparam": jax.random.PRNGKey(2)})
    assert out.output.shape == x.shape
    assert out.logits.shape == x.shape
    s = model.last_conv_size
    assert out.encoded.mu.shape == (2, s * s * model.latent_dim)
    assert out.latents.shape == (2, s * s * model.latent_dim)
    # log_var is identically zero — point-mass posterior
    assert float(jnp.abs(out.encoded.log_var).max()) == 0.0


def test_vqvae_latents_are_codebook_rows():
    model = _small_vq()
    variables, x = _init(model)
    out = model.apply(variables, x, train=False)
    cb = np.asarray(variables["batch_stats"]["quantizer"]["codebook"])
    lat = np.asarray(out.latents).reshape(-1, model.latent_dim)
    # every latent position is exactly one codebook vector
    d = np.abs(lat[:, None, :] - cb[None, :, :]).sum(-1).min(1)
    np.testing.assert_allclose(d, 0.0, atol=1e-5)


def test_encode_decode_roundtrip_and_indices():
    model = _small_vq()
    variables, x = _init(model)
    enc = model.apply(variables, x, train=False, method=VQVAE.encode)
    dec = model.apply(variables, enc.mu, train=False, method=VQVAE.decode)
    assert dec.shape == x.shape
    idx = model.apply(variables, x, method=VQVAE.encode_indices)
    s = model.last_conv_size
    assert idx.shape == (x.shape[0], s, s) and idx.dtype == jnp.int32
    via_idx = model.apply(variables, idx, method=VQVAE.decode_indices)
    # decoding the index grid == decoding the flattened continuous latent
    # (decode quantizes to the same nearest codes first)
    np.testing.assert_allclose(np.asarray(via_idx), np.asarray(dec), atol=1e-5)


def test_vqvae_sample_shapes_and_range():
    model = _small_vq()
    variables, _ = _init(model)
    imgs = model.apply(variables, jax.random.PRNGKey(3), 5, method=VQVAE.sample)
    assert imgs.shape == (5, 32, 32, 1)
    assert 0.0 <= float(imgs.min()) and float(imgs.max()) <= 1.0


def test_registry_guards():
    with pytest.raises(ValueError, match="conditional"):
        build_model("VQVAE", in_channels=1, latent_dim=8, input_dim=32, num_classes=3)
    with pytest.raises(ValueError, match="reference"):
        build_model("VQVAE", in_channels=1, latent_dim=8, input_dim=32, torch_compat=True)
    with pytest.raises(ValueError, match="reparam"):
        build_model("VQVAE", in_channels=1, latent_dim=8, input_dim=32, fused_reparam=True)


# -- loss --------------------------------------------------------------------


def test_vq_loss_values():
    model = _small_vq()
    variables, x = _init(model)
    out = model.apply(variables, x, train=False)
    lo = vq_loss(out, commitment_weight=0.25)
    z_e = np.asarray(out.encoded.mu, np.float32)
    z_q = np.asarray(out.latents, np.float32)
    commit = float(np.mean((z_e - z_q) ** 2))
    np.testing.assert_allclose(float(lo.kl), commit, rtol=1e-5)
    np.testing.assert_allclose(
        float(lo.loss), float(lo.reconstruction_loss) + 0.25 * commit, rtol=1e-5
    )
    np.testing.assert_allclose(float(lo.kld_loss), -commit, rtol=1e-5)


def test_make_loss_vq_option_guards():
    with pytest.raises(ValueError, match="fused"):
        make_loss(loss_type="vq", fused_loss=True)
    with pytest.raises(ValueError, match="log-var-clamp|log_var_clamp"):
        make_loss(loss_type="vq", log_var_clamp=(-10.0, 10.0))
    with pytest.raises(ValueError, match="free-bits|free_bits"):
        make_loss(loss_type="vq", free_bits=0.5)


# -- training ----------------------------------------------------------------


def test_vq_training_decreases_loss_and_uses_codebook():
    import optax

    model = _small_vq()
    tx = optax.adam(2e-3)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (16, 32, 32, 1))
    state = create_train_state(model, tx, key, x)
    step = make_train_step(model, tx, COMMIT, loss_type="vq")
    first = None
    for _ in range(25):
        state, lo, _ = step(state, x, key)
        if first is None:
            first = float(lo.loss)
    assert float(lo.loss) < first
    stats = codebook_metrics(state.batch_stats)
    assert stats["codebook-perplexity"] > 1.0
    assert stats["active-codes"] >= 1


def test_codebook_metrics_empty_for_gaussian_models():
    model = build_model("VanillaVAE", in_channels=1, latent_dim=4, input_dim=32,
                        hidden_dims=(8, 16, 32, 32))
    variables, _ = _init(model)
    assert codebook_metrics(variables["batch_stats"]) == {}
    assert codebook_metrics({}) == {}


def test_vq_grad_accum_matches_plain_step():
    """grad_accum splits the batch but must take the same optimizer step
    (per-sample mean loss) — BN stats differ per-micro, so use GroupNorm."""
    import optax

    model = _small_vq(norm="group")
    tx = optax.sgd(1e-2)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (8, 32, 32, 1))
    s0 = create_train_state(model, tx, key, x)
    plain = make_train_step(model, tx, COMMIT, loss_type="vq", donate=False)
    accum = make_train_step(model, tx, COMMIT, loss_type="vq", grad_accum=2, donate=False)
    s1, lo1, _ = plain(s0, x, key)
    s2, lo2, _ = accum(s0, x, key)
    # the quantizer EMA sees two half-batch updates under accum (like BN
    # running stats), and micro 2 quantizes against micro 1's gently-updated
    # codebook — so agreement is to accumulation tolerance, not bitwise
    np.testing.assert_allclose(float(lo1.loss), float(lo2.loss), rtol=5e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


# -- SPMD --------------------------------------------------------------------


def test_vq_spmd_step_matches_auto_path(eight_devices):
    """Explicit shard_map step == auto path for VQ: GroupNorm removes BN
    stats, the quantizer psums its cluster sums over the mesh axis before
    the EMA update, and there is no sampling noise anywhere — so the two
    paths are gradient- AND codebook-exact."""
    from midi_vae_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
    from midi_vae_tpu.parallel.spmd import make_spmd_train_step
    from midi_vae_tpu.train.optim import build_optimizer

    mesh = make_mesh(8)
    kw = dict(hidden_dims=(8, 16, 32, 32), codebook_size=16, latent_dim=4, norm="group")
    model_auto = _small_vq(input_dim=16, **kw)
    model_spmd = _small_vq(input_dim=16, bn_axis_name=tuple(mesh.axis_names), **kw)

    bundle = build_optimizer(
        None, param_group_label, optimizer="SGD", lr=1e-2, scheduler="OneCycle", total_steps=4
    )
    state0 = create_train_state(model_auto, bundle.tx, jax.random.PRNGKey(0),
                                jnp.zeros((2, 16, 16, 1)))
    state0 = replicate(state0, mesh)
    x = jax.device_put(
        np.random.default_rng(1).uniform(0, 1, (16, 16, 16, 1)).astype(np.float32),
        batch_sharding(mesh),
    )
    auto_step = make_train_step(model_auto, bundle.tx, COMMIT, loss_type="vq", donate=False)
    spmd_step = make_spmd_train_step(model_spmd, bundle.tx, COMMIT, mesh,
                                     loss_type="vq", donate=False)
    sa, sm = state0, state0
    for _ in range(3):
        sa, lo_a, gn_a = auto_step(sa, x, jax.random.PRNGKey(7))
        sm, lo_m, gn_m = spmd_step(sm, x, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(lo_a.loss), float(lo_m.loss), rtol=1e-5)
    np.testing.assert_allclose(float(gn_a), float(gn_m), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(sa.batch_stats), jax.tree_util.tree_leaves(sm.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(sa.params), jax.tree_util.tree_leaves(sm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


# -- folded trunk ------------------------------------------------------------


def test_folded_vqvae_contracts_and_training():
    """FoldedVQVAE: same quantizer grid and code API as the conv trunk,
    folded compute layout — and it trains."""
    import optax

    model = build_model(
        "FoldedVQVAE", in_channels=1, latent_dim=8, input_dim=32,
        hidden_dims=(8, 16, 32, 32), codebook_size=32, fold=8,
    )
    assert model.last_conv_size == 2  # 32 / 2^4 — identical to the conv trunk
    variables, x = _init(model, batch=8)
    out = model.apply(variables, x, train=False)
    assert out.output.shape == x.shape
    assert out.latents.shape == (8, model.flat_latent_dim)
    idx = model.apply(variables, x, method=VQVAE.encode_indices)
    assert idx.shape == (8, 2, 2)
    via_idx = model.apply(variables, idx, method=VQVAE.decode_indices)
    assert via_idx.shape == x.shape

    tx = optax.adam(2e-3)
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, tx, key, x)
    step = make_train_step(model, tx, COMMIT, loss_type="vq")
    first = None
    for _ in range(20):
        state, lo, _ = step(state, x, key)
        if first is None:
            first = float(lo.loss)
    assert float(lo.loss) < first


def test_folded_vqvae_guards():
    kw = dict(in_channels=1, latent_dim=8, input_dim=32, hidden_dims=(8, 16, 32, 32))
    with pytest.raises(ValueError, match="fold >= 2"):
        build_model("FoldedVQVAE", fold=1, **kw).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), train=False
        )
    with pytest.raises(ValueError, match="stem/head"):
        build_model("FoldedVQVAE", stem="s2d", **kw).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)), train=False
        )
    with pytest.raises(ValueError, match="not divisible"):
        build_model("FoldedVQVAE", fold=8, input_dim=28, latent_dim=8,
                    in_channels=1, hidden_dims=(8, 16, 32, 32)).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)), train=False
        )


# -- end-to-end --------------------------------------------------------------


def test_vqvae_end_to_end_train_checkpoint_generate(tmp_path):
    """Full pipeline: CLI-config train run → checkpoint → rebuild via the
    shared loader → all three generation modes produce images."""
    import os

    from midi_vae_tpu.cli.generate import _load_model_and_state
    from midi_vae_tpu.evaluation.inference import interpolate, reconstruct, sample_prior
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=32,
        arch="VQVAE",
        n_features=8,
        hidden_dims=(8, 16, 32, 32),
        codebook_size=32,
        kld_weight=0.25,  # commitment β
        epochs=2,
        batch_size_per_device=16,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "models"),
        run_name="vq", run_id="e2e",
        log_images=False,
    )
    results = run(config)
    assert config.loss_type == "vq"  # auto-selected from the architecture
    assert results["final_test"]["codebook-perplexity"] > 1.0
    assert "active-codes" in results["final_test"]
    ckpt = os.path.join(
        str(tmp_path / "models"), "vae-lines-synthetic", "vq__e2e", "checkpoint_latest.msgpack"
    )
    assert os.path.isfile(ckpt)

    model, params, batch_stats, cfg, image_size, channels, _ = _load_model_and_state(ckpt)
    assert type(model).__name__ == "VQVAE"
    assert model.codebook_size == 32
    key = jax.random.PRNGKey(0)
    s = sample_prior(model, params, batch_stats, key, 4)
    assert s.shape == (4, 32, 32, 1)
    x = jax.random.uniform(key, (2, 32, 32, 1))
    r = reconstruct(model, params, batch_stats, x, key)
    assert r.shape == x.shape
    p = interpolate(model, params, batch_stats, x[:1], x[1:2], steps=3)
    assert p.shape == (3, 1, 32, 32, 1)


def test_vq_serving_service():
    """Checkpoint-style service over a VQ model: the encode wire carries the
    flattened [s·s·D] latent and /sample draws from the EMA marginal."""
    from midi_vae_tpu.serving.server import InferenceService

    model = _small_vq()
    variables, x = _init(model)
    svc = InferenceService.from_parts(
        model, variables["params"], variables["batch_stats"], 32, max_wait_ms=1.0
    )
    try:
        assert svc.latent_dim == model.flat_latent_dim
        r = svc.reconstruct(np.asarray(x, np.float32))
        assert r.shape == x.shape
        enc = svc.encode(np.asarray(x, np.float32))
        assert enc.shape == (x.shape[0], 2 * model.flat_latent_dim)  # mu ‖ log_var(=0)
        np.testing.assert_allclose(enc[:, model.flat_latent_dim:], 0.0, atol=1e-6)
        s = svc.sample(3, seed=0)
        assert s.shape == (3, 32, 32, 1)
    finally:
        svc.close()


def test_vq_aot_export_round_trip(tmp_path):
    from midi_vae_tpu.interop.aot_export import AOTServingBundle, export_serving_programs
    from midi_vae_tpu.serving.server import InferenceService

    model = _small_vq()
    variables, x = _init(model, batch=2)
    art = str(tmp_path / "art")
    manifest = export_serving_programs(
        model, variables["params"], variables["batch_stats"], art, image_size=32, channels=1
    )
    assert manifest["latent_kind"] == "vq"
    assert manifest["latent_dim"] == model.flat_latent_dim

    bundle = AOTServingBundle(art)
    live = model.apply(variables, x, train=False, method=VQVAE.encode)
    out = np.asarray(bundle.encode(np.asarray(x, np.float32)))
    np.testing.assert_allclose(out[:, : model.flat_latent_dim], np.asarray(live.mu), atol=1e-5)

    svc = InferenceService.from_artifact(art, max_wait_ms=1.0)
    try:
        r = svc.reconstruct(np.asarray(x, np.float32))
        assert r.shape == x.shape
        # the artifact has no EMA marginal to sample from — clear refusal,
        # not a silently different (quantized-Gaussian) prior
        with pytest.raises(ValueError, match="VQ"):
            svc.sample(2)
    finally:
        svc.close()


def test_iwae_refuses_vq():
    from midi_vae_tpu.evaluation.iwae import iwae_bound

    model = _small_vq()
    with pytest.raises(ValueError, match="point mass"):
        iwae_bound(None, model, None)


def test_vq_train_step_on_mesh_matches_single_device(eight_devices):
    """jit auto-partitioning over the data mesh must not change the math:
    the quantizer's batch statistics span the global batch either way."""
    import optax

    from midi_vae_tpu.parallel.mesh import batch_sharding, make_mesh, replicate

    model = _small_vq(input_dim=16, hidden_dims=(8, 16, 32, 32), codebook_size=16, latent_dim=4)
    tx = optax.sgd(1e-2)
    key = jax.random.PRNGKey(0)
    xh = np.random.default_rng(2).uniform(0, 1, (16, 16, 16, 1)).astype(np.float32)
    s_single = create_train_state(model, tx, key, jnp.asarray(xh))
    step = make_train_step(model, tx, COMMIT, loss_type="vq", donate=False)
    _, lo_single, _ = step(s_single, jnp.asarray(xh), key)

    mesh = make_mesh(8)
    s_mesh = replicate(create_train_state(model, tx, key, jnp.asarray(xh)), mesh)
    x_mesh = jax.device_put(xh, batch_sharding(mesh))
    _, lo_mesh, _ = step(s_mesh, x_mesh, key)
    np.testing.assert_allclose(float(lo_single.loss), float(lo_mesh.loss), rtol=1e-5)
