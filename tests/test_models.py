"""Shape/dtype contracts and statistics for the model zoo (SURVEY §4 unit tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midi_vae_tpu.core.types import EncoderOutput, ModelOutput
from midi_vae_tpu.models import MLPVAE, VanillaVAE, build_model
from midi_vae_tpu.models.vae import conv_output_size, init_stats, param_group_label


def make_model(input_dim=32, in_channels=1, latent_dim=10, cls=VanillaVAE):
    model = cls(in_channels=in_channels, latent_dim=latent_dim, input_dim=input_dim)
    x = jnp.zeros((2, input_dim, input_dim, in_channels), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        x,
        train=True,
    )
    return model, variables


def test_conv_output_size_matches_torch_formula():
    # torch Conv2d(k=3, s=2, p=1): out = ceil(n / 2) per stage
    assert conv_output_size(32, 4) == 2  # 32→16→8→4→2 (reference hardcode "4 elements" = 2x2, models.py:33)
    assert conv_output_size(28, 4) == 2  # 28→14→7→4→2
    assert conv_output_size(128, 4) == 8  # 128→64→32→16→8
    assert conv_output_size(64, 4) == 4


@pytest.mark.parametrize("input_dim", [28, 32, 128])
def test_forward_shapes(input_dim):
    model, variables = make_model(input_dim=input_dim)
    x = jnp.ones((4, input_dim, input_dim, 1), jnp.float32) * 0.5
    out, mutated = model.apply(
        variables,
        x,
        train=True,
        rngs={"reparam": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert isinstance(out, ModelOutput)
    assert out.output.shape == (4, input_dim, input_dim, 1)
    assert out.logits.shape == (4, input_dim, input_dim, 1)
    assert out.latents.shape == (4, 10)
    assert out.encoded.mu.shape == (4, 10)
    assert out.encoded.log_var.shape == (4, 10)
    assert "batch_stats" in mutated
    # sigmoid output range
    assert float(out.output.min()) >= 0.0
    assert float(out.output.max()) <= 1.0


@pytest.mark.parametrize("input_dim", [32, 128])
def test_s2d_stem_shapes_and_training(input_dim):
    """Space-to-depth stem: same interface/shape contract as the reference
    stem; a gradient step moves its parameters (it trains)."""
    from midi_vae_tpu.models.vae import VanillaVAE

    model = VanillaVAE(in_channels=1, latent_dim=10, input_dim=input_dim, hidden_dims=(32, 64), stem="s2d")
    x = jnp.ones((4, input_dim, input_dim, 1), jnp.float32) * 0.5
    variables = model.init({"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, x, train=True)
    out, _ = model.apply(
        variables, x, train=True, rngs={"reparam": jax.random.PRNGKey(2)}, mutable=["batch_stats"]
    )
    assert out.output.shape == (4, input_dim, input_dim, 1)
    assert "S2DStem_0" in variables["params"]["encoder"]
    # stem conv contracts over 3*3*4 inputs (vs 9 for the 1-channel reference stem)
    assert variables["params"]["encoder"]["S2DStem_0"]["Conv_0"]["kernel"].shape == (3, 3, 4, 32)

    def loss(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"reparam": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
        )
        return jnp.mean((o.output - x) ** 2)

    grads = jax.grad(loss)(variables["params"])
    g = grads["encoder"]["S2DStem_0"]["Conv_0"]["kernel"]
    assert float(jnp.abs(g).max()) > 0.0


@pytest.mark.parametrize("input_dim", [28, 32, 128])
def test_d2s_head_shapes_and_training(input_dim):
    """Depth-to-space head: same output contract as the reference head
    (incl. the center-crop path at 28px); its parameters receive gradient."""
    from midi_vae_tpu.models.vae import VanillaVAE

    model = VanillaVAE(in_channels=1, latent_dim=10, input_dim=input_dim, hidden_dims=(32, 64), head="d2s")
    x = jnp.ones((4, input_dim, input_dim, 1), jnp.float32) * 0.5
    variables = model.init({"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, x, train=True)
    out, _ = model.apply(
        variables, x, train=True, rngs={"reparam": jax.random.PRNGKey(2)}, mutable=["batch_stats"]
    )
    assert out.output.shape == (4, input_dim, input_dim, 1)
    assert "D2SHead_0" not in variables["params"]  # named final_layer via setup
    head = variables["params"]["final_layer"]
    assert head["Conv_1"]["kernel"].shape == (3, 3, 32, 4)  # 4*out_ch channels pre-shuffle

    def loss(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, rngs={"reparam": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
        )
        return jnp.mean((o.output - x) ** 2)

    g = jax.grad(loss)(variables["params"])["final_layer"]["Conv_1"]["kernel"]
    assert float(jnp.abs(g).max()) > 0.0


def test_d2s_pixel_order():
    """depth_to_space is the exact inverse layout of the s2d fold: channel
    block (a, b) of cell (i, j) lands at pixel (2i+a, 2j+b)."""
    from midi_vae_tpu.models.vae import D2SHead

    # bypass convs: feed a tensor through only the shuffle by extracting it
    x = jnp.arange(1 * 2 * 2 * 4, dtype=jnp.float32).reshape(1, 2, 2, 4)
    b, h, w, _ = x.shape
    y = x.reshape(b, h, w, 2, 2, 1).transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, 1)
    # cell (0,0) channels [0,1,2,3] -> pixels (0,0),(0,1),(1,0),(1,1)
    np.testing.assert_array_equal(
        np.asarray(y[0, :2, :2, 0]), np.array([[0.0, 1.0], [2.0, 3.0]])
    )
    del D2SHead  # imported to assert availability


def test_verbose_range_tracing(capfd):
    """Verbose mode streams shape/range lines from inside jit via
    jax.debug.print (reference models.py:126-173 equivalent)."""
    from midi_vae_tpu.models.vae import VanillaVAE

    model = VanillaVAE(in_channels=1, latent_dim=4, input_dim=32, hidden_dims=(8, 16), verbose=True)
    x = jnp.ones((2, 32, 32, 1), jnp.float32) * 0.5
    variables = model.init({"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, x, train=True)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False, rngs={"reparam": jax.random.PRNGKey(2)}).output

    jax.block_until_ready(fwd(variables, x))
    jax.effects_barrier()
    out = capfd.readouterr().out
    for stage in ("encode/input", "encode/mu", "decode/latents", "decode/logits"):
        assert stage in out, f"missing trace for {stage}: {out[:400]}"
    assert "shape=(2, 32, 32, 1)" in out


def test_s2d_rejects_torch_compat():
    from midi_vae_tpu.models.vae import VanillaVAE

    model = VanillaVAE(in_channels=1, latent_dim=4, input_dim=32, hidden_dims=(8, 16), stem="s2d", torch_compat=True)
    with pytest.raises(ValueError, match="reference stem"):
        model.init(
            {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
            jnp.zeros((1, 32, 32, 1)),
            train=True,
        )


def test_eval_mode_uses_running_stats():
    model, variables = make_model()
    x = jnp.ones((4, 32, 32, 1), jnp.float32)
    out = model.apply(variables, x, train=False, rngs={"reparam": jax.random.PRNGKey(2)})
    assert out.output.shape == (4, 32, 32, 1)


def test_encode_decode_roundtrip_shapes():
    model, variables = make_model(input_dim=32)
    x = jnp.ones((3, 32, 32, 1), jnp.float32)
    enc = model.apply(variables, x, train=False, method=VanillaVAE.encode)
    assert isinstance(enc, EncoderOutput)
    assert enc.pre_latents.shape == (3, 2 * 2 * 256)
    z = jnp.zeros((3, 10))
    recon = model.apply(variables, z, train=False, method=VanillaVAE.decode)
    assert recon.shape == (3, 32, 32, 1)


def test_reparameterize_statistics():
    """Reparameterization: z ~ N(mu, exp(log_var)) under fixed key (SURVEY §4)."""
    model, variables = make_model()
    mu = jnp.full((20000, 10), 1.5)
    log_var = jnp.full((20000, 10), jnp.log(0.25))
    z = model.apply(
        variables,
        mu,
        log_var,
        method=VanillaVAE.reparameterize,
        rngs={"reparam": jax.random.PRNGKey(7)},
    )
    assert abs(float(z.mean()) - 1.5) < 0.01
    assert abs(float(z.std()) - 0.5) < 0.01


def test_reparameterize_deterministic_under_key():
    model, variables = make_model()
    mu = jnp.zeros((8, 10))
    log_var = jnp.zeros((8, 10))
    z1 = model.apply(variables, mu, log_var, method=VanillaVAE.reparameterize, rngs={"reparam": jax.random.PRNGKey(3)})
    z2 = model.apply(variables, mu, log_var, method=VanillaVAE.reparameterize, rngs={"reparam": jax.random.PRNGKey(3)})
    z3 = model.apply(variables, mu, log_var, method=VanillaVAE.reparameterize, rngs={"reparam": jax.random.PRNGKey(4)})
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    assert not np.allclose(np.asarray(z1), np.asarray(z3))


def test_xavier_init_statistics():
    """Xavier-uniform kernels: zero mean, bounded by sqrt(6/(fan_in+fan_out)) (models.py:231)."""
    _, variables = make_model()
    k = variables["params"]["fc_mu"]["kernel"]
    fan_in, fan_out = k.shape
    bound = np.sqrt(6.0 / (fan_in + fan_out))
    assert float(jnp.abs(k).max()) <= bound + 1e-6
    assert abs(float(k.mean())) < 0.01
    # biases are zeros (models.py:233)
    assert float(jnp.abs(variables["params"]["fc_mu"]["bias"]).max()) == 0.0


def test_param_group_labels():
    _, variables = make_model()
    labels = jax.tree_util.tree_map_with_path(param_group_label, variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    seen = {"/".join(str(getattr(p, "key", p)) for p in path): lbl for path, lbl in flat}
    assert all(v == "encoder" for k, v in seen.items() if k.startswith(("encoder", "fc_mu", "fc_var")))
    assert all(v == "decoder" for k, v in seen.items() if k.startswith(("decoder", "final_layer")))
    assert {"encoder", "decoder"} == set(seen.values())


def test_param_group_labels_mlp():
    """flax names MLPVAE's list-valued setup stacks encoder_0/encoder_1 —
    the group mapper must file them under 'encoder' (an exact-name match
    silently put them in the decoder group, so --freeze-encoder froze only
    the latent heads while the encoder kept training)."""
    from midi_vae_tpu.models import build_model

    m = build_model("MLPVAE", in_channels=1, latent_dim=8, input_dim=32, hidden_dims=(64, 32))
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        jnp.zeros((2, 32, 32, 1)),
        train=False,
    )
    labels = jax.tree_util.tree_map_with_path(param_group_label, variables["params"])
    for top, sub in variables["params"].items():
        want = "encoder" if top.startswith(("encoder", "fc_mu", "fc_var")) else "decoder"
        got = set(jax.tree_util.tree_leaves(labels[top]))
        assert got == {want}, (top, got)


def test_init_stats_covers_all_kernels():
    _, variables = make_model()
    stats = init_stats(variables["params"])
    assert any("encoder" in k for k in stats)
    assert any("final_layer" in k for k in stats)
    for v in stats.values():
        assert set(v) == {"shape", "mean", "std", "min", "max", "norm"}


def test_mlp_vae_forward():
    model, variables = make_model(cls=MLPVAE)
    x = jnp.ones((4, 32, 32, 1), jnp.float32) * 0.3
    out = model.apply(variables, x, train=True, rngs={"reparam": jax.random.PRNGKey(2)})
    assert out.output.shape == (4, 32, 32, 1)
    assert out.latents.shape == (4, 10)


def test_registry_builds_both_models():
    for arch, cls in [("VanillaVAE", VanillaVAE), ("MLPVAE", MLPVAE)]:
        m = build_model(arch, in_channels=1, latent_dim=5, input_dim=32)
        assert isinstance(m, cls)
        assert m.latent_dim == 5
    with pytest.raises(ValueError):
        build_model("nope", in_channels=1, latent_dim=5, input_dim=32)


def test_multichannel_output_matches_input_channels():
    """The reference hardcodes 1 output channel (models.py:80), breaking RGB inputs; we don't."""
    model, variables = make_model(in_channels=3)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    out, _ = model.apply(
        variables, x, train=True, rngs={"reparam": jax.random.PRNGKey(0)}, mutable=["batch_stats"]
    )
    assert out.output.shape == (2, 32, 32, 3)


@pytest.mark.parametrize("arch_kwargs", [
    dict(arch="VanillaVAE"),
    dict(arch="VanillaVAE", head="d2s"),
    dict(arch="FoldedVAE", fold=4),
    dict(arch="MLPVAE"),
])
def test_output_bias_init_sets_initial_output_rate(arch_kwargs):
    """--output-bias-init: at init the decoder's mean output sigmoid must sit
    near the requested base rate, not at 0.5 (the silence-attractor cliff)."""
    from midi_vae_tpu.data.stats import base_rate_logit
    from midi_vae_tpu.models.registry import build_model

    p = 0.02
    kwargs = dict(arch_kwargs)
    arch = kwargs.pop("arch")
    model = build_model(
        arch, in_channels=1, latent_dim=8, input_dim=32,
        hidden_dims=(16, 32) if arch != "MLPVAE" else (32,),
        output_logit_bias=base_rate_logit(p), **kwargs,
    )
    x = jnp.zeros((4, 32, 32, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, x)
    out = model.apply(variables, x, train=False, rngs={"reparam": jax.random.PRNGKey(2)})
    mean_out = float(out.output.mean())
    # Xavier noise moves it a little off p, but it must be near p, not 0.5
    assert mean_out < 0.15, f"{arch}: mean initial output {mean_out} not pulled toward p={p}"
    # and without the bias the same model starts at ~0.5
    model0 = build_model(
        arch, in_channels=1, latent_dim=8, input_dim=32,
        hidden_dims=(16, 32) if arch != "MLPVAE" else (32,), **kwargs,
    )
    v0 = model0.init({"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, x)
    out0 = model0.apply(v0, x, train=False, rngs={"reparam": jax.random.PRNGKey(2)})
    assert abs(float(out0.output.mean()) - 0.5) < 0.2


@pytest.mark.parametrize("arch", ["VanillaVAE", "FoldedVAE"])
@pytest.mark.parametrize("norm", ["group", "none"])
def test_norm_variants_train_and_eval(arch, norm):
    """--norm group|none: trains a step, has no batch_stats collection, and
    the checkpoint-era BatchNorm default is preserved (norm='batch')."""
    import optax

    from midi_vae_tpu.train.state import create_train_state, make_train_step

    model = build_model(
        arch, in_channels=1, latent_dim=8, input_dim=32, hidden_dims=(16, 32), norm=norm
    )
    x = jnp.zeros((4, 32, 32, 1), jnp.float32)
    tx = optax.adamw(1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), x)
    assert not state.batch_stats, f"{norm} must create no batch_stats collection"
    step = make_train_step(model, tx, kl_schedule=lambda s: 2.5e-4)
    state2, lo, _ = step(state, x, jax.random.PRNGKey(1))
    assert np.isfinite(float(lo.loss))
    # eval-mode forward works without running stats
    out = model.apply(
        {"params": state2.params}, x, train=False, rngs={"reparam": jax.random.PRNGKey(2)}
    )
    assert out.output.shape == (4, 32, 32, 1)


def test_norm_batch_default_keeps_checkpoint_layout():
    """norm='batch' must produce the identical variable tree as before the
    option existed, so every existing checkpoint still loads."""
    model, variables = make_model()
    assert "batch_stats" in variables
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = {jax.tree_util.keystr(p) for p, _ in flat}
    # the BatchNorm sublayers keep their auto-assigned names
    assert any("BatchNorm_0" in n for n in names)


def test_norm_rejections():
    with pytest.raises(ValueError, match="MLPVAE"):
        build_model("MLPVAE", in_channels=1, latent_dim=8, input_dim=32, norm="group")
    with pytest.raises(ValueError, match="torch_compat"):
        build_model(
            "VanillaVAE", in_channels=1, latent_dim=8, input_dim=32,
            torch_compat=True, norm="group",
        )


def test_gn_groups_divides_channels():
    from midi_vae_tpu.models.vae import _gn_groups

    for c in (1, 3, 16, 48, 64, 100, 256):
        g = _gn_groups(c)
        assert c % g == 0 and 1 <= g <= min(32, c)
    assert _gn_groups(48) == 24  # largest divisor <= 32


def test_register_model_extension_hook():
    """New families register with a one-liner and build through the same
    factory (the registry makes the reference's dead --model flag real)."""
    from midi_vae_tpu.models import MLPVAE, build_model
    from midi_vae_tpu.models.registry import MODEL_REGISTRY, register_model

    register_model("MyVAE", MLPVAE)
    try:
        m = build_model("myvae", in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,))
        assert isinstance(m, MLPVAE)
    finally:
        MODEL_REGISTRY.pop("myvae", None)


class TestSubsampledBatchNorm:
    """Round-4 MFU lever (models/vae.py SubsampledBatchNorm): training
    statistics from a strided batch subsample, full-batch normalization,
    flax-BN-identical eval semantics."""

    def _mods(self):
        import flax.linen as nn

        from midi_vae_tpu.models.vae import SubsampledBatchNorm

        return nn, SubsampledBatchNorm

    def test_stride_one_matches_flax_batchnorm(self):
        """stride=1 IS BatchNorm: same output, same running stats."""
        nn, SBN = self._mods()
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 4, 4, 3)) * 2.0 + 1.0
        ours = SBN(stride=1, use_running_average=False)
        ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
        vo = ours.init(jax.random.PRNGKey(1), x)
        vr = ref.init(jax.random.PRNGKey(1), x)
        yo, mo = ours.apply(vo, x, mutable=["batch_stats"])
        yr, mr = ref.apply(vr, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yo), np.asarray(yr), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mo["batch_stats"]["mean"]), np.asarray(mr["batch_stats"]["mean"]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(mo["batch_stats"]["var"]), np.asarray(mr["batch_stats"]["var"]), atol=1e-6
        )

    def test_subsample_estimates_full_stats(self):
        """stride=4 statistics estimate the full-batch moments (large-batch
        Gaussian: within a few percent), and the output is normalized."""
        _, SBN = self._mods()
        x = jax.random.normal(jax.random.PRNGKey(2), (512, 4, 4, 8)) * 3.0 - 2.0
        sbn = SBN(stride=4, use_running_average=False)
        v = sbn.init(jax.random.PRNGKey(1), x)
        y, _ = sbn.apply(v, x, mutable=["batch_stats"])
        y = np.asarray(y)
        assert abs(float(y.mean())) < 0.05
        assert abs(float(y.std()) - 1.0) < 0.05

    def test_eval_mode_uses_running_stats(self):
        _, SBN = self._mods()
        x = jax.random.normal(jax.random.PRNGKey(3), (64, 2, 2, 4)) + 5.0
        train = SBN(stride=4, use_running_average=False)
        v = train.init(jax.random.PRNGKey(1), x)
        # several training applications move the running stats toward the data
        for _ in range(50):
            _, m = train.apply(v, x, mutable=["batch_stats"])
            v = {**v, "batch_stats": m["batch_stats"]}
        ev = SBN(stride=4, use_running_average=True)
        y = np.asarray(ev.apply(v, x))
        assert abs(float(y.mean())) < 0.2  # running mean ≈ 5 subtracted out

    def test_trains_through_cli_config(self, tmp_path):
        """--norm batch-sub4 wires end-to-end through TrainConfig + run()."""
        from midi_vae_tpu.cli.train import get_parser
        from midi_vae_tpu.train.config import TrainConfig
        from midi_vae_tpu.train.loop import run

        args = get_parser().parse_args(["--norm", "batch-sub4"])
        assert args.norm == "batch-sub4"
        import pytest as _pytest

        with _pytest.raises(SystemExit):
            get_parser().parse_args(["--norm", "batch-sub1"])  # N>=2 enforced

        config = TrainConfig(
            dataset_name="vae-lines-synthetic", transform_type="noaug", image_size=32,
            arch="VanillaVAE", n_features=4, hidden_dims=(8, 16, 32, 32),
            norm="batch-sub4", epochs=1, batch_size_per_device=16, num_devices=1,
            seed=0, models_dir=str(tmp_path / "m"), run_name="sbn", run_id="s1",
            log_images=False,
        )
        results = run(config)
        assert np.isfinite(float(results["final_test"]["cross-entropy"]))
