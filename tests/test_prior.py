"""PixelCNN code prior (models/prior.py + cli/train_prior.py).

Pins the autoregressive contract: raster-order causality of the masked
convs, exact ancestral sampling, likelihood improvement on structured
data, and the end-to-end two-stage pipeline (VQ-VAE checkpoint → prior
training → structured sampling through decode_indices).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midi_vae_tpu.models.prior import (
    CodePrior,
    causal_mask,
    make_prior_train_step,
    sample_codes_autoregressive,
)


def test_causal_mask_raster_order():
    m = np.asarray(causal_mask(3, 3, include_center=False))[:, :, 0, 0]
    np.testing.assert_array_equal(m, [[1, 1, 1], [1, 0, 0], [0, 0, 0]])
    mb = np.asarray(causal_mask(3, 3, include_center=True))[:, :, 0, 0]
    np.testing.assert_array_equal(mb, [[1, 1, 1], [1, 1, 0], [0, 0, 0]])


def test_prior_is_causal():
    """Changing the code at position t must not change logits at any
    position <= t (raster order) — the autoregressive factorization."""
    prior = CodePrior(num_codes=8, features=16, num_layers=3, kernel_size=3)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (1, 4, 4), 0, 8)
    params = prior.init(key, idx)["params"]
    base = np.asarray(prior.apply({"params": params}, idx))

    t = 9  # position (2, 1)
    i, j = t // 4, t % 4
    idx2 = idx.at[0, i, j].set((idx[0, i, j] + 3) % 8)
    pert = np.asarray(prior.apply({"params": params}, idx2))
    flat_base = base.reshape(-1, 8)
    flat_pert = pert.reshape(-1, 8)
    # positions 0..t unchanged (position t's own logits depend only on <t)
    np.testing.assert_allclose(flat_pert[: t + 1], flat_base[: t + 1], atol=1e-5)
    # strictly-later positions in the receptive field DO see the change
    assert np.abs(flat_pert[t + 1:] - flat_base[t + 1:]).max() > 1e-6


def test_prior_learns_structure():
    """On grids with a deterministic pattern the NLL must collapse toward 0,
    far below the uniform-code entropy."""
    import optax

    K, s = 6, 4
    # pattern: code = (row + col) % K — fully predictable from position
    rows, cols = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    grid = ((rows + cols) % K).astype(np.int32)
    batch = jnp.asarray(np.tile(grid[None], (32, 1, 1)))

    prior = CodePrior(num_codes=K, features=32, num_layers=3, kernel_size=3)
    params = prior.init(jax.random.PRNGKey(0), batch)["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    step = make_prior_train_step(prior, tx)
    nll0 = None
    for _ in range(150):
        params, opt_state, nll = step(params, opt_state, batch)
        if nll0 is None:
            nll0 = float(nll)
    assert float(nll) < 0.2 < nll0  # residual: the unconditioned first position
    ll = prior.apply({"params": params}, batch[:1], method=CodePrior.log_likelihood)
    np.testing.assert_allclose(float(ll), -float(nll) * s * s, rtol=0.3)

    # ancestral samples then reproduce the pattern away from position (0,0)
    draws = sample_codes_autoregressive(prior, params, jax.random.PRNGKey(1), 8, s)
    draws = np.asarray(draws)
    assert draws.shape == (8, s, s) and draws.dtype == np.int32
    match = (draws[:, 1:, :] == grid[None, 1:, :]).mean()
    assert match > 0.9, f"samples diverge from the learned pattern (match={match:.2f})"

    # (continuation conditioning is tested separately on a corpus where the
    # prefix is the ONLY evidence — test_continuation_conditions_on_prefix;
    # this corpus is one constant grid, which the conv memorizes through
    # SAME-padding boundary cues, so a forced foreign prefix half-propagates)


def test_conditional_prior_causal_and_label_sensitive():
    """The class bias must not break raster-order causality, and it must
    actually reach every position (changing y changes all logits)."""
    prior = CodePrior(num_codes=8, features=16, num_layers=3, kernel_size=3, num_classes=4)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (1, 4, 4), 0, 8)
    y = jnp.asarray([2], jnp.int32)
    params = prior.init(key, idx, y)["params"]
    base = np.asarray(prior.apply({"params": params}, idx, y))

    t = 9  # position (2, 1)
    idx2 = idx.at[0, 2, 1].set((idx[0, 2, 1] + 3) % 8)
    pert = np.asarray(prior.apply({"params": params}, idx2, y))
    np.testing.assert_allclose(
        pert.reshape(-1, 8)[: t + 1], base.reshape(-1, 8)[: t + 1], atol=1e-5
    )

    other = np.asarray(prior.apply({"params": params}, idx, jnp.asarray([3], jnp.int32)))
    assert np.abs(other - base).reshape(-1, 8).max(axis=-1).min() > 1e-7, \
        "class bias should reach every grid position"

    with pytest.raises(ValueError, match="class-conditional"):
        prior.apply({"params": params}, idx)


def test_conditional_prior_learns_class_structure():
    """Two classes with disjoint deterministic grids: samples conditioned
    on class c must reproduce class c's pattern — the point of p(codes|y)."""
    import optax

    K, s = 6, 4
    rows, cols = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    patterns = [((rows + cols) % K).astype(np.int32), ((2 * rows) % K).astype(np.int32)]
    batch = jnp.asarray(np.concatenate([np.tile(p[None], (16, 1, 1)) for p in patterns]))
    y = jnp.asarray(np.repeat([0, 1], 16), jnp.int32)

    prior = CodePrior(num_codes=K, features=32, num_layers=3, kernel_size=3, num_classes=2)
    params = prior.init(jax.random.PRNGKey(0), batch, y)["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    step = make_prior_train_step(prior, tx)
    for _ in range(200):
        params, opt_state, nll = step(params, opt_state, batch, y)
    assert float(nll) < 0.2

    for c, pattern in enumerate(patterns):
        draws = np.asarray(sample_codes_autoregressive(
            prior, params, jax.random.PRNGKey(1), 8, s,
            y=jnp.full((8,), c, jnp.int32),
        ))
        # away from the unconditioned first row the class pattern must win
        match = (draws[:, 1:, :] == pattern[None, 1:, :]).mean()
        assert match > 0.9, f"class {c} samples diverge (match={match:.2f})"


def test_sample_codes_range_and_determinism():
    prior = CodePrior(num_codes=5, features=8, num_layers=2, kernel_size=3)
    params = prior.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 3), jnp.int32))["params"]
    a = sample_codes_autoregressive(prior, params, jax.random.PRNGKey(2), 4, 3)
    b = sample_codes_autoregressive(prior, params, jax.random.PRNGKey(2), 4, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(jnp.min(a)) >= 0 and int(jnp.max(a)) < 5


def test_continuation_conditions_on_prefix():
    """Continuation must CONDITION on the forced prefix, not replay a
    memorized marginal: train on constant-valued grids (a different value
    per sample, uniform over codes), where every position simply copies
    its predecessor — the raster prefix is the only evidence for the rest
    of the grid. Forcing a prefix of value c must yield an all-c grid."""
    import optax

    K, s = 6, 4
    rng = np.random.default_rng(0)
    vals = rng.integers(0, K, size=64)
    batch = jnp.asarray(np.broadcast_to(vals[:, None, None], (64, s, s)).astype(np.int32))

    prior = CodePrior(num_codes=K, features=32, num_layers=3, kernel_size=3)
    params = prior.init(jax.random.PRNGKey(0), batch)["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    step = make_prior_train_step(prior, tx)
    for _ in range(200):
        params, opt_state, nll = step(params, opt_state, batch)
    # only position (0,0) is uncertain: NLL -> log(K)/s^2 per position
    assert float(nll) < 2 * np.log(K) / (s * s)

    mask = np.zeros((s, s), bool)
    mask[0, :] = True  # row 0 = raster prefix → exact p(rest | prefix)
    for c in range(K):
        known = jnp.full((8, s, s), c, jnp.int32)
        cont = np.asarray(sample_codes_autoregressive(
            prior, params, jax.random.PRNGKey(c), 8, s,
            known=known, known_mask=jnp.asarray(mask),
        ))
        match = (cont == c).mean()
        assert match > 0.95, f"continuation of constant-{c} prefix diverges (match={match:.2f})"


def test_forced_sampling_identity_prefix_exactness_and_validation():
    """known/known_mask contract: a full mask reproduces the known grid
    exactly; forcing later positions does not perturb the draw stream at
    earlier free positions (same key → bit-identical); malformed inputs
    fail loudly."""
    s = 4
    prior = CodePrior(num_codes=5, features=8, num_layers=2, kernel_size=3)
    params = prior.init(jax.random.PRNGKey(0), jnp.zeros((1, s, s), jnp.int32))["params"]
    key = jax.random.PRNGKey(7)
    known = jax.random.randint(jax.random.PRNGKey(3), (4, s, s), 0, 5)

    full = sample_codes_autoregressive(
        prior, params, key, 4, s, known=known, known_mask=jnp.ones((s, s), bool)
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(known))

    # force row 1 (raster positions 4..7): row 0's free draws must match an
    # unconstrained run with the same key bit-for-bit — forcing is
    # implemented as a post-draw select, so the key stream is untouched
    mask = np.zeros((s, s), bool)
    mask[1, :] = True
    forced = np.asarray(sample_codes_autoregressive(
        prior, params, key, 4, s, known=known, known_mask=jnp.asarray(mask)
    ))
    plain = np.asarray(sample_codes_autoregressive(prior, params, key, 4, s))
    np.testing.assert_array_equal(forced[:, 1, :], np.asarray(known)[:, 1, :])
    np.testing.assert_array_equal(forced[:, 0, :], plain[:, 0, :])

    with pytest.raises(ValueError, match="together"):
        sample_codes_autoregressive(prior, params, key, 4, s, known=known)
    with pytest.raises(ValueError, match="together"):
        sample_codes_autoregressive(prior, params, key, 4, s,
                                    known_mask=jnp.ones((s, s), bool))
    with pytest.raises(ValueError, match="known must be"):
        sample_codes_autoregressive(prior, params, key, 4, s, known=known[:2],
                                    known_mask=jnp.ones((s, s), bool))
    with pytest.raises(ValueError, match="known_mask must be"):
        sample_codes_autoregressive(prior, params, key, 4, s, known=known,
                                    known_mask=jnp.ones((s, s + 1), bool))


def test_prior_cli_end_to_end(tmp_path):
    """VQ-VAE train run → prior CLI → generate --prior: the full two-stage
    pipeline through the real entry points."""
    import os

    from midi_vae_tpu.cli.generate import cli as generate_cli
    from midi_vae_tpu.cli.train_prior import cli as prior_cli, load_prior
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=32,
        arch="VQVAE",
        n_features=8,
        hidden_dims=(8, 16, 32, 32),
        codebook_size=16,
        kld_weight=0.25,
        epochs=1,
        batch_size_per_device=16,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "models"),
        run_name="vqp", run_id="p1",
        log_images=False,
    )
    run(config)
    ckpt = os.path.join(
        str(tmp_path / "models"), "vae-lines-synthetic", "vqp__p1", "checkpoint_latest.msgpack"
    )
    prior_cli(["--checkpoint", ckpt, "--epochs", "2", "--batch-size", "64",
               "--features", "16", "--layers", "2", "--kernel-size", "3"])
    prior_path = os.path.join(os.path.dirname(ckpt), "prior_latest.msgpack")
    assert os.path.isfile(prior_path)
    prior, params, pcfg = load_prior(prior_path)
    assert pcfg["num_codes"] == 16 and pcfg["grid"] == 2
    assert np.isfinite(pcfg["final_nll"])

    out_png = str(tmp_path / "prior_samples.png")
    generate_cli(["--checkpoint", ckpt, "--mode", "sample", "--prior", prior_path,
                  "-n", "4", "--out", out_png])
    assert os.path.isfile(out_png)

    # continuation: encode eval rolls, keep 1 of 2 code columns, prior
    # writes the rest (grid is 2x2 at 32 px)
    out_cont = str(tmp_path / "continued.png")
    generate_cli(["--checkpoint", ckpt, "--mode", "continue", "--prior", prior_path,
                  "-n", "4", "--keep-cols", "1", "--out", out_cont])
    assert os.path.isfile(out_cont)
    with pytest.raises(SystemExit, match="--mode continue needs --prior"):
        generate_cli(["--checkpoint", ckpt, "--mode", "continue", "-n", "2",
                      "--out", str(tmp_path / "x.png")])
    with pytest.raises(SystemExit, match="--keep-cols must be in"):
        generate_cli(["--checkpoint", ckpt, "--mode", "continue", "--prior", prior_path,
                      "-n", "2", "--keep-cols", "2", "--out", str(tmp_path / "x.png")])
    with pytest.raises(SystemExit, match="--keep-cols applies"):
        generate_cli(["--checkpoint", ckpt, "--mode", "sample", "--prior", prior_path,
                      "-n", "2", "--keep-cols", "1", "--out", str(tmp_path / "x.png")])

    # tokenized-corpus export rides the same encoding path (--codes-out)
    from midi_vae_tpu.cli.evaluate import cli as evaluate_cli

    codes_npz = str(tmp_path / "codes.npz")
    evaluate_cli(["--checkpoint", ckpt, "--partition", "test", "--codes-out", codes_npz])
    z = np.load(codes_npz)
    assert z["codes_test"].dtype == np.int32
    assert z["codes_test"].shape[1:] == (2, 2)
    assert z["codes_test"].min() >= 0 and z["codes_test"].max() < 16

    # class-conditional prior over the same (unconditional) VQ-VAE:
    # labels come from the dataset; --label steers sampling
    cond_path = str(tmp_path / "prior_cond.msgpack")
    prior_cli(["--checkpoint", ckpt, "--epochs", "2", "--batch-size", "64",
               "--features", "16", "--layers", "2", "--kernel-size", "3",
               "--conditional", "--out", cond_path])
    _, _, ccfg = load_prior(cond_path)
    assert ccfg["num_classes"] > 0
    out_cond = str(tmp_path / "cond_samples.png")
    generate_cli(["--checkpoint", ckpt, "--mode", "sample", "--prior", cond_path,
                  "-n", "4", "--label", "1", "--out", out_cond])
    assert os.path.isfile(out_cond)

    # guards: --label with an unconditional prior; out-of-range label
    with pytest.raises(SystemExit, match="class-conditional prior"):
        generate_cli(["--checkpoint", ckpt, "--mode", "sample", "--prior", prior_path,
                      "-n", "2", "--label", "1", "--out", str(tmp_path / "x.png")])
    with pytest.raises(SystemExit, match="--label must be in"):
        generate_cli(["--checkpoint", ckpt, "--mode", "sample", "--prior", cond_path,
                      "-n", "2", "--label", "99", "--out", str(tmp_path / "x.png")])

    # --mode continue with no --label passes DATASET labels to the prior:
    # values outside the prior's class range must fail loudly, not be
    # silently clipped by the on-device gather. Simulate a prior trained
    # on fewer classes by shrinking num_classes in its loaded config.
    from unittest import mock

    import midi_vae_tpu.cli.train_prior as tp_mod

    real_load_prior = tp_mod.load_prior

    def load_prior_one_class(path):
        prior_m, params_m, pcfg_m = real_load_prior(path)
        pcfg_m = dict(pcfg_m, num_classes=1)
        return prior_m, params_m, pcfg_m

    with mock.patch.object(tp_mod, "load_prior", load_prior_one_class):
        with pytest.raises(SystemExit, match="outside this prior's class range"):
            generate_cli(["--checkpoint", ckpt, "--mode", "continue", "--prior", cond_path,
                          "-n", "8", "--keep-cols", "1", "--out", str(tmp_path / "x.png")])


def test_load_prior_rejects_non_prior_checkpoint(tmp_path):
    from midi_vae_tpu.cli.train_prior import load_prior
    from midi_vae_tpu.io.checkpoint import save_checkpoint

    path = str(tmp_path / "not_a_prior.msgpack")
    save_checkpoint(path, {"params": {}}, config={"kind": "something-else"})
    with pytest.raises(ValueError, match="not a VQ code-prior"):
        load_prior(path)


def test_generate_prior_flag_guards(tmp_path):
    """--prior on a Gaussian checkpoint (or a non-sample mode) is refused."""
    import os

    from midi_vae_tpu.cli.generate import cli as generate_cli
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=32,
        arch="MLPVAE",
        n_features=4,
        hidden_dims=(32,),
        epochs=1,
        batch_size_per_device=16,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "m"),
        run_name="g", run_id="g1",
        log_images=False,
    )
    run(config)
    ckpt = os.path.join(str(tmp_path / "m"), "vae-lines-synthetic", "g__g1",
                        "checkpoint_latest.msgpack")
    with pytest.raises(SystemExit, match="VQVAE"):
        generate_cli(["--checkpoint", ckpt, "--mode", "sample", "--prior", "whatever.msgpack"])

    # --codes-out needs a discrete checkpoint too
    from midi_vae_tpu.cli.evaluate import cli as evaluate_cli

    with pytest.raises(SystemExit, match="Gaussian latent"):
        evaluate_cli(["--checkpoint", ckpt, "--partition", "test",
                      "--codes-out", str(tmp_path / "c.npz")])


# ---------------------------------------------------------------------------
# TransformerCodePrior: same autoregressive contract, attention factorization
# ---------------------------------------------------------------------------


def _tiny_transformer(num_codes=8, num_classes=0):
    from midi_vae_tpu.models.prior import TransformerCodePrior

    return TransformerCodePrior(
        num_codes=num_codes, features=32, num_layers=2, num_heads=2,
        num_classes=num_classes,
    )


def test_transformer_prior_is_causal():
    """Changing the code at flat position t must not change logits at any
    position <= t — the BOS shift + causal mask factorization."""
    prior = _tiny_transformer()
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (1, 4, 4), 0, 8)
    params = prior.init(key, idx)["params"]
    base = np.asarray(prior.apply({"params": params}, idx))

    t = 9  # position (2, 1)
    idx2 = idx.at[0, 2, 1].set((idx[0, 2, 1] + 3) % 8)
    pert = np.asarray(prior.apply({"params": params}, idx2))
    np.testing.assert_allclose(
        pert.reshape(-1, 8)[: t + 1], base.reshape(-1, 8)[: t + 1], atol=1e-5
    )
    # full attention: EVERY strictly-later position sees the change
    assert np.abs(pert.reshape(-1, 8)[t + 1:] - base.reshape(-1, 8)[t + 1:]).max(axis=-1).min() > 1e-7


def test_transformer_prior_learns_structure():
    """Deterministic grids: NLL collapses and ancestral samples reproduce
    the pattern — through the SHARED train-step/sampler machinery."""
    import optax

    K, s = 6, 4
    rows, cols = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    grid = ((rows + cols) % K).astype(np.int32)
    batch = jnp.asarray(np.tile(grid[None], (32, 1, 1)))

    prior = _tiny_transformer(num_codes=K)
    params = prior.init(jax.random.PRNGKey(0), batch)["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    step = make_prior_train_step(prior, tx)
    nll0 = None
    for _ in range(200):
        params, opt_state, nll = step(params, opt_state, batch)
        if nll0 is None:
            nll0 = float(nll)
    assert float(nll) < 0.2 < nll0
    ll = prior.apply({"params": params}, batch[:1], method=type(prior).log_likelihood)
    np.testing.assert_allclose(float(ll), -float(nll) * s * s, rtol=0.3)

    draws = np.asarray(sample_codes_autoregressive(prior, params, jax.random.PRNGKey(1), 8, s))
    assert draws.shape == (8, s, s) and draws.dtype == np.int32
    match = (draws[:, 1:, :] == grid[None, 1:, :]).mean()
    assert match > 0.9, f"samples diverge from the learned pattern (match={match:.2f})"


def test_transformer_conditional_causal_and_label_sensitive():
    prior = _tiny_transformer(num_classes=4)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (1, 4, 4), 0, 8)
    y = jnp.asarray([2], jnp.int32)
    params = prior.init(key, idx, y)["params"]
    base = np.asarray(prior.apply({"params": params}, idx, y))

    t = 9
    idx2 = idx.at[0, 2, 1].set((idx[0, 2, 1] + 3) % 8)
    pert = np.asarray(prior.apply({"params": params}, idx2, y))
    np.testing.assert_allclose(
        pert.reshape(-1, 8)[: t + 1], base.reshape(-1, 8)[: t + 1], atol=1e-5
    )

    other = np.asarray(prior.apply({"params": params}, idx, jnp.asarray([3], jnp.int32)))
    assert np.abs(other - base).reshape(-1, 8).max(axis=-1).min() > 1e-7, \
        "class bias should reach every grid position"

    with pytest.raises(ValueError, match="class-conditional"):
        prior.apply({"params": params}, idx)


def test_transformer_prior_cli_and_load_dispatch(tmp_path):
    """--prior-arch transformer round-trips through the CLI, load_prior
    rebuilds the transformer from the checkpoint's arch field, and the
    generate CLI samples from it."""
    import os

    from midi_vae_tpu.cli.generate import cli as generate_cli
    from midi_vae_tpu.cli.train_prior import cli as prior_cli, load_prior
    from midi_vae_tpu.models.prior import TransformerCodePrior
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=32,
        arch="VQVAE",
        n_features=8,
        hidden_dims=(8, 16, 32, 32),
        codebook_size=16,
        kld_weight=0.25,
        epochs=1,
        batch_size_per_device=16,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "models"),
        run_name="vqt", run_id="t1",
        log_images=False,
    )
    run(config)
    ckpt = os.path.join(
        str(tmp_path / "models"), "vae-lines-synthetic", "vqt__t1", "checkpoint_latest.msgpack"
    )
    out = str(tmp_path / "prior_tf.msgpack")
    prior_cli(["--checkpoint", ckpt, "--epochs", "2", "--batch-size", "64",
               "--prior-arch", "transformer", "--features", "16", "--layers", "2",
               "--heads", "2", "--out", out])
    prior, params, pcfg = load_prior(out)
    assert isinstance(prior, TransformerCodePrior)
    assert pcfg["arch"] == "transformer" and pcfg["heads"] == 2
    assert np.isfinite(pcfg["final_nll"])

    out_png = str(tmp_path / "tf_samples.png")
    generate_cli(["--checkpoint", ckpt, "--mode", "sample", "--prior", out,
                  "-n", "4", "--out", out_png])
    assert os.path.isfile(out_png)


def test_load_prior_defaults_to_pixelcnn_for_legacy_checkpoints(tmp_path):
    """Pre-round-3 prior checkpoints carry no arch field — they must load
    as the PixelCNN they were trained as."""
    from midi_vae_tpu.cli.train_prior import load_prior
    from midi_vae_tpu.io.checkpoint import save_checkpoint
    from midi_vae_tpu.models.prior import CodePrior

    prior = CodePrior(num_codes=8, features=16, num_layers=2, kernel_size=3)
    params = prior.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2), jnp.int32))["params"]
    path = str(tmp_path / "legacy.msgpack")
    save_checkpoint(path, {"params": params}, config={
        "kind": "vq-code-prior", "num_codes": 8, "grid": 2,
        "features": 16, "layers": 2, "kernel_size": 3, "num_classes": 0,
    })
    loaded, lparams, _ = load_prior(path)
    assert isinstance(loaded, CodePrior)
    idx = jnp.zeros((1, 2, 2), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(loaded.apply({"params": lparams}, idx)),
        np.asarray(prior.apply({"params": params}, idx)), atol=1e-6)


def test_held_out_nll_ragged_and_stored(tmp_path):
    """held_out_nll weights every grid once (ragged tail included) and the
    CLI stores test_nll in the prior checkpoint."""
    import os

    from midi_vae_tpu.cli.train_prior import cli as prior_cli, held_out_nll, load_prior
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    # unit: ragged batching must equal one full-batch evaluation
    prior = CodePrior(num_codes=8, features=16, num_layers=2, kernel_size=3)
    params = prior.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 3), jnp.int32))["params"]
    grids = np.asarray(jax.random.randint(jax.random.PRNGKey(1), (7, 3, 3), 0, 8), np.int32)
    full = held_out_nll(prior, params, grids, None, bs=7)
    ragged = held_out_nll(prior, params, grids, None, bs=3)  # 3 + 3 + 1
    np.testing.assert_allclose(ragged, full, rtol=1e-5)

    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=32,
        arch="VQVAE",
        n_features=8,
        hidden_dims=(8, 16, 32, 32),
        codebook_size=16,
        kld_weight=0.25,
        epochs=1,
        batch_size_per_device=16,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "models"),
        run_name="vqn", run_id="n1",
        log_images=False,
    )
    run(config)
    ckpt = os.path.join(
        str(tmp_path / "models"), "vae-lines-synthetic", "vqn__n1", "checkpoint_latest.msgpack"
    )
    out = str(tmp_path / "prior_nll.msgpack")
    prior_cli(["--checkpoint", ckpt, "--epochs", "2", "--batch-size", "64",
               "--features", "16", "--layers", "2", "--kernel-size", "3", "--out", out])
    _, _, pcfg = load_prior(out)
    assert pcfg["test_nll"] is not None and np.isfinite(pcfg["test_nll"])
    assert 0.0 < pcfg["test_nll"] < np.log(16) * 2  # nats/position, sane range

    # --no-eval skips it
    out2 = str(tmp_path / "prior_noeval.msgpack")
    prior_cli(["--checkpoint", ckpt, "--epochs", "1", "--batch-size", "64",
               "--features", "16", "--layers", "2", "--kernel-size", "3",
               "--no-eval", "--out", out2])
    _, _, pcfg2 = load_prior(out2)
    assert pcfg2["test_nll"] is None


# -- framework-grade prior trainer (round 4) --------------------------------
# Mid-training checkpointing with exact preemption resume, scan-chunked
# device-resident dispatch, data parallelism, bf16, and the conditional
# label-validation guards.


@pytest.fixture(scope="module")
def vq_ckpt(tmp_path_factory):
    """One tiny trained VQ-VAE shared by the prior-trainer tests."""
    import os

    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    root = tmp_path_factory.mktemp("vq_for_prior")
    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=32,
        arch="VQVAE",
        n_features=8,
        hidden_dims=(8, 16, 32, 32),
        codebook_size=16,
        kld_weight=0.25,
        epochs=1,
        batch_size_per_device=32,
        num_devices=1,
        seed=0,
        models_dir=str(root / "models"),
        run_name="vqf", run_id="f1",
        log_images=False,
    )
    run(config)
    return os.path.join(
        str(root / "models"), "vae-lines-synthetic", "vqf__f1", "checkpoint_latest.msgpack"
    )


def _prior_args(ckpt, out, epochs, extra=()):
    return ["--checkpoint", ckpt, "--epochs", str(epochs), "--batch-size", "64",
            "--features", "16", "--layers", "2", "--kernel-size", "3",
            "--out", out, *extra]


def _max_param_diff(pa, pb):
    la, lb = jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)
    return max(float(np.abs(np.asarray(a) - np.asarray(b)).max()) for a, b in zip(la, lb))


def test_prior_resume_matches_uninterrupted(tmp_path, vq_ckpt):
    """kill-9 contract: train 2 epochs, resume to 4 == one 4-epoch run.

    Epoch-keyed host permutations + checkpointed optimizer state make the
    resumed curve bitwise-continue (the main trainer's resume guarantee,
    reference train.py:320-329 semantics)."""
    from midi_vae_tpu.cli.train_prior import cli as prior_cli, load_prior

    a = str(tmp_path / "a.msgpack")
    prior_cli(_prior_args(vq_ckpt, a, 2, ["--no-eval", "--scan-steps", "4"]))
    prior_cli(_prior_args(vq_ckpt, a, 4, ["--scan-steps", "4"]))  # resumes from epoch 2
    b = str(tmp_path / "b.msgpack")
    prior_cli(_prior_args(vq_ckpt, b, 4, ["--scan-steps", "4"]))

    _, pa, ca = load_prior(a)
    _, pb, cb = load_prior(b)
    assert _max_param_diff(pa, pb) < 1e-6
    assert abs(ca["test_nll"] - cb["test_nll"]) < 1e-6
    # counters continued, not restarted
    from midi_vae_tpu.io.checkpoint import load_checkpoint

    pay = load_checkpoint(a)
    assert int(pay["epoch"]) == 4
    assert int(pay["total_step"]) == int(load_checkpoint(b)["total_step"])


def test_prior_scan_chunk_invariance(tmp_path, vq_ckpt):
    """--scan-steps is a dispatch knob, not a math knob: fusing 1 vs 8
    steps per compiled chunk must produce identical parameters."""
    from midi_vae_tpu.cli.train_prior import cli as prior_cli, load_prior

    a = str(tmp_path / "s1.msgpack")
    b = str(tmp_path / "s8.msgpack")
    prior_cli(_prior_args(vq_ckpt, a, 2, ["--no-eval", "--scan-steps", "1"]))
    prior_cli(_prior_args(vq_ckpt, b, 2, ["--no-eval", "--scan-steps", "8"]))
    _, pa, _ = load_prior(a)
    _, pb, _ = load_prior(b)
    assert _max_param_diff(pa, pb) < 1e-6


def test_prior_dp_matches_single_device(tmp_path, vq_ckpt, eight_devices):
    """--num-devices 8 shards the batch over the mesh; the psum-reduced
    gradients must train to (numerically) the same parameters."""
    from midi_vae_tpu.cli.train_prior import cli as prior_cli, load_prior

    a = str(tmp_path / "d1.msgpack")
    b = str(tmp_path / "d8.msgpack")
    prior_cli(_prior_args(vq_ckpt, a, 2, ["--no-eval", "--num-devices", "1"]))
    prior_cli(_prior_args(vq_ckpt, b, 2, ["--no-eval", "--num-devices", "8"]))
    _, pa, _ = load_prior(a)
    _, pb, _ = load_prior(b)
    # same math, different reduction order: rounding-level drift only
    assert _max_param_diff(pa, pb) < 5e-4


def test_prior_bf16_and_metrics_jsonl(tmp_path, vq_ckpt):
    """--bf16 trains to a finite NLL with f32 params; metrics.jsonl gets
    the reference namespaces (training/{stepwise,epochwise}, eval/test)."""
    import json
    import os

    from midi_vae_tpu.cli.train_prior import cli as prior_cli, load_prior

    out = str(tmp_path / "bf16.msgpack")
    prior_cli(_prior_args(vq_ckpt, out, 2, ["--bf16", "--log-interval", "2"]))
    _, params, pcfg = load_prior(out)
    assert pcfg["bf16"] is True
    assert np.isfinite(pcfg["final_nll"]) and np.isfinite(pcfg["test_nll"])
    assert all(np.asarray(p).dtype == np.float32 for p in jax.tree_util.tree_leaves(params))

    jsonl = os.path.join(str(tmp_path), "prior", "metrics.jsonl")
    assert os.path.isfile(jsonl)
    keys = set()
    with open(jsonl) as f:
        for line in f:
            keys.update(json.loads(line))
    assert any(k.startswith("training/stepwise/") for k in keys)
    assert "training/epochwise/nll" in keys
    assert "eval/test/nll" in keys


def test_prior_resume_arch_comes_from_checkpoint(tmp_path, vq_ckpt):
    """Resume restores the architecture from the checkpoint (warning on a
    differing CLI value) — a changed width would be unloadable."""
    from midi_vae_tpu.cli.train_prior import cli as prior_cli, load_prior

    out = str(tmp_path / "arch.msgpack")
    prior_cli(_prior_args(vq_ckpt, out, 1, ["--no-eval"]))
    with pytest.warns(UserWarning, match="prior features differs"):
        prior_cli(["--checkpoint", vq_ckpt, "--epochs", "2", "--batch-size", "64",
                   "--features", "32", "--layers", "2", "--kernel-size", "3",
                   "--out", out, "--no-eval"])
    _, _, pcfg = load_prior(out)
    assert pcfg["features"] == 16  # checkpoint won


def test_transformer_features_heads_validation():
    """--features must divide evenly into --heads for the transformer
    (flax would only fail deep inside init otherwise)."""
    from midi_vae_tpu.cli.train_prior import cli as prior_cli

    with pytest.raises(SystemExit, match="divisible by --heads"):
        prior_cli(["--checkpoint", "whatever.msgpack", "--prior-arch", "transformer",
                   "--features", "30", "--heads", "4"])


def test_validate_labels_drops_out_of_range():
    """An out-of-range label one-hots to a zero row and silently evaluates
    as unconditional — validate_labels drops those grids with a report."""
    from midi_vae_tpu.cli.train_prior import validate_labels

    grids = np.arange(4 * 2 * 2, dtype=np.int32).reshape(4, 2, 2)
    labels = np.asarray([0, 1, 7, -1], np.int32)
    g, l = validate_labels(grids, labels, num_classes=2, partition="held-out")
    np.testing.assert_array_equal(l, [0, 1])
    np.testing.assert_array_equal(g, grids[:2])
    # in-range labels pass through untouched (same objects)
    g2, l2 = validate_labels(grids, np.zeros(4, np.int32), 2, "held-out")
    assert g2 is grids


def test_conditional_prior_steers_density_on_midi_corpus(tmp_path):
    """Round-4 regression (mirrors the CVAE steering test): a conditional
    CODE PRIOR over an unconditional VQ-VAE on the MIDI corpus steers
    decoded note density in the requested direction — class control lives
    in the prior (van den Oord 2017 §5.1), and it is semantically
    load-bearing end-to-end (prior draws → decode_indices), not just
    architecturally present. Pins the direction the measured table in
    RESULTS.md (two-stage generation dossier) reports at full scale."""
    import os

    from midi_vae_tpu.cli.generate import _load_model_and_state
    from midi_vae_tpu.cli.train_prior import cli as prior_cli, load_prior
    from midi_vae_tpu.models.prior import sample_codes_autoregressive
    from midi_vae_tpu.models.vq import VQVAE
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    config = TrainConfig(
        dataset_name="midi-synthetic-dense",  # ~8.5% fill: collapse-safe
        transform_type="midi",
        image_size=64,  # grid 4x4: a 2x2 code grid is too coarse to carry density
        arch="VQVAE",
        n_features=8,
        hidden_dims=(8, 16, 32, 32),
        codebook_size=32,
        kld_weight=0.25,
        epochs=6,
        batch_size_per_device=64,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "m"),
        log_images=False,
        run_name="vqd",
        run_id="d1",
        bce_targets="raw",
    )
    run(config)
    prior_path = str(tmp_path / "prior_cond.msgpack")
    prior_cli(["--checkpoint", config.checkpoint_path, "--epochs", "25",
               "--batch-size", "128", "--features", "32", "--layers", "3",
               "--kernel-size", "3", "--conditional", "--out", prior_path, "--no-eval"])

    model, params, bs, *_ = _load_model_and_state(config.checkpoint_path)
    prior, pparams, pcfg = load_prior(prior_path)
    k = int(pcfg["num_classes"])
    assert k == 4  # the factory's density buckets
    key = jax.random.PRNGKey(0)  # same draws per class: only the label moves
    mean_prob = []
    for c in (0, k - 1):  # sparsest vs densest bucket
        idx = sample_codes_autoregressive(
            prior, pparams, key, 64, model.last_conv_size,
            y=jnp.full((64,), c, jnp.int32),
        )
        out = model.apply({"params": params, "batch_stats": bs}, idx,
                          method=VQVAE.decode_indices)
        mean_prob.append(float(np.asarray(out).mean()))
    assert mean_prob[1] > 1.2 * mean_prob[0], mean_prob


def test_augment_passes_multiply_corpus(tmp_path, vq_ckpt, capsys):
    """--augment-passes N re-encodes the train partition under the
    TRAIN-time transforms (fresh shift/crop draws per pass), multiplying
    the code corpus (N+1)x; the run still trains and saves."""
    from midi_vae_tpu.cli.train_prior import cli as prior_cli, load_prior

    out = str(tmp_path / "aug.msgpack")
    prior_cli(_prior_args(vq_ckpt, out, 1, ["--no-eval", "--augment-passes", "2"]))
    captured = capsys.readouterr().out
    # the clean pass prints "encoded N [...] code grids"; the augment
    # report must show exactly 3x that corpus
    import re

    m = re.search(r"encoded (\d+) \[", captured)
    m2 = re.search(r"augment passes x2: corpus now (\d+) grids", captured)
    assert m and m2, captured
    clean, total = int(m.group(1)), int(m2.group(1))
    # each augment pass re-encodes the train partition minus the ragged
    # tail the train-mode loader drops (at most one batch per pass)
    assert 2 * clean < total <= 3 * clean
    _, _, pcfg = load_prior(out)
    assert np.isfinite(pcfg["final_nll"])


def test_augment_passes_beat_clean_twin_on_heldout_nll(tmp_path):
    """Round-5 regression pinning the repo's best measured quality lever:
    code-space augmentation (`--augment-passes`) must beat the clean twin
    on HELD-OUT NLL, not just multiply the corpus. At full scale the
    measured gap is 0.966 -> 0.679 nats/position (transformer, aug=3,
    benchmarks/sampling_sweep_vq16_aug.json); this pins the direction at
    test scale on the same protocol (pianoroll train transforms provide
    the pitch/time-shift draws the augmentation re-encodes under)."""
    from midi_vae_tpu.cli.train_prior import cli as prior_cli, load_prior
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    config = TrainConfig(
        dataset_name="midi-synthetic-dense",  # ~8.5% fill: collapse-safe
        transform_type="pianoroll",  # train-time pitch/time shifts
        image_size=64,
        arch="VQVAE",
        n_features=8,
        hidden_dims=(8, 16, 32, 32),
        codebook_size=32,
        kld_weight=0.25,
        epochs=4,
        batch_size_per_device=64,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "m"),
        log_images=False,
        run_name="vqa",
        run_id="a1",
        bce_targets="raw",
    )
    run(config)

    nll = {}
    for aug in (0, 3):
        out = str(tmp_path / f"prior_a{aug}.msgpack")
        prior_cli(["--checkpoint", config.checkpoint_path, "--epochs", "12",
                   "--batch-size", "128", "--features", "32", "--layers", "3",
                   "--kernel-size", "3", "--augment-passes", str(aug),
                   "--seed", "0", "--out", out])
        _, _, pcfg = load_prior(out)
        nll[aug] = float(pcfg["test_nll"])
        assert pcfg["augment_passes"] == aug  # provenance recorded
    assert nll[3] < nll[0], (
        f"aug=3 prior must beat its clean twin on held-out NLL: {nll}"
    )


def test_augment_passes_draw_distinct_grids(vq_ckpt):
    """Each augmentation pass must see DIFFERENT code grids (the whole
    point): train-transform encodes at different epochs differ from the
    clean encode and from each other."""
    from midi_vae_tpu.cli.generate import _load_model_and_state
    from midi_vae_tpu.cli.train_prior import encode_corpus
    from midi_vae_tpu.data.fetch import fetch_dataset
    from midi_vae_tpu.data.pipeline import make_loader
    from midi_vae_tpu.data.transforms import get_transform

    model, params, batch_stats, cfg, image_size, _, dataset = _load_model_and_state(vq_ckpt)
    transform_train, transform_eval = get_transform(
        cfg.get("transform_type", "digits"), image_size, {}
    )
    train, _, _, _ = fetch_dataset(
        dataset, transform_train=transform_train, transform_eval=transform_eval
    )
    # train=False → deterministic order, so pass-to-pass differences are
    # transform draws, not shuffling
    grids = []
    for ep in (1, 2):
        loader = make_loader(train, 64, train=False, seed=0)
        # force the train spec onto the eval-ordered loader by encoding
        # through a train=True loader with a fixed seed instead
        if hasattr(loader, "release"):
            loader.release()
        loader = make_loader(train, 64, train=True, seed=0)
        grids.append(encode_corpus(model, params, batch_stats, loader, epoch=ep))
        if hasattr(loader, "release"):
            loader.release()
    a, b = grids
    n = min(len(a), len(b))
    assert not np.array_equal(a[:n], b[:n])


def test_sampler_is_cached_not_retraced():
    """Round-5 serving fix: repeated sample calls with the same static
    configuration must reuse ONE compiled program (the eager path used
    to re-trace the whole scan per /sample request — ~1s host work for
    ~1ms device work). The cache key is the architecture, not params."""
    from midi_vae_tpu.models.prior import _cached_sampler

    prior = CodePrior(num_codes=8, features=8, num_layers=1, kernel_size=3)
    f1 = _cached_sampler(prior, 2, 4, None, False, False)
    f2 = _cached_sampler(prior, 2, 4, None, False, False)
    assert f1 is f2  # same config -> same jitted callable, no retrace
    # a different static config gets its own program
    f3 = _cached_sampler(prior, 2, 8, None, False, False)
    assert f3 is not f1
    # and the cached path still samples correctly
    params = prior.init(jax.random.PRNGKey(0), jnp.zeros((4, 2, 2), jnp.int32), None)["params"]
    idx = sample_codes_autoregressive(prior, params, jax.random.PRNGKey(1), 4, 2)
    assert idx.shape == (4, 2, 2)
    assert int(np.asarray(idx).min()) >= 0 and int(np.asarray(idx).max()) < 8


def test_nucleus_mask_keeps_minimal_covering_set():
    """nucleus_mask keeps exactly the smallest prefix of codes (by
    probability) whose mass reaches top_p, and always keeps the top-1."""
    from midi_vae_tpu.models.prior import nucleus_mask

    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]], jnp.float32))
    # p=0.6: 0.5 alone is < 0.6, so code 1 joins; 0.5+0.3 >= 0.6 stops there
    masked = np.asarray(nucleus_mask(logits, 0.6))
    assert np.isfinite(masked[0, :2]).all() and np.isinf(masked[0, 2:]).all()
    # tiny p: greedy — only the argmax survives
    masked = np.asarray(nucleus_mask(logits, 1e-6))
    assert np.isfinite(masked[0, 0]) and np.isinf(masked[0, 1:]).all()
    # kept logits are unchanged (relative probabilities preserved)
    np.testing.assert_allclose(masked[0, 0], np.asarray(logits)[0, 0], rtol=1e-6)


def test_sample_codes_top_p():
    """top_p=1 matches unrestricted sampling bitwise; tiny top_p is
    greedy decoding; out-of-range raises."""
    from midi_vae_tpu.models.prior import CodePrior, sample_codes_autoregressive

    prior = CodePrior(num_codes=8, features=8, num_layers=2, kernel_size=3)
    params = prior.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2), jnp.int32))["params"]
    key = jax.random.PRNGKey(7)
    base = sample_codes_autoregressive(prior, params, key, 4, 2)
    full = sample_codes_autoregressive(prior, params, key, 4, 2, top_p=1.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(full))

    greedy = sample_codes_autoregressive(prior, params, key, 4, 2, top_p=1e-9)
    # greedy draws are key-independent: another key gives the same grids
    greedy2 = sample_codes_autoregressive(prior, params, jax.random.PRNGKey(99), 4, 2,
                                          top_p=1e-9)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(greedy2))

    with pytest.raises(ValueError, match="top_p"):
        sample_codes_autoregressive(prior, params, key, 4, 2, top_p=0.0)
    with pytest.raises(ValueError, match="top_p"):
        sample_codes_autoregressive(prior, params, key, 4, 2, top_p=1.5)
