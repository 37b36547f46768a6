"""MIG disentanglement metric: estimator correctness + CLI wiring."""

import numpy as np
import pytest

from midi_vae_tpu.evaluation.disentanglement import (
    discrete_entropy,
    discrete_mutual_information,
    discretize,
    encode_means,
    mig_score,
)


class TestEstimators:
    def test_mi_of_identical_vectors_is_entropy(self):
        y = np.array([0, 0, 1, 1, 2, 2, 2, 2])
        assert discrete_mutual_information(y, y) == pytest.approx(discrete_entropy(y))

    def test_mi_of_independent_vectors_is_zero(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 4, size=20000)
        b = rng.integers(0, 4, size=20000)
        # plug-in estimator has a small positive bias O(bins²/N)
        assert discrete_mutual_information(a, b) < 0.01

    def test_entropy_uniform(self):
        y = np.repeat(np.arange(4), 25)
        assert discrete_entropy(y) == pytest.approx(np.log(4))

    def test_discretize_constant_dim_single_bin(self):
        codes = discretize(np.zeros((10, 3)), bins=20)
        assert (codes == 0).all()

    def test_discretize_monotone(self):
        col = np.linspace(0, 1, 100)[:, None]
        codes = discretize(col, bins=10)[:, 0]
        assert codes.min() == 0 and codes.max() == 9
        assert (np.diff(codes) >= 0).all()


class TestMigScore:
    def _factor(self, n=4000, k=4, seed=0):
        rng = np.random.default_rng(seed)
        return rng.integers(0, k, size=n), rng

    def test_one_aligned_dim_scores_high(self):
        """dim 0 = factor (+tiny noise), others pure noise → MIG near 1."""
        y, rng = self._factor()
        mu = rng.normal(size=(y.size, 6)) * 0.5
        mu[:, 0] = y + rng.normal(size=y.size) * 0.05
        r = mig_score(mu, y)
        assert r["mig"] > 0.7
        assert r["top_dims"][0] == 0

    def test_factor_smeared_over_two_dims_scores_low(self):
        """The same factor duplicated in two dims has no gap → MIG ≈ 0,
        even though the factor is perfectly captured — that is what
        distinguishes MIG from plain informativeness."""
        y, rng = self._factor()
        mu = rng.normal(size=(y.size, 6)) * 0.5
        mu[:, 0] = y + rng.normal(size=y.size) * 0.05
        mu[:, 1] = y + rng.normal(size=y.size) * 0.05
        r = mig_score(mu, y)
        assert r["mig"] < 0.15

    def test_unrelated_labels_score_near_zero(self):
        y, rng = self._factor()
        mu = rng.normal(size=(y.size, 6))
        r = mig_score(mu, y)
        assert r["mig"] < 0.05

    def test_multi_factor_mean_and_per_factor(self):
        y0, rng = self._factor(seed=1)
        y1 = rng.integers(0, 3, size=y0.size)
        mu = rng.normal(size=(y0.size, 5)) * 0.5
        mu[:, 2] = y0 + rng.normal(size=y0.size) * 0.05  # factor 0 → dim 2
        factors = np.stack([y0, y1], axis=1)
        r = mig_score(mu, factors)
        assert r["mig_per_factor"].shape == (2,)
        assert r["mig_per_factor"][0] > 0.7  # captured
        assert r["mig_per_factor"][1] < 0.05  # not captured
        assert r["mig"] == pytest.approx(r["mig_per_factor"].mean())
        assert r["top_dims"][0] == 2

    def test_degenerate_factor_is_nan_and_excluded(self):
        y, rng = self._factor()
        mu = rng.normal(size=(y.size, 4))
        mu[:, 0] = y
        ones = np.ones_like(y)
        r = mig_score(mu, np.stack([y, ones], axis=1))
        assert np.isnan(r["mig_per_factor"][1])
        assert np.isfinite(r["mig"])  # the mean skips the NaN factor
        r_all_degenerate = mig_score(mu, ones)
        assert np.isnan(r_all_degenerate["mig"])

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError, match="samples"):
            mig_score(np.zeros((5, 2)), np.zeros(6))
        with pytest.raises(ValueError, match="empty"):
            mig_score(np.zeros((0, 2)), np.zeros(0))


class TestEncodeMeans:
    def _setup(self, n=50, img=16, latent=6, conditional=False):
        import jax
        import jax.numpy as jnp
        import optax

        from midi_vae_tpu.data.pipeline import DeviceLoader
        from midi_vae_tpu.data.sources import ArrayDataset
        from midi_vae_tpu.models import build_model
        from midi_vae_tpu.train.state import create_train_state

        kw = {"num_classes": 3} if conditional else {}
        model = build_model(
            "MLPVAE", in_channels=1, latent_dim=latent, input_dim=img, hidden_dims=(32,), **kw
        )
        rng = np.random.default_rng(0)
        images = (rng.uniform(size=(n, img, img, 1)) > 0.5).astype(np.uint8) * 255
        labels = rng.integers(0, 3, size=n).astype(np.int64)
        ds = ArrayDataset(images=images, labels=labels, name="t")
        loader = DeviceLoader(ds, 16, train=False)
        state = create_train_state(
            model, optax.sgd(0.1), jax.random.PRNGKey(0),
            jnp.zeros((2, img, img, 1), jnp.float32),
        )
        return model, state, loader, images, labels

    def test_padding_dropped_and_labels_aligned(self):
        model, state, loader, images, labels = self._setup(n=50)  # 4 batches, 14 pad slots
        mu, y = encode_means(loader, model, state)
        assert mu.shape == (50, 6)
        assert y.shape == (50,)
        # eval loaders iterate in dataset order: labels must match exactly
        np.testing.assert_array_equal(np.sort(y), np.sort(labels))

    def test_matches_direct_encode(self):
        import jax.numpy as jnp

        model, state, loader, images, _ = self._setup(n=32)
        mu, _ = encode_means(loader, model, state)
        # direct single-batch encode of the same (transformed) pixels
        batch = next(iter(loader.epoch(1)))
        enc = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch.x, train=False, method=type(model).encode,
        )
        np.testing.assert_allclose(mu[:16], np.asarray(enc.mu)[:16], rtol=1e-5)

    def test_conditional_model_encodes_under_labels(self):
        model, state, loader, _, _ = self._setup(n=32, conditional=True)
        mu, y = encode_means(loader, model, state)
        assert mu.shape == (32, 6)


class TestCLI:
    def test_evaluate_cli_reports_mig(self, tmp_path, capsys):
        """Train one tiny epoch on the labeled synthetic lines corpus,
        then --mig through the evaluate CLI: key present and finite
        (line-count classes give the factor entropy)."""
        from midi_vae_tpu.cli.evaluate import cli as evaluate_cli
        from midi_vae_tpu.cli.train import args_to_config, get_parser
        from midi_vae_tpu.train.loop import run

        args = get_parser().parse_args(
            ["--dataset", "vae-lines-synthetic", "--epochs", "1", "--batch-size", "32",
             "--image-size", "16", "--model", "MLPVAE", "--models-dir", str(tmp_path),
             "--seed", "0", "--cpu"]
        )
        config = args_to_config(args)
        run(config)

        out_json = tmp_path / "results.json"
        evaluate_cli(["--checkpoint", config.checkpoint_path, "--partition", "test",
                      "--mig", "--json", str(out_json), "--cpu"])
        import json

        results = json.loads(out_json.read_text())
        assert "mig" in results["test"]
        assert 0.0 <= results["test"]["mig"] <= 1.0
        assert "mig" in capsys.readouterr().out
