"""Evaluation-suite tests: metric reductions, padding masks, latent health."""

import jax
import jax.numpy as jnp
import numpy as np

from midi_vae_tpu.data.pipeline import DeviceLoader
from midi_vae_tpu.data.sources import ArrayDataset
from midi_vae_tpu.evaluation.evaluate import evaluate
from midi_vae_tpu.models import build_model
from midi_vae_tpu.train.state import create_train_state


def _setup(n=50, img=16, latent=6):
    import optax

    model = build_model("MLPVAE", in_channels=1, latent_dim=latent, input_dim=img, hidden_dims=(32,))
    rng = np.random.default_rng(0)
    images = (rng.uniform(size=(n, img, img, 1)) > 0.5).astype(np.uint8) * 255
    ds = ArrayDataset(images=images, labels=np.zeros(n, np.int64), name="t")
    loader = DeviceLoader(ds, 16, train=False)
    state = create_train_state(
        model, optax.sgd(0.1), jax.random.PRNGKey(0), jnp.zeros((2, img, img, 1), jnp.float32)
    )
    return model, state, loader, n


class TestEvaluate:
    def test_count_respects_padding(self):
        model, state, loader, n = _setup(n=50)
        results = evaluate(loader, model, state, verbosity=0)
        assert results["count"] == 50  # 16·4 batches → 64 slots, 14 padded

    def test_metric_keys_and_ranges(self):
        model, state, loader, _ = _setup()
        r = evaluate(loader, model, state, verbosity=0)
        for key in ("cross-entropy", "mse", "mae", "kl", "active-units"):
            assert key in r
        assert r["kl"] >= 0.0
        assert 0 <= r["active-units"] <= 6

    def test_active_units_detects_collapse(self):
        """A posterior whose mu is constant across inputs has zero active
        units; one that varies has all of them."""
        from midi_vae_tpu.evaluation.evaluate import make_eval_step

        class FakeModel:
            def apply(self, variables, x, train=False, rngs=None):
                from midi_vae_tpu.core.types import EncoderOutput, ModelOutput

                B = x.shape[0]
                mu_dead = jnp.zeros((B, 2))  # collapsed dims
                mu_live = x.reshape(B, -1)[:, :2] * 3.0  # input-dependent
                mu = jnp.concatenate([mu_dead, mu_live], axis=1)
                lv = jnp.zeros((B, 4))
                logits = jnp.zeros_like(x)
                return ModelOutput(
                    output=jax.nn.sigmoid(logits),
                    logits=logits,
                    input=x,
                    encoded=EncoderOutput(mu=mu, log_var=lv, pre_latents=mu),
                    latents=mu,
                )

        model = FakeModel()
        rng = np.random.default_rng(1)
        images = (rng.uniform(size=(64, 8, 8, 1)) * 255).astype(np.uint8)
        ds = ArrayDataset(images=images, labels=np.zeros(64, np.int64), name="t")
        loader = DeviceLoader(ds, 16, train=False)

        class S:
            params = {}
            batch_stats = {}

        step = make_eval_step(model)
        r = evaluate(loader, model, S(), verbosity=0, eval_step=step)
        assert r["active-units"] == 2  # exactly the two input-dependent dims

    def test_bce_objective_reported_for_raw_target_runs(self):
        """target_denorm adds the objective-space BCE next to the parity
        cross-entropy; under the default (0.5, 1.0) table they differ by
        construction (targets shift by 0.5) and the objective value equals
        BCE against the de-normalized [0,1] targets."""
        from midi_vae_tpu.evaluation.evaluate import make_eval_step
        from midi_vae_tpu.losses.elbo import bce_from_logits, denormalized_targets

        model, state, loader, _ = _setup(n=32)
        denorm = ((0.5,), (1.0,))
        step = make_eval_step(model, target_denorm=denorm)
        r = evaluate(loader, model, state, verbosity=0, eval_step=step)
        assert "bce-objective" in r and "cross-entropy" in r
        assert r["bce-objective"] != r["cross-entropy"]

        # direct recomputation over the same unshuffled stream — same
        # per-batch key derivation as evaluate() (BCE depends on the
        # reparam draw, unlike the KL-only check below)
        total, n_elem = 0.0, 0.0
        for i, batch in enumerate(loader.epoch(1)):
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch.x, train=False,
                rngs={"reparam": jax.random.fold_in(jax.random.PRNGKey(0), i)},
            )
            m = np.asarray(batch.mask).reshape(-1, 1, 1, 1)
            bce = np.asarray(bce_from_logits(out.logits, denormalized_targets(batch.x, denorm)))
            total += float((bce * m).sum())
            n_elem += m.sum() * np.prod(batch.x.shape[1:])
        np.testing.assert_allclose(r["bce-objective"], total / n_elem, rtol=1e-5)

    def test_passed_latent_step_is_honored(self):
        """A caller-built collect_latents step is used as-is (not rebuilt),
        and keeps its target_denorm metric."""
        from midi_vae_tpu.evaluation.evaluate import make_eval_step

        model, state, loader, n = _setup(n=32, latent=6)
        step = make_eval_step(model, collect_latents=True, target_denorm=((0.5,), (1.0,)))
        r = evaluate(loader, model, state, verbosity=0, collect_latents=True, eval_step=step)
        assert r["latents"].shape == (n, 6)
        assert "bce-objective" in r

    def test_kl_matches_formula(self):
        """Total KL equals the ELBO KL term computed directly."""
        from midi_vae_tpu.losses import kl_gaussian

        model, state, loader, _ = _setup(n=32)
        r = evaluate(loader, model, state, verbosity=0)

        # direct: run the model over the same (unshuffled) batches
        total, count = 0.0, 0
        for batch in loader.epoch(1):
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch.x,
                train=False,
                rngs={"reparam": jax.random.PRNGKey(0)},
            )
            valid = np.asarray(batch.mask) > 0
            kl_per_sample = np.asarray(
                -0.5
                * jnp.sum(
                    1 + out.encoded.log_var - out.encoded.mu**2 - jnp.exp(out.encoded.log_var), axis=-1
                )
            )
            total += kl_per_sample[valid].sum()
            count += valid.sum()
        np.testing.assert_allclose(r["kl"], total / count, rtol=1e-5)
        assert callable(kl_gaussian)


class TestIWAE:
    """Importance-weighted bound (evaluation/iwae.py)."""

    def test_chunk_invariance(self):
        """Chunking reduces the same global-index draws — any chunk size
        gives the same bound (up to float summation order)."""
        from midi_vae_tpu.evaluation.iwae import iwae_bound

        model, state, loader, _ = _setup(n=20)
        b_whole = iwae_bound(loader, model, state, k=8, chunk=8, seed=3)
        b_split = iwae_bound(loader, model, state, k=8, chunk=3, seed=3)
        np.testing.assert_allclose(b_whole, b_split, rtol=1e-6)

    def test_matches_bruteforce(self):
        """The jitted chunked sweep equals an explicit per-draw
        recomputation of log w = log p(x|z) + log p(z) - log q(z|x)."""
        import math

        from midi_vae_tpu.evaluation.iwae import iwae_bound
        from midi_vae_tpu.losses.elbo import bce_from_logits

        model, state, loader, _ = _setup(n=8, img=12, latent=4)
        k, seed = 4, 7
        got = iwae_bound(loader, model, state, k=k, chunk=2, seed=seed)

        (batch,) = list(loader.epoch(1))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        enc = model.apply(variables, batch.x, train=False, method=type(model).encode)
        mu, log_var = np.asarray(enc.mu, np.float32), np.asarray(enc.log_var, np.float32)
        batch_key = jax.random.fold_in(jax.random.PRNGKey(seed), 0)
        log_ws = []
        for j in range(k):
            eps = np.asarray(
                jax.random.normal(jax.random.fold_in(batch_key, j), mu.shape, jnp.float32)
            )
            z = mu + eps * np.exp(0.5 * log_var)
            logits = np.asarray(
                model.apply(variables, jnp.asarray(z), train=False, method=type(model).decode_logits),
                np.float32,
            )
            ll = -np.asarray(bce_from_logits(jnp.asarray(logits), batch.x)).reshape(len(mu), -1).sum(1)
            log_p = -0.5 * (np.square(z) + math.log(2 * math.pi)).sum(-1)
            log_q = -0.5 * (np.square(eps) + math.log(2 * math.pi) + log_var).sum(-1)
            log_ws.append(ll + log_p - log_q)
        log_ws = np.stack(log_ws)  # [k, B]
        lse = np.log(np.exp(log_ws - log_ws.max(0)).sum(0)) + log_ws.max(0)
        valid = np.asarray(batch.mask) > 0
        want = float((lse - math.log(k))[valid].mean())
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # Jensen, per draw set: log-mean-weight >= mean log-weight
        assert got >= float(log_ws[:, valid].mean()) - 1e-5

    def test_padded_samples_ignored(self):
        from midi_vae_tpu.data.pipeline import Batch
        from midi_vae_tpu.evaluation.iwae import iwae_bound

        model, state, _, _ = _setup(n=8, img=12, latent=4)
        rng = np.random.default_rng(1)
        x = rng.uniform(size=(4, 12, 12, 1)).astype(np.float32)
        mask = np.array([1.0, 1.0, 1.0, 0.0], np.float32)

        class OneBatchLoader:
            def __init__(self, x):
                self.x = jnp.asarray(x)

            def epoch(self, _):
                yield Batch(x=self.x, y=jnp.zeros(4, jnp.int32), mask=jnp.asarray(mask))

        garbage = x.copy()
        garbage[3] = 1e6  # padded slot: wild values must not leak into the bound
        a = iwae_bound(OneBatchLoader(x), model, state, k=4, seed=0)
        b = iwae_bound(OneBatchLoader(garbage), model, state, k=4, seed=0)
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_invalid_k_raises(self):
        from midi_vae_tpu.evaluation.iwae import iwae_bound

        model, state, loader, _ = _setup(n=8)
        try:
            iwae_bound(loader, model, state, k=0)
            assert False, "k=0 must raise"
        except ValueError:
            pass


class TestOccupancyMetrics:
    """Binary-occupancy precision/recall/F1 (make_eval_step occupancy_denorm)."""

    class _Fake:
        def __init__(self, silent):
            self.silent = silent  # True: constant -1000 logits (silence attractor)

        def apply(self, variables, x, train=False, rngs=None):
            from midi_vae_tpu.core.types import EncoderOutput, ModelOutput

            b = x.shape[0]
            logits = jnp.full_like(x, -1000.0) if self.silent else (x - 0.5) * 1000.0
            mu = x.reshape(b, -1)[:, :4]
            return ModelOutput(
                output=jax.nn.sigmoid(logits), logits=logits, input=x,
                encoded=EncoderOutput(mu=mu, log_var=jnp.zeros((b, 4)), pre_latents=mu),
                latents=mu,
            )

    def _sweep(self, silent):
        from midi_vae_tpu.evaluation.evaluate import make_eval_step

        rng = np.random.default_rng(2)
        images = (rng.uniform(size=(40, 8, 8, 1)) > 0.9).astype(np.uint8) * 255  # ~10% fill
        ds = ArrayDataset(images=images, labels=np.zeros(40, np.int64), name="t")
        loader = DeviceLoader(ds, 16, train=False)  # pads 48-40 slots

        class S:
            params = {}
            batch_stats = {}

        model = self._Fake(silent)
        step = make_eval_step(model, occupancy_denorm=((0.0,), (1.0,)))
        return evaluate(loader, model, S(), verbosity=0, eval_step=step)

    def test_perfect_reconstruction_scores_100(self):
        r = self._sweep(silent=False)
        assert r["precision"] == 100.0 and r["recall"] == 100.0 and r["f1"] == 100.0

    def test_silent_decoder_scores_0_not_nan(self):
        """A silence-collapsed decoder gets a flattering mse (90% zeros) but
        exactly 0 recall/F1 — and empty denominators never produce NaN."""
        r = self._sweep(silent=True)
        assert r["precision"] == 0.0 and r["recall"] == 0.0 and r["f1"] == 0.0
        assert r["mse"] < 15.0  # the misleading metric the F1 exists to expose
