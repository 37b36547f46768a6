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
