"""ELBO parity tests: hand-computed cases and reference-formula equivalence (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midi_vae_tpu.core.types import EncoderOutput, ModelOutput
from midi_vae_tpu.losses import bce_from_logits, elbo_loss, kl_gaussian
from midi_vae_tpu.losses.schedules import kl_weight_schedule


def make_output(logits, targets, mu, log_var):
    logits = jnp.asarray(logits, jnp.float32)
    targets = jnp.asarray(targets, jnp.float32)
    mu = jnp.asarray(mu, jnp.float32)
    log_var = jnp.asarray(log_var, jnp.float32)
    return ModelOutput(
        output=jax.nn.sigmoid(logits),
        logits=logits,
        input=targets,
        encoded=EncoderOutput(mu=mu, log_var=log_var, pre_latents=mu),
        latents=mu,
    )


def test_bce_matches_probability_form():
    """Fused logit BCE == -[t·log p + (1-t)·log(1-p)] for moderate logits."""
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(64,)).astype(np.float32) * 3
    t = rng.uniform(size=(64,)).astype(np.float32)
    p = 1.0 / (1.0 + np.exp(-logits))
    expected = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    got = np.asarray(bce_from_logits(jnp.asarray(logits), jnp.asarray(t)))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-5)


def test_bce_stable_at_saturation():
    out = bce_from_logits(jnp.asarray([100.0, -100.0]), jnp.asarray([0.0, 1.0]))
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), [100.0, 100.0], rtol=1e-6)


def test_kl_hand_computed():
    """KL for mu=1, log_var=0 (σ=1): per-dim KL = 0.5·(mu²) = 0.5; sum over D=3 → 1.5."""
    mu = jnp.ones((2, 3))
    log_var = jnp.zeros((2, 3))
    kl = kl_gaussian(mu, log_var)
    np.testing.assert_allclose(float(kl), 1.5, rtol=1e-6)
    # standard normal posterior → zero KL
    assert float(kl_gaussian(jnp.zeros((2, 3)), jnp.zeros((2, 3)))) == pytest.approx(0.0, abs=1e-7)


def test_kl_matches_reference_formula():
    """-0.5·mean_batch(sum_dim(1 + lv - mu² - e^lv)) — models.py:214 verbatim."""
    rng = np.random.default_rng(1)
    mu = rng.normal(size=(8, 5)).astype(np.float32)
    lv = rng.normal(size=(8, 5)).astype(np.float32) * 0.5
    expected = -0.5 * np.mean(np.sum(1 + lv - mu**2 - np.exp(lv), axis=-1))
    got = float(kl_gaussian(jnp.asarray(mu), jnp.asarray(lv)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_elbo_composition_and_reporting_conventions():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(4, 8, 8, 1)).astype(np.float32)
    targets = rng.uniform(size=(4, 8, 8, 1)).astype(np.float32)
    mu = rng.normal(size=(4, 10)).astype(np.float32)
    lv = rng.normal(size=(4, 10)).astype(np.float32)
    out = make_output(logits, targets, mu, lv)
    res = elbo_loss(out, kld_weight=0.00025)
    # loss = recon + w·kl (models.py:216)
    np.testing.assert_allclose(
        float(res.loss),
        float(res.reconstruction_loss) + 0.00025 * float(res.kl),
        rtol=1e-6,
    )
    # kld_loss is reported negated (models.py:224)
    np.testing.assert_allclose(float(res.kld_loss), -float(res.kl), rtol=1e-6)


def test_elbo_log_var_clamp():
    out = make_output(
        np.zeros((2, 4, 4, 1), np.float32),
        np.full((2, 4, 4, 1), 0.5, np.float32),
        np.zeros((2, 3), np.float32),
        np.full((2, 3), 50.0, np.float32),  # would explode exp(log_var)
    )
    res = elbo_loss(out, kld_weight=1.0, log_var_clamp=(-10.0, 10.0))
    assert np.isfinite(float(res.loss))
    # clamped KL: -0.5·sum(1 + 10 - 0 - e^10) per sample
    expected_kl = -0.5 * 3 * (1 + 10 - np.exp(10))
    np.testing.assert_allclose(float(res.kl), expected_kl, rtol=1e-5)


def test_elbo_gradients_flow():
    def loss_fn(logits):
        out = make_output(logits, np.full((2, 4, 4, 1), 0.3, np.float32), np.zeros((2, 3)), np.zeros((2, 3)))
        return elbo_loss(out).loss

    g = jax.grad(loss_fn)(jnp.zeros((2, 4, 4, 1)))
    assert np.isfinite(np.asarray(g)).all()
    # dBCE/dl = sigmoid(l) - t = 0.5 - 0.3 per element, / n_elements for the mean
    np.testing.assert_allclose(np.asarray(g), 0.2 / 32, rtol=1e-5)


def test_loss_math_runs_in_f32_under_bf16_compute():
    """bf16 model outputs must not quantize the loss: the unfused path
    casts to f32 like the fused Pallas kernels do (a bf16 KL carries ~3
    significant digits and measurably diverged from the fused path)."""
    rng = np.random.default_rng(0)
    logits32 = rng.normal(0, 3, (8, 16, 16, 1)).astype(np.float32)
    targets = rng.uniform(0, 1, (8, 16, 16, 1)).astype(np.float32)
    mu32 = rng.normal(0, 1, (8, 10)).astype(np.float32)
    lv32 = rng.normal(0, 1, (8, 10)).astype(np.float32)

    def loss_of(dtype):
        out = make_output(
            jnp.asarray(logits32, dtype), targets, jnp.asarray(mu32, dtype), jnp.asarray(lv32, dtype)
        )
        return elbo_loss(out, kld_weight=0.5)

    lo16, lo32 = loss_of(jnp.bfloat16), loss_of(jnp.float32)
    assert lo16.loss.dtype == jnp.float32
    # the only error left is the bf16 rounding of the INPUTS, not the math
    np.testing.assert_allclose(float(lo16.loss), float(lo32.loss), rtol=2e-2)
    np.testing.assert_allclose(float(lo16.kl), float(lo32.kl), rtol=2e-2)


class TestKLSchedules:
    def test_constant(self):
        s = kl_weight_schedule("constant", 0.3)
        assert float(s(jnp.int32(0))) == pytest.approx(0.3)
        assert float(s(jnp.int32(10**6))) == pytest.approx(0.3)

    def test_multiplicative_matches_reference_comment(self):
        """w(t) capped multiplicative ramp — models.py:218-219."""
        s = kl_weight_schedule("multiplicative", 0.01, growth=1.005, cap=1.0)
        w = 0.01
        for t in [0, 1, 5, 100]:
            np.testing.assert_allclose(float(s(jnp.int32(t))), min(0.01 * 1.005**t, 1.0), rtol=1e-4)
            w = min(w * 1.005, 1.0)
        assert float(s(jnp.int32(10000))) == pytest.approx(1.0)

    def test_linear(self):
        s = kl_weight_schedule("linear", 1.0, warmup_steps=100)
        assert float(s(jnp.int32(0))) == pytest.approx(0.0)
        assert float(s(jnp.int32(50))) == pytest.approx(0.5)
        assert float(s(jnp.int32(200))) == pytest.approx(1.0)

    def test_cyclical(self):
        s = kl_weight_schedule("cyclical", 1.0, period=100, ramp_fraction=0.5)
        assert float(s(jnp.int32(0))) == pytest.approx(0.0)
        assert float(s(jnp.int32(25))) == pytest.approx(0.5)
        assert float(s(jnp.int32(75))) == pytest.approx(1.0)
        assert float(s(jnp.int32(100))) == pytest.approx(0.0)

    def test_jit_compatible(self):
        s = kl_weight_schedule("cyclical", 1.0, period=10)
        f = jax.jit(lambda t: s(t))
        assert np.isfinite(float(f(jnp.int32(3))))

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            kl_weight_schedule("bogus")


class TestTorchReferenceParity:
    """ELBO numerics against the PyTorch formulation the reference uses
    (models.py:208-216: F.binary_cross_entropy(recon, input) +
    w · mean(-0.5·sum(1 + logvar − mu² − e^logvar))) — the 'bitwise-close
    ELBO' CPU-parity check from the BASELINE north star."""

    def test_elbo_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(7)
        B, H, W, D = 8, 16, 16, 10
        logits = rng.normal(size=(B, H, W, 1)).astype(np.float32) * 2
        targets = rng.uniform(size=(B, H, W, 1)).astype(np.float32)
        mu = rng.normal(size=(B, D)).astype(np.float32)
        log_var = rng.normal(size=(B, D)).astype(np.float32)
        w = 0.00025

        lo = elbo_loss(make_output(logits, targets, mu, log_var), kld_weight=w)

        t_recon = torch.sigmoid(torch.from_numpy(logits))
        t_bce = F.binary_cross_entropy(t_recon, torch.from_numpy(targets))
        t_mu, t_lv = torch.from_numpy(mu), torch.from_numpy(log_var)
        t_kld = torch.mean(-0.5 * torch.sum(1 + t_lv - t_mu**2 - t_lv.exp(), dim=1), dim=0)
        t_loss = t_bce + w * t_kld

        np.testing.assert_allclose(float(lo.reconstruction_loss), float(t_bce), rtol=1e-5)
        np.testing.assert_allclose(float(lo.kl), float(t_kld), rtol=1e-5)
        np.testing.assert_allclose(float(lo.loss), float(t_loss), rtol=1e-5)
        # reporting convention: kld_loss is the negated KL (models.py:224)
        np.testing.assert_allclose(float(lo.kld_loss), -float(t_kld), rtol=1e-5)

    def test_fused_kernel_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from midi_vae_tpu.ops.fused_elbo import fused_elbo_terms

        rng = np.random.default_rng(11)
        B, H, W, D = 4, 32, 32, 10
        logits = rng.normal(size=(B, H, W, 1)).astype(np.float32) * 3
        targets = (rng.uniform(size=(B, H, W, 1)) > 0.7).astype(np.float32)
        mu = rng.normal(size=(B, D)).astype(np.float32)
        log_var = rng.normal(size=(B, D)).astype(np.float32)
        w = 0.00025

        loss, recon, kl = fused_elbo_terms(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mu), jnp.asarray(log_var), w
        )
        t_bce = F.binary_cross_entropy(torch.sigmoid(torch.from_numpy(logits)), torch.from_numpy(targets))
        t_mu, t_lv = torch.from_numpy(mu), torch.from_numpy(log_var)
        t_kld = torch.mean(-0.5 * torch.sum(1 + t_lv - t_mu**2 - t_lv.exp(), dim=1), dim=0)

        np.testing.assert_allclose(float(recon), float(t_bce), rtol=2e-5)
        np.testing.assert_allclose(float(kl), float(t_kld), rtol=2e-5)
        np.testing.assert_allclose(float(loss), float(t_bce + w * t_kld), rtol=2e-5)


class TestBetaTCVAE:
    """β-TC-VAE decomposition (losses/tcvae.py, Chen et al. 2018)."""

    def test_telescoping_identity(self):
        """MI + TC + DWKL == E[log q(z|x) − log p(z)] exactly (the three
        estimators telescope algebraically)."""
        from midi_vae_tpu.losses.tcvae import _gaussian_log_density, tc_decomposition

        rng = np.random.default_rng(0)
        B, D = 32, 6
        mu = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        lv = jnp.asarray(rng.normal(size=(B, D)) * 0.3, jnp.float32)
        z = mu + jnp.exp(0.5 * lv) * jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        mi, tc, dwkl = tc_decomposition(z, mu, lv, dataset_size=1000)
        direct = jnp.mean(
            jnp.sum(_gaussian_log_density(z, mu, lv), -1)
            - jnp.sum(_gaussian_log_density(z, jnp.zeros_like(z), jnp.zeros_like(z)), -1)
        )
        np.testing.assert_allclose(float(mi + tc + dwkl), float(direct), rtol=1e-5)

    def test_identical_standard_posteriors_zero_terms(self):
        """All posteriors == prior and dataset_size=1 → every term is 0."""
        from midi_vae_tpu.losses.tcvae import tc_decomposition

        rng = np.random.default_rng(1)
        B, D = 16, 4
        z = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        zero = jnp.zeros((B, D), jnp.float32)
        mi, tc, dwkl = tc_decomposition(z, zero, zero, dataset_size=1)
        for v in (mi, tc, dwkl):
            np.testing.assert_allclose(float(v), 0.0, atol=1e-5)

    def test_tc_detects_correlated_dimensions(self):
        """Aggregate posterior with duplicated dims has high TC; an
        independent one has much less."""
        from midi_vae_tpu.losses.tcvae import tc_decomposition

        rng = np.random.default_rng(2)
        B = 256
        a = rng.normal(size=(B, 1)).astype(np.float32) * 3
        mu_corr = jnp.asarray(np.concatenate([a, a], axis=1))  # dims identical
        mu_ind = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32) * 3)
        lv = jnp.full((B, 2), -4.0)  # tight posteriors
        z_corr = mu_corr  # tight → z ≈ mu
        z_ind = mu_ind
        _, tc_corr, _ = tc_decomposition(z_corr, mu_corr, lv, dataset_size=B)
        _, tc_ind, _ = tc_decomposition(z_ind, mu_ind, lv, dataset_size=B)
        assert float(tc_corr) > float(tc_ind) + 1.0

    def test_loss_output_and_gradients(self):
        from midi_vae_tpu.losses.tcvae import beta_tc_elbo_loss

        rng = np.random.default_rng(3)
        B, D = 8, 4
        logits = jnp.asarray(rng.normal(size=(B, 16, 16, 1)), jnp.float32)
        targets = jnp.asarray(rng.uniform(size=(B, 16, 16, 1)), jnp.float32)
        mu = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        lv = jnp.asarray(rng.normal(size=(B, D)) * 0.2, jnp.float32)
        z = mu  # deterministic for the test

        def loss_of(mu_):
            out = make_output(logits, targets, mu_, lv)
            out = out.replace(latents=mu_)
            return beta_tc_elbo_loss(out, tc_beta=6.0, dataset_size=100).loss

        g = jax.grad(loss_of)(mu)
        assert np.isfinite(np.asarray(g)).all()
        lo = beta_tc_elbo_loss(
            make_output(logits, targets, mu, lv).replace(latents=z), tc_beta=6.0, dataset_size=100
        )
        assert np.isfinite(float(lo.loss))
        np.testing.assert_allclose(float(lo.kld_loss), -float(lo.kl), rtol=1e-6)

    def test_train_step_integration(self):
        import optax

        from midi_vae_tpu.losses.schedules import kl_weight_schedule
        from midi_vae_tpu.models import MLPVAE
        from midi_vae_tpu.train.state import create_train_state, make_train_step

        model = MLPVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,))
        x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (16, 16, 16, 1)), jnp.float32)
        tx = optax.adam(1e-3)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), x[:2])
        step = make_train_step(
            model, tx, kl_weight_schedule("constant", 1.0),
            loss_type="beta-tc", tc_beta=4.0, dataset_size=200, donate=False,
        )
        losses = []
        for _ in range(10):
            state, lo, gn = step(state, x, jax.random.PRNGKey(1))
            losses.append(float(lo.loss))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()

    def test_fused_and_beta_tc_incompatible(self):
        import optax

        from midi_vae_tpu.losses.schedules import kl_weight_schedule
        from midi_vae_tpu.models import MLPVAE
        from midi_vae_tpu.train.state import make_train_step

        model = MLPVAE(in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,))
        with pytest.raises(ValueError, match="fused"):
            make_train_step(
                model, optax.adam(1e-3), kl_weight_schedule("constant", 1.0),
                loss_type="beta-tc", fused_loss=True,
            )


class TestFreeBits:
    """Free-bits KL floor (Kingma et al. 2016): collapsed dims stop
    contributing KL gradient; the reported KL stays the true value."""

    def test_floor_applies_per_dimension(self):
        # dim 0 collapsed to the prior (KL=0), dim 1 active
        mu = np.array([[0.0, 1.0], [0.0, -1.0]], np.float32)
        lv = np.zeros((2, 2), np.float32)
        out = make_output(
            np.zeros((2, 4, 4, 1), np.float32), np.full((2, 4, 4, 1), 0.5, np.float32), mu, lv
        )
        fb = 0.25
        res = elbo_loss(out, kld_weight=1.0, free_bits=fb)
        # true per-dim KL: dim0 = 0, dim1 = 0.5·mean(mu²) = 0.5
        # floored term = max(0, fb) + max(0.5, fb) = 0.25 + 0.5
        recon = float(res.reconstruction_loss)
        np.testing.assert_allclose(float(res.loss), recon + (fb + 0.5), rtol=1e-6)
        # reported KL is the TRUE KL (0 + 0.5), not the floored one
        np.testing.assert_allclose(float(res.kl), 0.5, rtol=1e-6)

    def test_collapsed_dim_has_zero_kl_gradient(self):
        def kl_term(mu):
            out = make_output(
                np.zeros((2, 4, 4, 1), np.float32),
                np.full((2, 4, 4, 1), 0.5, np.float32),
                mu,
                jnp.zeros((2, 2)),
            )
            # kld_weight=1, recon independent of mu -> grad of loss wrt mu
            # is the KL-term gradient
            return elbo_loss(out, kld_weight=1.0, free_bits=0.25).loss

        mu = jnp.array([[0.01, 1.0], [-0.01, -1.0]])  # dim0 below floor, dim1 above
        g = jax.grad(kl_term)(mu)
        np.testing.assert_allclose(np.asarray(g)[:, 0], 0.0, atol=1e-8)  # floored: no gradient
        assert np.all(np.abs(np.asarray(g)[:, 1]) > 1e-3)  # active: real gradient

    def test_rejected_on_fused_and_tc_paths(self):
        import optax

        from midi_vae_tpu.train.state import make_train_step

        sched = kl_weight_schedule("constant", 1.0)
        with pytest.raises(ValueError, match="free-bits"):
            make_train_step(object(), optax.sgd(0.1), sched, free_bits=0.5, fused_loss=True)
        with pytest.raises(ValueError, match="free-bits"):
            make_train_step(object(), optax.sgd(0.1), sched, free_bits=0.5, loss_type="beta-tc")

class TestPosWeight:
    """--bce-pos-weight: the reconstruction-side sparse-corpus rebalancer."""

    def test_matches_weighted_probability_form(self):
        rng = np.random.default_rng(7)
        logits = rng.normal(size=(64,)).astype(np.float32) * 3
        t = rng.uniform(size=(64,)).astype(np.float32)
        p = 1.0 / (1.0 + np.exp(-logits))
        pw = 75.0
        expected = -(pw * t * np.log(p) + (1 - t) * np.log(1 - p))
        got = np.asarray(bce_from_logits(jnp.asarray(logits), jnp.asarray(t), pos_weight=pw))
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=1e-4)

    def test_none_and_one_are_reference_parity(self):
        rng = np.random.default_rng(8)
        logits = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
        t = jnp.asarray(rng.uniform(size=(32,)), jnp.float32)
        base = np.asarray(bce_from_logits(logits, t))
        np.testing.assert_array_equal(np.asarray(bce_from_logits(logits, t, pos_weight=1.0)), base)
        np.testing.assert_array_equal(np.asarray(bce_from_logits(logits, t, pos_weight=None)), base)

    def test_elbo_threads_pos_weight(self):
        rng = np.random.default_rng(9)
        logits = rng.normal(size=(4, 8, 8, 1)).astype(np.float32)
        targets = (rng.uniform(size=(4, 8, 8, 1)) < 0.02).astype(np.float32)  # sparse
        mu = rng.normal(size=(4, 10)).astype(np.float32)
        lv = np.zeros((4, 10), np.float32)
        out = make_output(logits, targets, mu, lv)
        plain = elbo_loss(out, kld_weight=0.0)
        weighted = elbo_loss(out, kld_weight=0.0, pos_weight=50.0)
        assert float(weighted.reconstruction_loss) > float(plain.reconstruction_loss)
        # weighted loss == manual mean of the weighted elementwise BCE
        manual = float(jnp.mean(bce_from_logits(out.logits, out.input, 50.0)))
        np.testing.assert_allclose(float(weighted.loss), manual, rtol=1e-6)

    def test_pos_weight_boosts_positive_gradient(self):
        """The filled cells' gradient mass scales by the weight — the mechanism
        that counters the silence attractor."""
        t = jnp.asarray([[1.0]], jnp.float32)

        def loss(logits, pw):
            return jnp.mean(bce_from_logits(logits, t, pw))

        g1 = float(jax.grad(loss)(jnp.zeros((1, 1)), 1.0)[0, 0])
        g50 = float(jax.grad(loss)(jnp.zeros((1, 1)), 50.0)[0, 0])
        np.testing.assert_allclose(g50, 50.0 * g1, rtol=1e-5)

    def test_rejected_on_fused_path(self):
        import optax

        from midi_vae_tpu.models.mlp import MLPVAE
        from midi_vae_tpu.train.state import make_train_step

        model = MLPVAE(input_dim=8, hidden_dims=(16,), latent_dim=4)
        with pytest.raises(ValueError, match="pos-weight"):
            make_train_step(
                model, optax.sgd(1e-3), kl_weight_schedule("constant", 1.0),
                fused_loss=True, pos_weight=2.0,
            )


class TestCorpusStats:
    """data/stats.py — the 'auto' statistics behind --bce-pos-weight/--output-bias-init."""

    def _dataset(self, fill=0.02):
        from midi_vae_tpu.data.sources import ArrayDataset

        rng = np.random.default_rng(3)
        images = (rng.uniform(size=(64, 16, 16, 1)) < fill).astype(np.uint8) * 255
        return ArrayDataset(images=images, labels=np.zeros(64, np.int64), name="t")

    def test_estimate_base_rate_is_raw_fill_rate(self):
        from midi_vae_tpu.data.stats import estimate_base_rate

        ds = self._dataset(fill=0.02)
        p = estimate_base_rate(ds)
        assert abs(p - ds.images.mean() / 255.0) < 1e-9

    def test_base_rate_logit_inverts_sigmoid(self):
        from midi_vae_tpu.data.stats import base_rate_logit

        assert abs(1.0 / (1.0 + np.exp(-base_rate_logit(0.013))) - 0.013) < 1e-9

    def test_resolve_auto(self):
        from midi_vae_tpu.data.stats import resolve_auto

        ds = self._dataset(fill=0.02)
        p = ds.images.mean() / 255.0
        assert resolve_auto(None, ds, "bias") is None
        assert resolve_auto(2.5, ds, "pos_weight") == 2.5
        np.testing.assert_allclose(resolve_auto("auto", ds, "bias"), np.log(p / (1 - p)), rtol=1e-9)
        np.testing.assert_allclose(resolve_auto("auto", ds, "pos_weight"), (1 - p) / p, rtol=1e-9)


class TestRawTargets:
    """--bce-targets raw: de-normalized [0,1] targets inside the loss."""

    def test_denormalized_targets_invert_normalization(self):
        from midi_vae_tpu.losses.elbo import denormalized_targets

        raw = np.random.default_rng(4).uniform(size=(2, 8, 8, 1)).astype(np.float32)
        normalized = raw - 0.5  # the default table: mean 0.5, std 1.0
        back = np.asarray(denormalized_targets(jnp.asarray(normalized), ((0.5,), (1.0,))))
        np.testing.assert_allclose(back, raw, atol=1e-6)

    def test_elbo_raw_targets_match_manual(self):
        rng = np.random.default_rng(5)
        logits = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
        raw = (rng.uniform(size=(2, 8, 8, 1)) < 0.05).astype(np.float32)
        out = make_output(logits, raw - 0.5, np.zeros((2, 3)), np.zeros((2, 3)))
        res = elbo_loss(out, kld_weight=0.0, target_denorm=((0.5,), (1.0,)))
        manual = float(jnp.mean(bce_from_logits(out.logits, jnp.asarray(raw))))
        np.testing.assert_allclose(float(res.loss), manual, rtol=1e-6)

    def test_raw_space_positive_bce_bounded_below_by_zero(self):
        """In raw space a perfect reconstruction reaches BCE≈0 — unlike the
        shifted space where the optimum is the clamp."""
        t = np.zeros((1, 4, 4, 1), np.float32)  # raw all-empty
        out = make_output(np.full((1, 4, 4, 1), -30.0, np.float32), t - 0.5,
                          np.zeros((1, 2)), np.zeros((1, 2)))
        res = elbo_loss(out, kld_weight=0.0, target_denorm=((0.5,), (1.0,)))
        assert 0.0 <= float(res.loss) < 1e-6

    def test_rejected_on_fused_path(self):
        import optax

        from midi_vae_tpu.models.mlp import MLPVAE
        from midi_vae_tpu.train.state import make_train_step

        model = MLPVAE(input_dim=8, hidden_dims=(16,), latent_dim=4)
        with pytest.raises(ValueError, match="bce-targets"):
            make_train_step(
                model, optax.sgd(1e-3), kl_weight_schedule("constant", 1.0),
                fused_loss=True, target_denorm=((0.5,), (1.0,)),
            )
