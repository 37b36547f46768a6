"""Pallas fused-kernel tests (interpreter mode on CPU): numerics vs the
pure-XLA reference implementations in losses/elbo.py."""

import jax
import jax.numpy as jnp
import numpy as np

from midi_vae_tpu.losses.elbo import bce_from_logits, kl_gaussian
from midi_vae_tpu.ops.fused_elbo import fused_bce_mean, fused_elbo_terms, fused_reparam_kl


class TestFusedReparamKL:
    def test_kl_matches_reference(self):
        rng = np.random.default_rng(0)
        mu = jnp.asarray(rng.normal(size=(32, 10)).astype(np.float32))
        lv = jnp.asarray(rng.normal(size=(32, 10)).astype(np.float32) * 0.3)
        _, kl = fused_reparam_kl(mu, lv, jnp.int32(0))
        np.testing.assert_allclose(float(kl), float(kl_gaussian(mu, lv)), rtol=1e-5)

    def test_z_statistics(self):
        """z ~ N(mu, exp(lv)) from the on-core PRNG.

        Real PRNG statistics need TPU hardware (the CPU interpreter's
        ``prng_random_bits`` returns constant bits); see
        benchmarks/tpu_smoke.py for the hardware check. On CPU we assert
        the z = mu + eps·std structure with the interpreter's fixed eps.
        """
        mu = jnp.full((4096, 16), 2.0)
        lv = jnp.full((4096, 16), jnp.log(0.25))
        z, _ = fused_reparam_kl(mu, lv, jnp.int32(7))
        z = np.asarray(z)
        if jax.default_backend() == "tpu":
            assert abs(z.mean() - 2.0) < 0.01
            assert abs(z.std() - 0.5) < 0.01
            z3, _ = fused_reparam_kl(mu, lv, jnp.int32(8))
            assert not np.allclose(z, np.asarray(z3))
        else:
            eps = (z - 2.0) / 0.5
            assert np.isfinite(eps).all()
        # deterministic under the same seed everywhere
        z2, _ = fused_reparam_kl(mu, lv, jnp.int32(7))
        np.testing.assert_array_equal(z, np.asarray(z2))

    def test_gradients_match_unfused(self):
        """Custom VJP == autodiff through an unfused equivalent with the same eps."""
        rng = np.random.default_rng(1)
        mu = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
        lv = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32) * 0.2)

        z0, _ = fused_reparam_kl(mu, lv, jnp.int32(3))
        eps = (np.asarray(z0) - np.asarray(mu)) / np.exp(0.5 * np.asarray(lv))
        eps = jnp.asarray(eps)

        def fused(mu, lv):
            z, kl = fused_reparam_kl(mu, lv, jnp.int32(3))
            return jnp.sum(z * 3.0) + 5.0 * kl

        def unfused(mu, lv):
            z = mu + eps * jnp.exp(0.5 * lv)
            kl = kl_gaussian(mu, lv)
            return jnp.sum(z * 3.0) + 5.0 * kl

        g_f = jax.grad(fused, argnums=(0, 1))(mu, lv)
        g_u = jax.grad(unfused, argnums=(0, 1))(mu, lv)
        np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_u[0]), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_f[1]), np.asarray(g_u[1]), rtol=1e-4, atol=1e-5)


class TestFusedBCE:
    def _case(self, shape, seed=0):
        rng = np.random.default_rng(seed)
        logits = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 3)
        targets = jnp.asarray(rng.uniform(-0.5, 0.5, size=shape).astype(np.float32))
        return logits, targets

    def test_matches_reference_various_shapes(self):
        for shape in [(4, 8, 8, 1), (3, 5, 7, 1), (2, 128, 128, 1), (17,)]:
            logits, targets = self._case(shape)
            expected = float(jnp.mean(bce_from_logits(logits, targets)))
            got = float(fused_bce_mean(logits, targets))
            np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6), shape

    def test_multiblock_grid(self):
        """Shapes spanning several grid steps accumulate correctly."""
        logits, targets = self._case((8, 128, 128, 1), seed=2)  # 1024 rows of 128
        expected = float(jnp.mean(bce_from_logits(logits, targets)))
        np.testing.assert_allclose(float(fused_bce_mean(logits, targets)), expected, rtol=1e-4)

    def test_gradient_matches_reference(self):
        logits, targets = self._case((4, 16, 16, 1), seed=3)

        def ref(l):
            return jnp.mean(bce_from_logits(l, targets)) * 2.5

        def fused(l):
            return fused_bce_mean(l, targets) * 2.5

        g_ref = jax.grad(ref)(logits)
        g_fused = jax.grad(fused)(logits)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-6)

    def test_gradient_with_saturation_clamp(self):
        logits = jnp.asarray([[150.0, -150.0, 0.5, -0.5]] * 32, jnp.float32)
        targets = jnp.asarray([[0.0, 1.0, 0.3, 0.7]] * 32, jnp.float32)

        def ref(l):
            return jnp.mean(bce_from_logits(l, targets))

        def fused(l):
            return fused_bce_mean(l, targets)

        np.testing.assert_allclose(float(fused(logits)), float(ref(logits)), rtol=1e-4)
        g_ref = jax.grad(ref)(logits)
        g_fused = jax.grad(fused)(logits)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-6)


def test_fused_elbo_terms_composition():
    rng = np.random.default_rng(5)
    logits = jnp.asarray(rng.normal(size=(4, 16, 16, 1)).astype(np.float32))
    targets = jnp.asarray(rng.uniform(0, 1, size=(4, 16, 16, 1)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
    lv = jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))
    loss, recon, kl = fused_elbo_terms(logits, targets, mu, lv, 0.00025)
    expected_recon = float(jnp.mean(bce_from_logits(logits, targets)))
    expected_kl = float(kl_gaussian(mu, lv))
    np.testing.assert_allclose(float(recon), expected_recon, rtol=1e-4)
    np.testing.assert_allclose(float(kl), expected_kl, rtol=1e-5)
    np.testing.assert_allclose(float(loss), expected_recon + 0.00025 * expected_kl, rtol=1e-4)


def test_fused_train_step_end_to_end():
    """Fused kernels in the real train step: loss decreases on CPU interpret."""
    import optax

    from midi_vae_tpu.losses.schedules import kl_weight_schedule
    from midi_vae_tpu.models import build_model
    from midi_vae_tpu.models.vae import param_group_label
    from midi_vae_tpu.train.optim import build_optimizer
    from midi_vae_tpu.train.state import create_train_state, make_train_step

    model = build_model("MLPVAE", in_channels=1, latent_dim=4, input_dim=16, hidden_dims=(32,), fused_reparam=True)
    bundle = build_optimizer(
        None, param_group_label, optimizer="AdamW", lr=0.01, scheduler="constant", total_steps=50
    )
    x = jnp.asarray((np.random.default_rng(0).uniform(size=(16, 16, 16, 1)) > 0.7).astype(np.float32))
    state = create_train_state(model, bundle.tx, jax.random.PRNGKey(0), x)
    step = make_train_step(model, bundle.tx, kl_weight_schedule("constant", 1e-4), fused_loss=True, donate=False)
    losses = []
    for _ in range(10):
        state, lo, gn = step(state, x, jax.random.PRNGKey(1))
        losses.append(float(lo.loss))
        assert np.isfinite(losses[-1]) and np.isfinite(float(gn))
    assert losses[-1] < losses[0]


class TestBF16:
    """The fused kernels must accept bfloat16 storage (bf16 models put bf16
    mu/log_var/logits through them; regression: f32-into-bf16-ref swap error)."""

    def test_reparam_bf16(self):
        import jax
        import jax.numpy as jnp

        from midi_vae_tpu.ops.fused_elbo import fused_reparam_kl

        mu = jnp.ones((8, 16), jnp.bfloat16)
        lv = jnp.zeros((8, 16), jnp.bfloat16)
        z, kl = fused_reparam_kl(mu, lv, jnp.int32(3))
        assert z.dtype == jnp.bfloat16
        assert jnp.isfinite(kl)
        # grads flow and keep the primal dtype
        g = jax.grad(lambda m, l: fused_reparam_kl(m, l, jnp.int32(3))[1])(mu, lv)
        assert g.dtype == jnp.bfloat16

    def test_bce_bf16_matches_f32(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from midi_vae_tpu.ops.fused_elbo import fused_bce_mean

        rng = np.random.default_rng(0)
        logits32 = jnp.asarray(rng.normal(size=(4, 32, 32, 1)) * 2, jnp.float32)
        targets32 = jnp.asarray((rng.uniform(size=(4, 32, 32, 1)) > 0.5), jnp.float32)
        out32 = float(fused_bce_mean(logits32, targets32))
        out16 = float(fused_bce_mean(logits32.astype(jnp.bfloat16), targets32.astype(jnp.bfloat16)))
        assert abs(out32 - out16) < 0.02  # bf16 storage, f32 accumulate
        g = jax.grad(fused_bce_mean)(logits32.astype(jnp.bfloat16), targets32.astype(jnp.bfloat16))
        assert g.dtype == jnp.bfloat16

    def test_bf16_fused_train_step(self):
        """Full bf16 model with both fused kernels runs one step (the
        configs/midi.yaml combination)."""
        import jax
        import jax.numpy as jnp

        from midi_vae_tpu.losses.schedules import kl_weight_schedule
        from midi_vae_tpu.models import VanillaVAE
        from midi_vae_tpu.models.vae import param_group_label
        from midi_vae_tpu.train.optim import build_optimizer
        from midi_vae_tpu.train.state import create_train_state, make_train_step

        model = VanillaVAE(
            in_channels=1, latent_dim=4, input_dim=32, hidden_dims=(8, 16),
            fused_reparam=True, dtype=jnp.bfloat16,
        )
        bundle = build_optimizer(
            None, param_group_label, optimizer="AdamW", lr=1e-3, scheduler="OneCycle", total_steps=10
        )
        x = jnp.zeros((4, 32, 32, 1), jnp.float32)
        state = create_train_state(model, bundle.tx, jax.random.PRNGKey(0), x[:2])
        step = make_train_step(model, bundle.tx, kl_weight_schedule("constant", 2.5e-4), fused_loss=True)
        state, lo, gn = step(state, x, jax.random.PRNGKey(1))
        assert jnp.isfinite(lo.loss)
        assert jnp.isfinite(gn)
