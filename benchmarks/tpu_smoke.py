"""TPU-hardware smoke test for the Pallas kernels.

Validates on a real chip what the CPU interpreter cannot: on-core PRNG
statistics, Mosaic compilation of the fused ELBO kernels, and numerics
vs the pure-XLA path. Run manually: ``python benchmarks/tpu_smoke.py``.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    assert jax.default_backend() == "tpu", f"needs TPU, got {jax.default_backend()}"
    from midi_vae_tpu.losses.elbo import bce_from_logits, kl_gaussian
    from midi_vae_tpu.ops.fused_elbo import fused_bce_mean, fused_reparam_kl

    # --- reparam + KL: PRNG statistics -----------------------------------
    mu = jnp.full((8192, 16), 2.0)
    lv = jnp.full((8192, 16), jnp.log(0.25))
    z, kl = fused_reparam_kl(mu, lv, jnp.int32(7))
    z = np.asarray(z)
    print(f"z mean={z.mean():.4f} (want 2.0)  std={z.std():.4f} (want 0.5)")
    assert abs(z.mean() - 2.0) < 0.02, "on-core PRNG mean off"
    assert abs(z.std() - 0.5) < 0.02, "on-core PRNG std off"
    z2, _ = fused_reparam_kl(mu, lv, jnp.int32(7))
    z3, _ = fused_reparam_kl(mu, lv, jnp.int32(8))
    assert np.array_equal(z, np.asarray(z2)), "not deterministic under seed"
    assert not np.allclose(z, np.asarray(z3)), "seed ignored"
    np.testing.assert_allclose(float(kl), float(kl_gaussian(mu, lv)), rtol=1e-5)
    print("fused_reparam_kl: OK")

    # --- fused BCE: numerics + gradient vs XLA path ----------------------
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(64, 128, 128, 1)).astype(np.float32) * 3)
    targets = jnp.asarray(rng.uniform(-0.5, 0.5, size=(64, 128, 128, 1)).astype(np.float32))
    expected = float(jnp.mean(bce_from_logits(logits, targets)))
    got = float(fused_bce_mean(logits, targets))
    np.testing.assert_allclose(got, expected, rtol=1e-4)
    g_ref = jax.grad(lambda l: jnp.mean(bce_from_logits(l, targets)))(logits)
    g_fused = jax.grad(lambda l: fused_bce_mean(l, targets))(logits)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-3, atol=1e-6)
    print("fused_bce_mean: OK")
    print("TPU smoke: ALL OK")


if __name__ == "__main__":
    main()
