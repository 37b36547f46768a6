"""β-TC-VAE loss (Chen et al. 2018, "Isolating Sources of
Disentanglement in VAEs") — a capability extension beyond the
reference's plain ELBO.

Decomposes the KL term into index-code mutual information, total
correlation (TC), and dimension-wise KL, so the disentanglement
pressure (β on TC alone) can be raised without crushing per-dimension
information the way plain β-VAE does:

    E_x[KL(q(z|x) ‖ p(z))] = MI + TC + DWKL

All three terms use the minibatch-weighted-sampling estimator (paper
§B.2): aggregate densities are approximated with the batch as samples
and a 1/(N·M) importance weight, so everything is one jit-friendly
[B, B, D] log-density tensor — no extra forward passes, no discriminator
(unlike FactorVAE).

Loss = reconstruction + α·MI + β·TC + γ·DWKL (α = γ = 1 by default,
matching the paper's recommended configuration).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from midi_vae_tpu.core.types import LossOutput, ModelOutput
from midi_vae_tpu.losses.elbo import bce_from_logits

_LOG_2PI = math.log(2.0 * math.pi)


def _gaussian_log_density(z: jax.Array, mu: jax.Array, log_var: jax.Array) -> jax.Array:
    """Elementwise log N(z; mu, exp(log_var)) — broadcasts."""
    return -0.5 * (_LOG_2PI + log_var + jnp.square(z - mu) / jnp.exp(log_var))


def tc_decomposition(
    z: jax.Array,  # [B, D] posterior samples
    mu: jax.Array,  # [B, D]
    log_var: jax.Array,  # [B, D]
    dataset_size: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(mi, tc, dwkl) — batch means of the three KL components.

    ``dataset_size`` is N in the minibatch-weighted normalizer
    log(N·M); the estimator is biased for small batches but consistent.
    """
    B = z.shape[0]
    # f32 throughout: the [B,B,D] density matrix and its logsumexp would
    # otherwise run in the model compute dtype (bf16 carries ~3 digits)
    z, mu, log_var = (a.astype(jnp.float32) for a in (z, mu, log_var))
    # [B, B, D]: log q(z_i[d] | x_j) for every pair (i, j)
    mat = _gaussian_log_density(z[:, None, :], mu[None, :, :], log_var[None, :, :])
    log_norm = jnp.log(jnp.float32(B * dataset_size))

    log_qz_cond = jnp.sum(_gaussian_log_density(z, mu, log_var), axis=-1)  # log q(z_i|x_i)
    log_qz = jax.nn.logsumexp(jnp.sum(mat, axis=-1), axis=1) - log_norm  # log q(z_i)
    log_prod_qzd = jnp.sum(jax.nn.logsumexp(mat, axis=1) - log_norm, axis=-1)  # Σ_d log q(z_i[d])
    log_pz = jnp.sum(_gaussian_log_density(z, jnp.zeros_like(z), jnp.zeros_like(z)), axis=-1)

    mi = jnp.mean(log_qz_cond - log_qz)
    tc = jnp.mean(log_qz - log_prod_qzd)
    dwkl = jnp.mean(log_prod_qzd - log_pz)
    return mi, tc, dwkl


def beta_tc_elbo_loss(
    output: ModelOutput,
    *,
    tc_beta: float = 6.0,
    alpha: float = 1.0,
    gamma: float = 1.0,
    dataset_size: int = 1,
    kld_weight: Optional[jax.Array] = None,
    log_var_clamp=None,
    pos_weight: Optional[float] = None,
    target_denorm=None,
    gather_axes: Optional[Tuple[str, ...]] = None,
) -> LossOutput:
    """BCE reconstruction + α·MI + β·TC + γ·DWKL.

    ``kld_weight`` (the schedule output) scales the whole KL block, so
    KL annealing composes with the TC decomposition. Reported fields
    keep the ELBO conventions: ``kl`` is the full decomposed KL,
    ``kld_loss`` its negation (models.py:224 reporting parity).

    ``gather_axes`` makes the estimator SPMD-correct inside a shard_map
    body: the [B, B, D] pairwise density matrix must span the GLOBAL
    batch, so the per-shard ``z``/``mu``/``log_var`` ([B/n, D] — tiny)
    are all-gathered over the named mesh axes before the decomposition.
    The reconstruction term stays local (its psum-mean is the global
    mean over equal shards), while each shard computes the identical
    global KL block; ``all_gather``'s transpose (a scatter-sum) routes
    each shard's KL cotangents back to the shard that produced the
    latents, so psum-averaged gradients equal the auto path's exactly
    (equivalence-tested in tests/test_spmd.py). The decomposition is
    permutation-invariant over the batch index — gather order across
    axes cannot change the value.
    """
    lv = output.encoded.log_var
    if log_var_clamp is not None:
        lv = jnp.clip(lv, log_var_clamp[0], log_var_clamp[1])
    z, mu = output.latents, output.encoded.mu
    if gather_axes is not None:
        z, mu, lv = (
            jax.lax.all_gather(t, gather_axes, axis=0, tiled=True) for t in (z, mu, lv)
        )
    targets = output.input
    if target_denorm is not None:
        from midi_vae_tpu.losses.elbo import denormalized_targets

        targets = denormalized_targets(targets, target_denorm)
    recon = bce_from_logits(output.logits, targets, pos_weight).mean()
    mi, tc, dwkl = tc_decomposition(z, mu, lv, dataset_size)
    w = jnp.asarray(1.0 if kld_weight is None else kld_weight, recon.dtype)
    kl_block = alpha * mi + tc_beta * tc + gamma * dwkl
    loss = recon + w * kl_block
    kl_total = mi + tc + dwkl
    return LossOutput(
        loss=loss,
        reconstruction_loss=jax.lax.stop_gradient(recon),
        kld_loss=jax.lax.stop_gradient(-kl_total),
        kl=jax.lax.stop_gradient(kl_total),
        kld_weight=w,
    )
