"""ELBO loss: BCE reconstruction + weighted Gaussian KL.

Formula parity with the reference (``midi_autoencoder/models.py:190-225``):

- reconstruction = binary cross-entropy, **mean over every element**
  (models.py:208 ``F.binary_cross_entropy`` default reduction)
- KL = ``-0.5 * mean_batch( sum_latent( 1 + log_var - mu² - exp(log_var) ) )``
  (models.py:214)
- total = reconstruction + kld_weight · KL (models.py:216)
- the returned ``kld_loss`` keeps the reference's negated-KL reporting
  convention (models.py:224)

TPU-native difference: BCE is computed **from logits** with the fused
max/log1p-exp form, which is mathematically identical to sigmoid + BCE
on probabilities but numerically stable at saturated logits (torch
clamps log terms at -100 instead; at such saturation both paths produce
equivalent training signal). The reference's commented-out options —
log_var clamping (models.py:210-212) and KL-weight annealing
(models.py:218-219) — are first-class here: ``log_var_clamp`` and the
schedules in ``losses/schedules.py``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from midi_vae_tpu.core.types import LossOutput, ModelOutput


_LOG_CLAMP = -100.0  # torch binary_cross_entropy clamps log terms at -100


def bce_from_logits(
    logits: jax.Array, targets: jax.Array, pos_weight: Optional[float] = None
) -> jax.Array:
    """Elementwise binary cross-entropy from logits, in nats.

    ``-[t·max(log σ(l), -100) + (1-t)·max(log(1-σ(l)), -100)]`` — the log
    terms are clamped at -100 exactly as torch's ``binary_cross_entropy``
    clamps them. The clamp matters here beyond numerics: the reference's
    default transforms normalize targets to [-0.5, 0.5]
    (data_transformations.py:6, mean 0.5/std 1.0), and BCE against
    negative targets is unbounded below without it — training would run
    away to -inf. Everything stays one fused VPU expression
    (log σ(l) = -softplus(-l)).

    ``pos_weight`` multiplies the positive-class (target) term — torch's
    ``BCEWithLogitsLoss(pos_weight=...)`` convention, against the
    reference's unweighted formula at models.py:208. On sparse piano-rolls
    (~1-2% fill) the unweighted loss makes all-silence a strong local
    optimum; upweighting the set pixels by ~1/fill-rate rebalances the
    two classes' gradient mass (RESULTS.md "posterior collapse on sparse
    MIDI" — the reconstruction-side fix). ``None``/1.0 = reference parity.
    """
    # loss math runs in f32 regardless of the model compute dtype: bf16
    # logits would quantize the loss and its cotangents to ~3 significant
    # digits (the fused Pallas path casts the same way, ops/fused_elbo.py)
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    log_p = jnp.maximum(-jax.nn.softplus(-logits), _LOG_CLAMP)
    log_1mp = jnp.maximum(-jax.nn.softplus(logits), _LOG_CLAMP)
    pw = 1.0 if pos_weight is None else pos_weight
    return -(pw * targets * log_p + (1.0 - targets) * log_1mp)


def kl_gaussian(mu: jax.Array, log_var: jax.Array) -> jax.Array:
    """KL(N(mu, σ²) || N(0, I)): sum over latent dim, mean over batch (models.py:214).

    Computed in f32: under bf16 compute the encoder heads emit bf16
    mu/log_var, and a bf16 KL (plus its d/dmu = w·mu/B cotangent) carries
    only ~3 significant digits — the fused path already casts (ops/
    fused_elbo.py:51-52), and the two paths must match numerically.
    """
    mu, log_var = mu.astype(jnp.float32), log_var.astype(jnp.float32)
    return -0.5 * jnp.mean(jnp.sum(1.0 + log_var - mu**2 - jnp.exp(log_var), axis=-1))


def kl_gaussian_free_bits(mu: jax.Array, log_var: jax.Array, free_bits: float) -> jax.Array:
    """Free-bits KL (Kingma et al. 2016, IAF appendix): per-dimension
    batch-mean KL floored at ``free_bits`` nats, then summed over dims.

    Dimensions whose average KL sits below the floor contribute a
    constant — zero gradient — so the optimizer has no incentive to
    squeeze them further toward the prior. This is the standard
    anti-posterior-collapse tool for sparse targets (where predicting
    the empty output is a strong local optimum and the KL term happily
    shuts every latent dimension; see RESULTS.md "posterior collapse on
    sparse MIDI"). No reference equivalent.
    """
    mu, log_var = mu.astype(jnp.float32), log_var.astype(jnp.float32)  # f32 like kl_gaussian
    kl_dim = -0.5 * jnp.mean(1.0 + log_var - mu**2 - jnp.exp(log_var), axis=0)  # [latent]
    return jnp.sum(jnp.maximum(kl_dim, free_bits))


def denormalized_targets(
    targets: jax.Array, target_denorm: Tuple[Tuple[float, ...], Tuple[float, ...]]
) -> jax.Array:
    """Undo the input normalization on the BCE targets: t·std + mean, clipped
    to [0, 1].

    The reference computes BCE against the *normalized* input
    (models.py:208 with data_transformations.py:6's mean-0.5 shift), so its
    targets live in [-0.5, 0.5] — a regime where BCE is only bounded by the
    -100 log clamp and where the per-empty-cell optimum is saturated σ→0
    (the silence attractor itself). ``--bce-targets raw`` restores true
    probability-space targets; class-rebalancing (``pos_weight``) and the
    base-rate output bias are exact in this space.
    """
    from midi_vae_tpu.data.transforms import denormalize_with

    return jnp.clip(denormalize_with(target_denorm[0], target_denorm[1], targets), 0.0, 1.0)


def elbo_loss(
    output: ModelOutput,
    kld_weight: jax.Array | float = 1.0,
    log_var_clamp: Optional[Tuple[float, float]] = None,
    free_bits: Optional[float] = None,
    pos_weight: Optional[float] = None,
    target_denorm: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None,
) -> LossOutput:
    """VAE loss (reference: ``VanillaVAE.loss``, models.py:190-225).

    Parameters
    ----------
    output : ModelOutput
        Forward-pass output; ``logits`` drives the stable BCE path.
    kld_weight : float or scalar array
        β weight on the KL term. A device scalar so β/annealing schedules
        stay inside jit (the reference default is 1.0, models.py:16; the
        recorded MIDI runs used 2.5e-4, configs/vae.yaml:20).
    log_var_clamp : (min, max), optional
        The clamp the reference left commented out (models.py:210-212).
    free_bits : float, optional
        Per-dimension KL floor in nats (:func:`kl_gaussian_free_bits`).
        The *reported* ``kl`` stays the true (unfloored) KL; only the
        gradient-carrying term is floored.
    pos_weight : float, optional
        Positive-class weight on the BCE term (:func:`bce_from_logits`) —
        the sparse-corpus rebalancer. The reported ``reconstruction_loss``
        is the weighted value (it is the optimized objective).
    target_denorm : ((mean...), (std...)), optional
        De-normalize the BCE targets back to [0, 1] first
        (:func:`denormalized_targets`). None = reference parity
        (normalized targets, models.py:208).
    """
    targets = output.input
    if target_denorm is not None:
        targets = denormalized_targets(targets, target_denorm)
    loss_recon = jnp.mean(bce_from_logits(output.logits, targets, pos_weight))
    log_var = output.encoded.log_var
    if log_var_clamp is not None:
        log_var = jnp.clip(log_var, log_var_clamp[0], log_var_clamp[1])
    kl = kl_gaussian(output.encoded.mu, log_var)
    kl_term = (
        kl if free_bits is None else kl_gaussian_free_bits(output.encoded.mu, log_var, free_bits)
    )
    w = jnp.asarray(kld_weight, dtype=loss_recon.dtype)
    loss = loss_recon + w * kl_term
    return LossOutput(
        loss=loss,
        reconstruction_loss=jax.lax.stop_gradient(loss_recon),
        kld_loss=jax.lax.stop_gradient(-kl),  # reference reports the negated KL (models.py:224)
        kl=jax.lax.stop_gradient(kl),
        kld_weight=w,
    )
