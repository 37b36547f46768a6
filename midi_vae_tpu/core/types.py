"""Pytree data contracts crossing layer boundaries.

TPU-native equivalent of the reference TypedDict contracts
(``midi_autoencoder/types_helpers.py:15-37``). Implemented as
``flax.struct`` dataclasses so they are registered pytrees: they flow
through ``jit``/``grad``/``shard_map`` unchanged, and fields can be
donated/sharded individually.
"""

from __future__ import annotations

import jax
from flax import struct


@struct.dataclass
class EncoderOutput:
    """Output of a VAE encoder (reference: types_helpers.py:15-21).

    Attributes
    ----------
    mu : [B, D] posterior means
    log_var : [B, D] posterior log-variances
    pre_latents : [B, F] flattened feature map feeding the latent heads
    """

    mu: jax.Array
    log_var: jax.Array
    pre_latents: jax.Array


@struct.dataclass
class ModelOutput:
    """Output of a full VAE forward pass (reference: types_helpers.py:23-29).

    ``logits`` is a TPU-native addition: the pre-sigmoid reconstruction,
    kept so the ELBO can use the numerically-stable fused
    sigmoid-cross-entropy path instead of BCE on probabilities
    (reference applies Sigmoid in the model, models.py:81, then BCE on
    probabilities, models.py:208 — mathematically identical, less stable).
    """

    output: jax.Array  # reconstruction probabilities in [0, 1]
    logits: jax.Array  # pre-sigmoid reconstruction
    input: jax.Array  # the stimuli this reconstruction answers
    encoded: EncoderOutput
    latents: jax.Array  # reparameterized z ~ q(z|x)


@struct.dataclass
class LossOutput:
    """Output of the ELBO loss (reference: types_helpers.py:32-37).

    ``kld_loss`` keeps the reference's reporting convention of the
    *negated* KL term (models.py:224); ``kl`` carries the positive KL
    divergence for sane dashboards. All fields are device scalars — the
    trainer logs them asynchronously without per-step host syncs.
    """

    loss: jax.Array
    reconstruction_loss: jax.Array
    kld_loss: jax.Array  # == -kl, reference semantics
    kl: jax.Array  # positive KL(q(z|x) || N(0, I))
    kld_weight: jax.Array
