"""VQ-VAE training objective: reconstruction + commitment.

van den Oord et al. 2017, eq. 3, with the codebook term replaced by the
EMA updates inside ``models/vq.py:VectorQuantizerEMA`` (Appendix A.1):

    L = BCE(x̂, x) + β · ||z_e(x) − sg[e]||²

The BCE term reuses the exact reconstruction machinery of the Gaussian
ELBO (``losses/elbo.py``: torch −100 clamp parity, ``pos_weight``
rebalancing, raw-target de-normalization), so every sparse-corpus
anti-collapse tool carries over to the discrete family unchanged.

LossOutput field mapping (the contract the trainer/logger consume,
core/types.py): ``kl`` carries the commitment distance (the
non-reconstruction term of THIS objective), ``kld_loss`` its negation
(reference reporting convention), ``kld_weight`` the commitment weight β
— which rides the existing KL-weight schedules, so ``--kld-weight 0.25``
is the paper's β and warmups/cycles work out of the box.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from midi_vae_tpu.core.types import LossOutput, ModelOutput
from midi_vae_tpu.losses.elbo import bce_from_logits, denormalized_targets


def vq_loss(
    output: ModelOutput,
    commitment_weight: jax.Array | float = 0.25,
    pos_weight: Optional[float] = None,
    target_denorm: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None,
) -> LossOutput:
    """VQ objective from a ``ModelOutput`` produced by ``models/vq.py:VQVAE``.

    ``output.encoded.mu`` is the continuous pre-quantization latent
    z_e; ``output.latents`` is the straight-through value whose forward
    value equals the quantized z_q — so ``sg[output.latents]`` IS
    ``sg[z_q]`` and the commitment term needs no second forward pass.
    """
    targets = output.input
    if target_denorm is not None:
        targets = denormalized_targets(targets, target_denorm)
    loss_recon = jnp.mean(bce_from_logits(output.logits, targets, pos_weight))
    z_e = output.encoded.mu.astype(jnp.float32)
    z_q = jax.lax.stop_gradient(output.latents.astype(jnp.float32))
    commit = jnp.mean(jnp.square(z_e - z_q))
    w = jnp.asarray(commitment_weight, dtype=loss_recon.dtype)
    loss = loss_recon + w * commit
    return LossOutput(
        loss=loss,
        reconstruction_loss=jax.lax.stop_gradient(loss_recon),
        kld_loss=jax.lax.stop_gradient(-commit),
        kl=jax.lax.stop_gradient(commit),
        kld_weight=w,
    )
