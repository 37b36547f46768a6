"""Importance-weighted log-likelihood bound (IWAE, Burda et al. 2016).

Capability extension — the reference reports only reconstruction-space
metrics (``evaluation.py:95-101``). The IWAE bound

    log p(x) >= E[ log (1/K) sum_k  p(x|z_k) p(z_k) / q(z_k|x) ],
    z_k ~ q(z|x)

is the standard held-out density estimate for VAEs: it tightens
monotonically in K toward the true log-likelihood, so it ranks model
variants on what the ELBO only bounds. K=1 recovers a single-sample
ELBO estimate.

Target-space contract: a Bernoulli likelihood needs targets in [0, 1].
Pass ``target_denorm`` (the transform's ``(mean, std)``) to evaluate
against the de-normalized pixels — ALWAYS do this for checkpoints
trained under the reference's normalized-target parity semantics, whose
shifted targets are not a distribution (the same caveat as
``losses/elbo.py:denormalized_targets``). The per-element log-likelihood
uses the training objective's −100-clamped BCE so the bound is measured
in the same (finite) likelihood family the model was optimized in.

Memory: the K decodes are chunked (``chunk`` draws per compiled call,
running ``logaddexp`` across chunks), so device residency is bounded by
``chunk × batch`` images regardless of K.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from midi_vae_tpu.models.vae import label_kwarg
from midi_vae_tpu.losses.elbo import bce_from_logits, denormalized_targets

_LOG_2PI = math.log(2.0 * math.pi)


def make_iwae_step(model, chunk: int, target_denorm: Optional[Tuple] = None):
    """Jitted reducer: one batch, ``chunk`` posterior draws → per-sample
    log-sum-exp of importance weights (UNNORMALIZED — the sweep divides
    by the total K once, so chunks compose exactly).

    Draw j of the sweep uses ``fold_in(batch_key, offset + j)``, so the
    draws depend only on their global index: splitting K into chunks of
    any size reduces the SAME draws (bounds equal up to float summation
    order; tested)."""

    @jax.jit
    def iwae_step(params, batch_stats, x, y, batch_key, offset):
        variables = {"params": params, "batch_stats": batch_stats}
        # y is None exactly for unconditional models (iwae_bound gates on
        # num_classes), which may not have a y parameter at all
        yk = label_kwarg(y)
        enc = model.apply(variables, x, train=False, method=type(model).encode, **yk)
        mu = enc.mu.astype(jnp.float32)
        log_var = enc.log_var.astype(jnp.float32)
        b, d = mu.shape

        eps = jax.vmap(
            lambda j: jax.random.normal(jax.random.fold_in(batch_key, j), (b, d), jnp.float32)
        )(offset + jnp.arange(chunk))
        z = mu[None] + eps * jnp.exp(0.5 * log_var)[None]

        logits = model.apply(
            variables, z.reshape(chunk * b, d), train=False,
            method=type(model).decode_logits,
            # conditional models: each of the chunk draws decodes under its
            # sample's label (the bound is on p(x|y))
            **label_kwarg(None if y is None else jnp.tile(y, chunk)),
        )
        logits = logits.reshape((chunk, b) + logits.shape[1:]).astype(jnp.float32)

        targets = x if target_denorm is None else denormalized_targets(x, target_denorm)
        # Bernoulli log p(x|z_k): [chunk, B] — sum of the clamped
        # elementwise log-likelihood over pixels
        ll = -jnp.sum(bce_from_logits(logits, targets[None]), axis=tuple(range(2, logits.ndim)))
        # log p(z) - log q(z|x), both factorized Gaussians: the N(0,1)
        # prior at z and N(mu, sigma^2) at z (where (z-mu)/sigma = eps)
        log_p = -0.5 * jnp.sum(jnp.square(z) + _LOG_2PI, axis=-1)
        log_q = -0.5 * jnp.sum(jnp.square(eps) + _LOG_2PI + log_var[None], axis=-1)
        return jax.scipy.special.logsumexp(ll + log_p - log_q, axis=0)  # [B]

    return iwae_step


def iwae_bound(
    loader,
    model,
    state,
    *,
    k: int = 64,
    chunk: int = 16,
    seed: int = 0,
    target_denorm: Optional[Tuple] = None,
) -> float:
    """Dataset-mean IWAE bound in nats/sample (higher = better).

    Draw chunks accumulate device-side via ``logaddexp`` (exactly
    equivalent to one K-draw ``logsumexp``); padded samples are dropped
    by the loader mask before the host mean.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if getattr(model, "latent_kind", "gaussian") == "vq":
        raise ValueError(
            "the IWAE bound assumes a Gaussian posterior q(z|x); a VQ-VAE's "
            "posterior is a point mass on the nearest code — use the "
            "reconstruction metrics / codebook perplexity instead"
        )
    chunk = min(chunk, k)
    n_chunks, rem = divmod(k, chunk)
    sizes = [chunk] * n_chunks + ([rem] if rem else [])
    steps = {size: make_iwae_step(model, size, target_denorm) for size in set(sizes)}
    base_key = jax.random.PRNGKey(seed)

    total = 0.0
    count = 0
    conditional = getattr(model, "num_classes", 0) > 0
    for i, batch in enumerate(loader.epoch(1)):
        batch_key = jax.random.fold_in(base_key, i)
        lse = None
        offset = 0
        for size in sizes:
            part = steps[size](
                state.params, state.batch_stats, batch.x,
                batch.y if conditional else None, batch_key, jnp.int32(offset),
            )
            offset += size
            lse = part if lse is None else jnp.logaddexp(lse, part)
        # Mask + reduce ON DEVICE: the per-sample [B] bound may be sharded
        # across processes under multi-controller SPMD (not addressable
        # from any one host), but its masked SUM is a replicated scalar —
        # XLA inserts the cross-shard collective, and every process reads
        # the same value. This is what makes --final-iwae work on pods.
        mask = jnp.asarray(batch.mask) > 0
        bound = jnp.where(mask, lse - math.log(k), 0.0)
        total += float(bound.sum())  # single host sync per batch
        count += int(jnp.sum(mask))
    if count == 0:
        raise ValueError("empty evaluation stream")
    return total / count
