"""Disentanglement metrics: the Mutual Information Gap (MIG).

Chen et al. 2018 ("Isolating Sources of Disentanglement in VAEs", §4.1)
propose MIG as the quantitative companion to the β-TC-VAE objective this
package already trains (``losses/tcvae.py``): for each ground-truth
factor, how much more mutual information does the single best latent
dimension carry than the runner-up, normalized by the factor's entropy?

    MIG = (1/K) Σ_k [ I(z_(j*); v_k) − max_{j≠j*} I(z_j; v_k) ] / H(v_k)

MIG ∈ [0, 1]; 1 means every factor is captured by exactly one latent
coordinate, 0 means it is either not captured at all or smeared over
several. Without this metric the β-TC objective's stated purpose —
*disentangled* latents — is unverifiable; with it, ``--loss beta-tc``
runs can be compared against plain ELBO runs on the number the
objective actually targets.

Capability extension: the reference has no disentanglement (or any
latent) diagnostics. Design notes:

- The representation scored is the posterior MEAN (the deterministic
  code downstream consumers use), collected by a jitted encode sweep
  (``encode_means``) — not the reparameterized samples the training
  loss sees.
- Mutual information is estimated host-side with the standard plug-in
  (histogram) estimator over per-dimension equal-width bins. The
  arrays involved are [N, D] floats and [D, K] tables — there is no
  TPU-shaped work here, so numpy is the honest tool (same stance as
  the K-fold split logic in ``data/splits.py``).
- Factors are discrete label vectors. Dataset class labels (line
  counts for the synthetic corpora, note-density classes for MIDI,
  digits for MNIST) are the factor every dataset already carries;
  ``mig_score`` accepts an [N, K] matrix when richer per-sample factor
  annotations exist.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from midi_vae_tpu.models.vae import label_kwarg


def encode_means(loader, model, state) -> tuple:
    """Sweep ``loader`` through the encoder; return host (mu [N, D], y [N]).

    Padding slots (``mask == 0``) are dropped. Conditional models encode
    under their labels (q(z|x, y)), matching every other eval path.
    """
    conditional = getattr(model, "num_classes", 0) > 0

    @jax.jit
    def _enc(params, batch_stats, x, y):
        enc = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=False,
            method=type(model).encode,
            **label_kwarg(y if conditional else None),
        )
        return enc.mu

    mus, ys = [], []
    for batch in loader.epoch(1):
        mu = np.asarray(_enc(state.params, state.batch_stats, batch.x, batch.y), np.float32)
        valid = np.asarray(batch.mask) > 0
        mus.append(mu[valid])
        ys.append(np.asarray(batch.y)[valid])
    return np.concatenate(mus), np.concatenate(ys)


def discretize(codes: np.ndarray, bins: int = 20) -> np.ndarray:
    """Per-dimension equal-width binning of [N, D] floats → int bin ids.

    A collapsed dimension (constant mu) lands entirely in one bin and
    therefore carries exactly zero estimated MI — the desired reading.
    """
    codes = np.asarray(codes, np.float64)
    out = np.empty(codes.shape, np.int64)
    for d in range(codes.shape[1]):
        col = codes[:, d]
        lo, hi = float(col.min()), float(col.max())
        if hi <= lo:  # constant dim: one bin
            out[:, d] = 0
            continue
        edges = np.linspace(lo, hi, bins + 1)[1:-1]
        out[:, d] = np.searchsorted(edges, col, side="right")
    return out


def discrete_entropy(labels: np.ndarray) -> float:
    """Plug-in entropy H(v) in nats of an integer label vector."""
    _, counts = np.unique(np.asarray(labels), return_counts=True)
    p = counts / counts.sum()
    return float(-np.sum(p * np.log(p)))


def discrete_mutual_information(a: np.ndarray, b: np.ndarray) -> float:
    """Plug-in I(a; b) in nats from the joint contingency table."""
    a = np.asarray(a).ravel()
    b = np.asarray(b).ravel()
    _, ai = np.unique(a, return_inverse=True)
    _, bi = np.unique(b, return_inverse=True)
    joint = np.zeros((ai.max() + 1, bi.max() + 1), np.float64)
    np.add.at(joint, (ai, bi), 1.0)
    joint /= joint.sum()
    pa = joint.sum(axis=1, keepdims=True)
    pb = joint.sum(axis=0, keepdims=True)
    nz = joint > 0
    return float(np.sum(joint[nz] * (np.log(joint[nz]) - np.log((pa * pb)[nz]))))


def mig_score(
    mu: np.ndarray,
    factors: np.ndarray,
    bins: int = 20,
) -> Dict[str, object]:
    """MIG of representation ``mu`` [N, D] against discrete ``factors``.

    ``factors``: [N] (one factor) or [N, K]. Returns a dict with:
      ``mig`` (scalar, mean over factors), ``mig_per_factor`` [K],
      ``mi`` [D, K] (the full MI table, nats), ``factor_entropy`` [K],
      and ``top_dims`` [K] (argmax latent dim per factor).
    Factors with zero entropy (a single class) contribute NaN and are
    excluded from the mean; an all-degenerate factor set yields
    ``mig = nan``.
    """
    mu = np.asarray(mu)
    factors = np.asarray(factors)
    if factors.ndim == 1:
        factors = factors[:, None]
    if mu.shape[0] != factors.shape[0]:
        raise ValueError(f"mu has {mu.shape[0]} samples but factors has {factors.shape[0]}")
    if mu.shape[0] == 0:
        raise ValueError("cannot score an empty representation")

    codes = discretize(mu, bins=bins)
    D, K = mu.shape[1], factors.shape[1]
    mi = np.zeros((D, K))
    for k in range(K):
        for d in range(D):
            mi[d, k] = discrete_mutual_information(codes[:, d], factors[:, k])

    entropy = np.array([discrete_entropy(factors[:, k]) for k in range(K)])
    mig_per_factor = np.full(K, np.nan)
    for k in range(K):
        if entropy[k] <= 0:
            continue  # degenerate factor: MIG undefined
        order = np.sort(mi[:, k])[::-1]
        gap = order[0] - (order[1] if D > 1 else 0.0)
        mig_per_factor[k] = gap / entropy[k]

    finite = mig_per_factor[np.isfinite(mig_per_factor)]
    return {
        "mig": float(finite.mean()) if finite.size else float("nan"),
        "mig_per_factor": mig_per_factor,
        "mi": mi,
        "factor_entropy": entropy,
        "top_dims": mi.argmax(axis=0),
    }


def mig_from_loader(
    loader, model, state, bins: int = 20, factors: Optional[np.ndarray] = None
) -> Dict[str, object]:
    """Convenience: encode a partition and score MIG against its labels
    (or an explicit per-sample ``factors`` matrix in loader order)."""
    mu, y = encode_means(loader, model, state)
    return mig_score(mu, y if factors is None else factors, bins=bins)
