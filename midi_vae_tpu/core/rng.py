"""PRNG key plumbing — TPU-native replacement for the reference's seed gymnastics.

The reference seeds three RNG libraries and walks a ``random.randint``
chain to derive per-epoch seeds so preempted jobs resume reproducibly
(``midi_autoencoder/utils.py:83-160``, ``train.py:345-369``). JAX's
splittable threefry PRNG makes the same guarantees structurally: we
*fold* the epoch number into a root key. Resume at epoch N
reconstructs exactly the key stream of an uninterrupted run, with no
RNG state to checkpoint.

Multi-host note: device-side keys are NEVER folded with the process
rank (the reference offsets its epoch seed by GPU rank,
train.py:359-369). Under multi-controller SPMD an unsharded jit
argument must be identical on every process; per-sample decorrelation
comes from drawing noise over the *global* batch shape from one key
(models/vae.py reparameterize). Host-side numpy seeds
(:func:`host_epoch_seed`) may take a process_index where host streams
legitimately differ.
"""

from __future__ import annotations

import jax
import numpy as np

# Mirrors the clamp the reference applies before seeding numpy
# (utils.py:107); also the domain of our host-side shuffle seeds.
_SEED_MODULUS = 0xFFFF_FFFF


def root_key(seed: int) -> jax.Array:
    """Root PRNG key for a run (reference: utils.py:83 set_rng_seeds_fixed)."""
    return jax.random.PRNGKey(seed % _SEED_MODULUS)


def epoch_key(seed: int, epoch: int) -> jax.Array:
    """Key for one epoch, stable under preemption resume.

    Replaces the seeded ``random.randint`` chain of
    ``utils.py:133-160 determine_epoch_seed``: epoch N's key depends only
    on (seed, epoch), never on how many epochs actually executed in this
    process, so a resumed job replays the identical stream.
    """
    if epoch == 0:
        raise ValueError("Epoch must be indexed from 1, not 0.")
    return jax.random.fold_in(root_key(seed), epoch)


def host_epoch_seed(seed: int, epoch: int, process_index: int = 0) -> int:
    """Deterministic integer seed for host-side numpy shuffling.

    Same contract as ``determine_epoch_seed`` + the per-rank offset at
    ``train.py:363``: stable under resume, distinct across epochs and
    processes. The concrete stream intentionally differs from the
    reference's CPython ``random`` chain (different RNG family); the
    *structure* — resume-reproducible per-epoch seeds — is what the
    capability requires.
    """
    if epoch == 0:
        raise ValueError("Epoch must be indexed from 1, not 0.")
    ss = np.random.SeedSequence([seed % _SEED_MODULUS, epoch, process_index])
    return int(ss.generate_state(1, dtype=np.uint32)[0])


def host_rng(seed: int, epoch: int, process_index: int = 0) -> np.random.Generator:
    """Numpy Generator seeded with :func:`host_epoch_seed`."""
    return np.random.default_rng(host_epoch_seed(seed, epoch, process_index))
