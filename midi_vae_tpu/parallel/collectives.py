"""Named-axis collective helpers (reference: ``utils.py:209-299``).

The reference defines (but never calls) NCCL gather wrappers:
``concat_all_gather`` (fixed shape) and ``concat_all_gather_ragged``
(length-gather → pad → gather → trim). The TPU-native equivalents are
thin compositions of ``jax.lax`` collectives over a named mesh axis,
usable inside ``shard_map``; XLA lowers them onto ICI rings.

:func:`psum_mean` is the gradient/metric all-reduce the reference left
unwired (no DDP — SURVEY C12); the jit auto-partitioned train path gets
this implicitly, while the explicit ``shard_map`` path
(``parallel/spmd.py``) calls these directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def concat_all_gather(x: jax.Array, axis_name: str) -> jax.Array:
    """All-gather along a mesh axis, concatenated on the leading dim
    (contract of utils.py:210-241)."""
    return jax.lax.all_gather(x, axis_name, tiled=True)


def concat_all_gather_ragged(x: jax.Array, valid_count: jax.Array, axis_name: str, max_count: int):
    """Ragged all-gather: pad to ``max_count``, gather, return values + masks.

    The reference pads each rank's tensor to the longest then trims after
    gathering (utils.py:244-299). With static shapes we pad to a
    compile-time ``max_count`` and return a validity mask instead of
    trimming — callers reduce with the mask (exactly how the
    implementation behaves, minus dynamic shapes; SURVEY §5 notes this
    mapping is XLA-friendly).

    Parameters
    ----------
    x : [n, ...] local array with ``valid_count`` real rows (n == max_count)
    valid_count : scalar int, number of valid leading rows on this shard
    """
    n = x.shape[0]
    assert n == max_count, f"pad x to max_count before gathering ({n} != {max_count})"
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    mask = (idx < valid_count).astype(jnp.float32)
    gathered = jax.lax.all_gather(x, axis_name, tiled=True)
    masks = jax.lax.all_gather(mask, axis_name, tiled=True)
    return gathered, masks


def psum_mean(x, axis_name):
    """Mean-reduce a pytree across one mesh axis (or a tuple of axes, e.g.
    ``('slice', 'data')`` on the hierarchical multi-slice mesh — XLA lowers
    the two-axis psum as ICI-within-slice then DCN-across)."""
    n = jax.lax.psum(1, axis_name)
    return jax.tree_util.tree_map(lambda a: jax.lax.psum(a, axis_name) / n, x)
