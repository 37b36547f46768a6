"""KL-weight (β) schedules — BASELINE.json config #3 "β-VAE / KL-annealing".

The reference only hints at these: a constant ``kld_weight`` default of
1.0 (models.py:16), a recorded β of 2.5e-4 in the dead YAML
(configs/vae.yaml:20), and a commented-out multiplicative ramp
``min(w·1.005, 1.0)`` per step (models.py:218-219). Here every variant
is a first-class pure function ``step -> weight`` usable inside jit, so
the weight is a device scalar and never forces a host sync.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Schedule = Callable[[jax.Array], jax.Array]


def constant(weight: float) -> Schedule:
    def sched(step):
        del step
        return jnp.float32(weight)

    return sched


def multiplicative(initial: float, growth: float = 1.005, cap: float = 1.0) -> Schedule:
    """The reference's commented-out per-step ramp (models.py:218-219):
    ``w(t) = min(initial · growth^t, cap)``."""

    def sched(step):
        w = initial * jnp.power(jnp.float32(growth), step.astype(jnp.float32))
        return jnp.minimum(w, jnp.float32(cap))

    return sched


def linear_warmup(target: float, warmup_steps: int, initial: float = 0.0) -> Schedule:
    """Linear anneal from ``initial`` to ``target`` over ``warmup_steps``."""

    def sched(step):
        frac = jnp.clip(step.astype(jnp.float32) / max(warmup_steps, 1), 0.0, 1.0)
        return jnp.float32(initial) + frac * (target - initial)

    return sched


def cyclical(target: float, period: int, ramp_fraction: float = 0.5) -> Schedule:
    """Cyclical annealing (Fu et al. 2019): within each period, ramp
    linearly 0 → target over ``ramp_fraction`` of the period, then hold."""

    def sched(step):
        pos = jnp.mod(step.astype(jnp.float32), jnp.float32(period)) / jnp.float32(period)
        frac = jnp.clip(pos / ramp_fraction, 0.0, 1.0)
        return frac * jnp.float32(target)

    return sched


def kl_weight_schedule(
    kind: str = "constant",
    weight: float = 1.0,
    *,
    warmup_steps: int = 1000,
    growth: float = 1.005,
    cap: float = 1.0,
    period: int = 1000,
    ramp_fraction: float = 0.5,
    initial: float = 0.0,
) -> Schedule:
    """Build a β schedule by name: constant | multiplicative | linear | cyclical."""
    kind = kind.lower()
    if kind == "constant":
        return constant(weight)
    if kind == "multiplicative":
        return multiplicative(weight, growth=growth, cap=cap)
    if kind == "linear":
        return linear_warmup(weight, warmup_steps, initial=initial)
    if kind == "cyclical":
        return cyclical(weight, period, ramp_fraction=ramp_fraction)
    raise ValueError(f"Unknown KL schedule kind: {kind}")
