"""Learning-rate schedules (reference: ``train.py:230-240``).

The reference supports exactly one scheduler — ``OneCycleLR``
(train.py:232-240, raising for anything else). :func:`onecycle_lr`
replicates torch's two-phase cosine OneCycle formula step for step,
including the implicit hyperparameters (``pct_start=0.3``,
``div_factor=25``, ``final_div_factor=1e4``) and the momentum
counter-cycling torch applies to Adam's β1 (``cycle_momentum=True``,
base 0.85 / max 0.95). Implemented as pure ``step -> value`` functions
usable both inside jit and by optax.

Additional named schedules (constant / cosine / step-decay) extend the
config surface the reference gates at train.py:239-240.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _annealing_cos(start: float, end: float, pct: jnp.ndarray) -> jnp.ndarray:
    """torch OneCycleLR._annealing_cos: cosine from start to end as pct goes 0→1."""
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def onecycle_lr(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> Schedule:
    """torch ``OneCycleLR`` (cos anneal, three_phase=False) equivalence.

    Phase boundaries use torch's step counts: rise over
    ``pct_start·total - 1`` steps from ``max_lr/div_factor`` to
    ``max_lr``, then anneal to ``max_lr/(div_factor·final_div_factor)``
    over the remainder.
    """
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    step_size_up = max(float(pct_start * total_steps) - 1.0, 1.0)
    step_size_down = max(float(total_steps - step_size_up) - 1.0, 1.0)

    def sched(step: jnp.ndarray) -> jnp.ndarray:
        s = jnp.asarray(step, jnp.float32)
        s = jnp.minimum(s, float(total_steps) - 1.0)
        up = _annealing_cos(initial_lr, max_lr, s / step_size_up)
        down = _annealing_cos(max_lr, min_lr, (s - step_size_up) / step_size_down)
        return jnp.where(s <= step_size_up, up, down)

    return sched


def onecycle_momentum(
    total_steps: int,
    base_momentum: float = 0.85,
    max_momentum: float = 0.95,
    pct_start: float = 0.3,
) -> Schedule:
    """torch OneCycle momentum counter-cycle (β1 for Adam-family)."""
    step_size_up = max(float(pct_start * total_steps) - 1.0, 1.0)
    step_size_down = max(float(total_steps - step_size_up) - 1.0, 1.0)

    def sched(step: jnp.ndarray) -> jnp.ndarray:
        s = jnp.asarray(step, jnp.float32)
        s = jnp.minimum(s, float(total_steps) - 1.0)
        up = _annealing_cos(max_momentum, base_momentum, s / step_size_up)
        down = _annealing_cos(base_momentum, max_momentum, (s - step_size_up) / step_size_down)
        return jnp.where(s <= step_size_up, up, down)

    return sched


def constant_lr(lr: float) -> Schedule:
    def sched(step):
        del step
        return jnp.float32(lr)

    return sched


def cosine_lr(max_lr: float, total_steps: int, final_lr: float = 0.0) -> Schedule:
    def sched(step):
        pct = jnp.clip(jnp.asarray(step, jnp.float32) / max(total_steps, 1), 0.0, 1.0)
        return _annealing_cos(max_lr, final_lr, pct)

    return sched


def step_decay_lr(max_lr: float, step_size: int, gamma: float = 0.1) -> Schedule:
    """torch StepLR equivalent — the scheduler the legacy YAML records
    (``scheduler_gamma: 0.1``, configs/vae.yaml:19)."""

    def sched(step):
        k = jnp.floor(jnp.asarray(step, jnp.float32) / float(step_size))
        return max_lr * jnp.power(jnp.float32(gamma), k)

    return sched


def lr_schedule(
    name: str,
    max_lr: float,
    total_steps: int,
    *,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
    step_size: int = 1000,
    gamma: float = 0.1,
) -> Schedule:
    """Build a named LR schedule (case-insensitive). 'onecycle' matches the
    reference's sole supported scheduler (train.py:232)."""
    key = name.lower()
    if key == "onecycle":
        return onecycle_lr(max_lr, total_steps, pct_start, div_factor, final_div_factor)
    if key == "constant":
        return constant_lr(max_lr)
    if key == "cosine":
        return cosine_lr(max_lr, total_steps)
    if key == "step":
        return step_decay_lr(max_lr, step_size, gamma)
    raise NotImplementedError(f"Scheduler {name} not supported.")
