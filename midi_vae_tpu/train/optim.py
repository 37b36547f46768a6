"""Optimizer construction: per-component param groups, LR scaling, freezing.

Replicates the reference's optimization setup (train.py:193-240):

- linear LR scaling ``lr = lr_relative · batch_size / 128``
  (train.py:199-201, BASE_BATCH_SIZE at :16)
- per-component parameter groups with LR multipliers
  (``--lr-encoder-mult`` / ``--lr-decoder-mult``, train.py:210-225)
- encoder freezing (train.py:203-206) via ``optax.set_to_zero`` instead
  of ``requires_grad`` mutation
- optimizer selected by (torch-style) name (train.py:227-228)
- OneCycle momentum cycling applied to Adam's β1 / SGD momentum, as
  torch OneCycleLR does with ``cycle_momentum=True``

The reference's param groups accidentally cover only the two conv
stacks, leaving ``fc_mu``/``fc_var``/``decoder_input``/``final_layer``
unoptimized (train.py:210-225 builds groups from
``model.encoder.parameters()`` and ``model.decoder.parameters()`` only).
We group every parameter (see ``models/vae.py:param_group_label``).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional

import jax
import optax

from midi_vae_tpu.train.schedules import Schedule, lr_schedule, onecycle_momentum

BASE_BATCH_SIZE = 128  # reference: train.py:16


class OptimizerBundle(NamedTuple):
    tx: optax.GradientTransformation
    lr_schedules: Dict[str, Schedule]  # group name → schedule (for logging, train.py:731-741)
    frozen_groups: tuple


def scale_lr(lr_relative: float, global_batch_size: int) -> float:
    """Linear LR scaling with total batch size (train.py:199-201)."""
    return lr_relative * global_batch_size / BASE_BATCH_SIZE


def _base_optimizer(
    name: str,
    learning_rate: Schedule,
    weight_decay: float,
    b1: Optional[Schedule],
) -> optax.GradientTransformation:
    """Optimizer by torch-style name (train.py:227-228), case-insensitive.

    ``b1`` is the cycled momentum schedule (None → library default).
    ``inject_hyperparams`` makes scheduled hyperparameters part of the
    optimizer state, so they checkpoint/restore like everything else.
    """
    key = name.lower()
    if key == "adamw":
        opt = optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, b1=b1 if b1 is not None else 0.9, weight_decay=weight_decay
        )
    elif key == "adam":
        opt = optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate, b1=b1 if b1 is not None else 0.9)
        if weight_decay:
            opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
    elif key == "sgd":
        # torch.optim.SGD defaults to momentum=0 (plain SGD) — a silent 0.9
        # here would change optimization dynamics vs a torch baseline;
        # momentum applies only while the OneCycle momentum cycle drives b1
        if b1 is not None:
            opt = optax.inject_hyperparams(optax.sgd)(learning_rate=learning_rate, momentum=b1)
        else:
            opt = optax.inject_hyperparams(optax.sgd)(learning_rate=learning_rate)
        if weight_decay:
            opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
    elif key == "rmsprop":
        opt = optax.inject_hyperparams(optax.rmsprop)(learning_rate=learning_rate)
        if weight_decay:
            opt = optax.chain(optax.add_decayed_weights(weight_decay), opt)
    elif key == "adagrad":
        opt = optax.inject_hyperparams(optax.adagrad)(learning_rate=learning_rate)
    elif key == "lamb":
        opt = optax.inject_hyperparams(optax.lamb)(learning_rate=learning_rate, weight_decay=weight_decay)
    elif key == "lion":
        opt = optax.inject_hyperparams(optax.lion)(learning_rate=learning_rate, weight_decay=weight_decay)
    else:
        raise ValueError(f"Unsupported optimizer: {name}")
    return opt


def build_optimizer(
    params,
    label_fn: Callable,
    *,
    optimizer: str = "AdamW",
    lr: float = 0.01,
    lr_encoder_mult: float = 1.0,
    lr_decoder_mult: float = 1.0,
    weight_decay: float = 0.0,
    scheduler: str = "OneCycle",
    total_steps: int = 1000,
    freeze_encoder: bool = False,
    cycle_momentum: bool = True,
    grad_clip: Optional[float] = None,
) -> OptimizerBundle:
    """Build the partitioned optimizer.

    ``label_fn`` maps parameter paths to group names ("encoder"/"decoder"),
    mirroring the named param groups at train.py:210-225. Each group gets
    its own peak LR (``lr × group mult``) and schedule, exactly like
    passing per-group max_lr lists to torch OneCycleLR (train.py:232-238).
    ``params`` may be None: labels are then resolved lazily at ``tx.init``.

    ``grad_clip`` (capability extension — the reference has no gradient
    clipping) clips the GLOBAL gradient norm across all trainable
    parameters to the given value before the per-group transforms, torch
    ``clip_grad_norm_`` semantics. Frozen groups are zeroed before the
    norm is taken — in torch they would have no ``.grad`` at all, so
    letting them inflate the norm would silently over-clip the live
    groups. The grad_norm the trainer logs is the PRE-clip norm (the
    value users watch to choose a threshold).
    """
    del params  # labels resolve lazily from the params passed to tx.init

    def labels(p):
        return jax.tree_util.tree_map_with_path(label_fn, p)

    is_onecycle = scheduler.lower() == "onecycle"
    b1 = onecycle_momentum(total_steps) if (is_onecycle and cycle_momentum) else None

    group_mults = {"encoder": lr_encoder_mult, "decoder": lr_decoder_mult}
    transforms: Dict[str, optax.GradientTransformation] = {}
    schedules: Dict[str, Schedule] = {}
    frozen = ()
    for group, mult in group_mults.items():
        if group == "encoder" and freeze_encoder:
            transforms[group] = optax.set_to_zero()
            # keep the group in the LR log at 0.0 — the reference logs one
            # LR per param group by name even when a group is frozen
            # (train.py:735-741); dropping it would silently change the
            # logged group set under --freeze-encoder
            schedules[group] = lr_schedule("constant", 0.0, total_steps)
            frozen = ("encoder",)
            continue
        sched = lr_schedule(scheduler, lr * mult, total_steps)
        schedules[group] = sched
        transforms[group] = _base_optimizer(optimizer, sched, weight_decay, b1)

    tx = optax.multi_transform(transforms, labels)
    if grad_clip:
        if grad_clip < 0:
            raise ValueError(f"grad_clip must be positive, got {grad_clip}")
        pre = []
        if frozen:
            # multi_transform discards frozen groups' gradients AFTER the
            # clip would run — zero them first so they don't count toward
            # the global norm (see docstring)
            def frozen_mask(p):
                return jax.tree_util.tree_map_with_path(lambda path, v: label_fn(path, v) in frozen, p)

            pre.append(optax.masked(optax.set_to_zero(), frozen_mask))
        pre.append(optax.clip_by_global_norm(grad_clip))
        tx = optax.chain(*pre, tx)
    return OptimizerBundle(tx=tx, lr_schedules=schedules, frozen_groups=frozen)
