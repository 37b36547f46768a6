"""Train state and the jitted train step — the hot loop, TPU-first.

The reference's per-batch Python loop (train.py:620-762) performs
forward / zero_grad / loss / backward / optimizer step / scheduler step
as separate framework calls with per-batch ``.item()`` host syncs
(train.py:672-675 — a hazard SURVEY §3.2 flags). Here the whole step is
ONE jitted XLA program: forward + ELBO + backward + optax update +
counter increment, with the loss components returned as device scalars
the logger reads asynchronously. State buffers are donated, so
parameters and optimizer state update in place in HBM.

Under a data mesh, ``jit`` auto-partitioning turns the batch-sharded
gradient sums into ``psum`` collectives over ICI — the data-parallel
all-reduce the reference never wired up (SURVEY C12).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from midi_vae_tpu.models.vae import label_kwarg
from midi_vae_tpu.core.types import LossOutput
from midi_vae_tpu.losses.elbo import elbo_loss


@struct.dataclass
class TrainState:
    """The complete training state, one pytree.

    Checkpoint payload parity (utils.py:344-347): params+batch_stats
    cover the reference's ``encoder``/``decoder`` state dicts (and the
    head/final layers the reference forgets), ``opt_state`` covers
    optimizer+scheduler (schedules live inside optimizer state via
    ``inject_hyperparams``), ``step`` is ``total_step``.

    ``ema_params`` holds the exponential moving average of ``params``
    when EMA tracking is on (``--ema-decay``; no reference equivalent —
    a capability extension), or ``{}`` when off so pre-EMA checkpoints
    stay structurally compatible.
    """

    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: jax.Array  # int32 total optimizer steps taken
    ema_params: dict = dataclasses.field(default_factory=dict)


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    init_key: jax.Array,
    sample_batch: jax.Array,
    *,
    ema: bool = False,
):
    """Initialize parameters (Xavier-uniform, models.py:227-236) and optimizer state.

    ``ema=True`` seeds the EMA shadow copy of the parameters (used with
    ``make_train_step(..., ema_decay=...)``). Conditional models
    (``num_classes > 0``) initialize with a zero label batch so the
    label-conditioned dense layers get their widened shapes.
    """
    init_kwargs = {}
    if getattr(model, "num_classes", 0) > 0:
        init_kwargs["y"] = jnp.zeros((sample_batch.shape[0],), jnp.int32)
    variables = model.init(
        {"params": init_key, "reparam": jax.random.fold_in(init_key, 1)},
        sample_batch,
        train=True,
        **init_kwargs,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.int32(0),
        # real copies, not aliases: the train step donates the state, and a
        # buffer shared between params and ema_params would be donated twice
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else {},
    )


def reconcile_ema_state_dict(st_dict: dict, state: TrainState) -> dict:
    """Normalize a checkpoint state dict across EMA generations.

    Pre-EMA checkpoints (no ``ema_params`` key) restore cleanly into any
    target; when the target tracks EMA and the checkpoint has none, the
    shadow copy is seeded from the restored params. A checkpoint WITH
    EMA restored into a non-EMA run drops it (flax dict restore follows
    the target's keys).
    """
    st_dict = dict(st_dict)
    if state.ema_params and not st_dict.get("ema_params"):
        import numpy as np

        # host-side copies so params and ema never share buffers (donation)
        st_dict["ema_params"] = jax.tree_util.tree_map(np.copy, st_dict["params"])
    st_dict.setdefault("ema_params", {})
    return st_dict


def ema_update(ema_params: dict, params: dict, decay: float) -> dict:
    """One EMA step: ``ema ← decay·ema + (1−decay)·params``.

    An empty ``ema_params`` (resumed from a pre-EMA checkpoint) is
    seeded from the current parameters.
    """
    if not ema_params:
        return jax.tree_util.tree_map(jnp.copy, params)
    d = jnp.float32(decay)
    return jax.tree_util.tree_map(lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params)


def accumulate_grads(
    grad_fn, params, batch_stats, x, y, key, n: int, *, batch_desc: str = "batch size"
):
    """Microbatched gradient accumulation, shared by the auto and shard_map steps.

    Splits ``x`` (and the labels ``y`` when present — conditional models)
    into ``n`` sequential microbatches under ``lax.scan``: BatchNorm
    ``batch_stats`` chain through the carry, gradients and LossOutput
    metrics sum across micros then rescale by ``1/n`` (the mean over
    equal micros == the full-batch mean for per-sample losses). The
    per-micro RNG key is ``fold_in(key, micro_idx)``.

    ``grad_fn`` is ``value_and_grad`` of a loss with aux
    ``(LossOutput, batch_stats)`` taking ``(params, batch_stats, xm, ym,
    key)``. Returns ``(batch_stats, grads, loss_output)``.
    """
    b = x.shape[0]
    if b % n:
        raise ValueError(f"{batch_desc} {b} not divisible by grad_accum={n}")
    xs = x.reshape(n, b // n, *x.shape[1:])
    # y=None scans as an empty pytree (unconditional models ignore it)
    ys = y.reshape(n, b // n, *y.shape[1:]) if y is not None else None
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    zero_lo = LossOutput(
        loss=jnp.float32(0),
        reconstruction_loss=jnp.float32(0),
        kld_loss=jnp.float32(0),
        kl=jnp.float32(0),
        kld_weight=jnp.float32(0),
    )

    def micro(carry, inp):
        bs, gsum, losum = carry
        xm, ym, idx = inp
        (_, (lo, bs2)), g = grad_fn(params, bs, xm, ym, jax.random.fold_in(key, idx))
        gsum = jax.tree_util.tree_map(jnp.add, gsum, g)
        losum = jax.tree_util.tree_map(jnp.add, losum, lo)
        return (bs2, gsum, losum), None

    (batch_stats, gsum, lo_sum), _ = jax.lax.scan(
        micro, (batch_stats, zero_grads, zero_lo), (xs, ys, jnp.arange(n))
    )
    inv = jnp.float32(1.0 / n)
    grads = jax.tree_util.tree_map(lambda g: g * inv, gsum)
    loss_output = jax.tree_util.tree_map(lambda v: v * inv, lo_sum)
    return batch_stats, grads, loss_output


def make_loss(
    *,
    loss_type: str = "elbo",
    fused_loss: bool = False,
    log_var_clamp: Optional[Tuple[float, float]] = None,
    free_bits: Optional[float] = None,
    pos_weight: Optional[float] = None,
    target_denorm: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None,
    tc_beta: float = 6.0,
    dataset_size: int = 1,
    tc_gather_axes: Optional[Tuple[str, ...]] = None,
) -> Callable:
    """Build the training objective: ``(ModelOutput, kld_weight) → LossOutput``.

    One selector shared by the auto-partitioned step (below) and the
    explicit shard_map step (``parallel/spmd.py``), so the two paths
    cannot drift. Validates option compatibility once, here.

    ``tc_gather_axes`` is the shard_map hook for β-TC-VAE: the total-
    correlation estimator needs the pairwise density matrix over the
    GLOBAL batch (losses/tcvae.py), so inside a shard_map body the
    per-shard latents must be all-gathered over the mesh axes first.
    The auto path leaves it None (jit already sees the global batch).
    """
    if loss_type not in ("elbo", "beta-tc", "vq"):
        raise ValueError(f"unknown loss_type: {loss_type}")
    if loss_type != "elbo" and fused_loss:
        raise ValueError("fused Pallas loss implements the plain ELBO only; drop --fused")
    if free_bits is not None and (fused_loss or loss_type != "elbo"):
        raise ValueError("--free-bits is implemented on the plain (non-fused) ELBO path")
    if loss_type == "vq" and log_var_clamp is not None:
        raise ValueError("--log-var-clamp has no effect on the VQ objective (no posterior variance)")
    if pos_weight is not None and fused_loss:
        raise ValueError("the fused Pallas BCE implements the unweighted reference formula; drop --fused for --bce-pos-weight")
    if target_denorm is not None and fused_loss:
        raise ValueError("the fused Pallas BCE consumes normalized targets; drop --fused for --bce-targets raw")

    def _loss(out, w) -> LossOutput:
        if loss_type == "vq":
            from midi_vae_tpu.losses.vq import vq_loss

            # w (the scheduled "KL weight") is the commitment β here —
            # the schedules apply to the non-reconstruction term of
            # whichever objective is selected
            return vq_loss(
                out, commitment_weight=w, pos_weight=pos_weight, target_denorm=target_denorm
            )
        if loss_type == "beta-tc":
            from midi_vae_tpu.losses.tcvae import beta_tc_elbo_loss

            return beta_tc_elbo_loss(
                out,
                tc_beta=tc_beta,
                dataset_size=dataset_size,
                kld_weight=w,
                log_var_clamp=log_var_clamp,
                pos_weight=pos_weight,
                target_denorm=target_denorm,
                gather_axes=tc_gather_axes,
            )
        if not fused_loss:
            return elbo_loss(
                out,
                kld_weight=w,
                log_var_clamp=log_var_clamp,
                free_bits=free_bits,
                pos_weight=pos_weight,
                target_denorm=target_denorm,
            )
        from midi_vae_tpu.ops.fused_elbo import fused_elbo_terms

        lv = out.encoded.log_var
        if log_var_clamp is not None:
            lv = jnp.clip(lv, log_var_clamp[0], log_var_clamp[1])
        loss, recon, kl = fused_elbo_terms(out.logits, out.input, out.encoded.mu, lv, w)
        return LossOutput(
            loss=loss,
            reconstruction_loss=jax.lax.stop_gradient(recon),
            kld_loss=jax.lax.stop_gradient(-kl),
            kl=jax.lax.stop_gradient(kl),
            kld_weight=jnp.asarray(w, loss.dtype),
        )

    return _loss


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    kl_schedule: Callable,
    *,
    log_var_clamp: Optional[Tuple[float, float]] = None,
    free_bits: Optional[float] = None,
    pos_weight: Optional[float] = None,
    target_denorm: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None,
    donate: bool = True,
    fused_loss: bool = False,
    loss_type: str = "elbo",
    tc_beta: float = 6.0,
    dataset_size: int = 1,
    grad_accum: int = 1,
    ema_decay: Optional[float] = None,
) -> Callable:
    """Build the fused train step: (state, x, key) → (state, LossOutput, grad_norm).

    ``key`` is a per-epoch base key; the step counter is folded in on
    device, so the step stays a single compiled program for the whole
    run (no per-step retraces, resume-reproducible streams).
    ``fused_loss=True`` computes the BCE reduction with the Pallas kernel
    (``ops/fused_elbo.py``) instead of the XLA expression — numerically
    identical, elementwise BCE never materialized in HBM.
    ``loss_type="beta-tc"`` selects the β-TC-VAE objective
    (``losses/tcvae.py``; needs ``dataset_size`` for the minibatch
    estimator; incompatible with ``fused_loss``).
    ``grad_accum=N`` splits each incoming batch into N sequential
    microbatches inside the SAME compiled program (a ``lax.scan``),
    averaging the gradients before the single optimizer update — peak
    activation memory drops ~N× at unchanged optimizer semantics (one
    update per batch; BatchNorm batch statistics become per-microbatch,
    and the running stats see N updates per step). Pairs with
    ``remat=True`` on the model for the largest-batch configurations.
    ``ema_decay`` maintains an exponential moving average of the
    parameters in ``state.ema_params`` (evaluation/serving weights).
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    _loss = make_loss(
        loss_type=loss_type,
        fused_loss=fused_loss,
        log_var_clamp=log_var_clamp,
        free_bits=free_bits,
        pos_weight=pos_weight,
        target_denorm=target_denorm,
        tc_beta=tc_beta,
        dataset_size=dataset_size,
    )

    conditional = getattr(model, "num_classes", 0) > 0

    def step_fn(state: TrainState, x: jax.Array, y, epoch_key: jax.Array):
        key = jax.random.fold_in(epoch_key, state.step)

        def loss_fn(params, batch_stats, xm, ym, k):
            # forward labels only to conditional models — unconditional
            # signatures (incl. duck-typed test models) never see the kwarg
            out, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                xm,
                train=True,
                rngs={"reparam": k},
                mutable=["batch_stats"],
                **label_kwarg(ym if conditional else None),
            )
            lo = _loss(out, kl_schedule(state.step))
            return lo.loss, (lo, mutated["batch_stats"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if grad_accum == 1:
            (_, (loss_output, batch_stats)), grads = grad_fn(state.params, state.batch_stats, x, y, key)
        else:
            batch_stats, grads, loss_output = accumulate_grads(
                grad_fn, state.params, state.batch_stats, x, y, key, grad_accum
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        new_state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=state.step + 1,
            ema_params=ema_update(state.ema_params, params, ema_decay)
            if ema_decay is not None
            else state.ema_params,
        )
        return new_state, loss_output, grad_norm

    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    if conditional:
        step = jitted  # (state, x, y, key) — labels are part of the batch
    else:
        # legacy public signature (state, x, key); y rides as an empty pytree
        def step(state, x, epoch_key):
            return jitted(state, x, None, epoch_key)

    # the raw (unjitted) step so callers can compose it into larger compiled
    # programs — e.g. scan-chunked epochs over a device-resident corpus
    # (data/pipeline.py:DeviceResidentLoader.epoch_scan). Always takes
    # (state, x, y, key); unconditional models ignore y.
    step.raw_step_fn = step_fn
    step.conditional = conditional
    return step


