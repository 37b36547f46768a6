"""Explicit shard_map train step — the hand-written SPMD data-parallel path.

The default trainer path (``train/state.py:make_train_step``) relies on
jit auto-partitioning: the batch is sharded, XLA infers the gradient
``psum``. This module is the explicit alternative the reference's
vestigial DDP intended (SURVEY C12, ``utils.py:209-299``): each shard
runs the local forward/backward on its slice of the batch, then the
collectives in :mod:`midi_vae_tpu.parallel.collectives` combine
gradients and metrics over the ``data`` axis by hand. Use it when you
want the communication schedule pinned rather than inferred (e.g. to
overlap or re-order collectives), or as an executable spec of what the
auto path must compute.

Semantic differences from the auto path, both deliberate:

- **BatchNorm is per-shard** (statistics over the local batch, like
  per-GPU BN under torch DDP — the reference's single-device BN maps to
  this under data parallelism; SURVEY §7 asks for the choice to be
  documented). The auto path computes global-batch BN. Returned running
  ``batch_stats`` are psum-averaged so the replicated state stays
  consistent. Models without BN (e.g. ``MLPVAE``) produce bitwise-equal
  gradients on both paths — proven in ``tests/test_spmd.py``.
- **Free-bits floors apply per shard** (the floor compares against the
  local-batch per-dim KL mean, like per-shard BN above; the auto path
  floors the global-batch mean).

With ``--norm group`` the BN difference disappears entirely — GroupNorm
normalizes within-sample, so the explicit step is gradient-EXACT vs the
auto path for conv architectures too (equivalence-tested in
tests/test_spmd.py::test_spmd_conv_groupnorm_matches_auto_path); that
makes ``--norm group --step-impl shard_map`` the fully hand-verifiable
multi-host configuration.

Every objective the auto path offers runs here too, through the shared
selector (``train/state.py:make_loss``): the fused Pallas ELBO operates
on each shard's local batch (its mean psums to the global mean), and
β-TC-VAE all-gathers the tiny per-shard latent triple so the total-
correlation estimator spans the GLOBAL batch — gradient-equivalent to
the auto path via the gather's transpose (losses/tcvae.py
``gather_axes``; equivalence-tested in tests/test_spmd.py).
- **Reparameterization noise is decorrelated per shard** by folding
  ``lax.axis_index("data")`` into the step key *inside* the program —
  the SPMD-safe home for per-shard randomness that round 1's host-side
  ``process_key`` fold got wrong (every process passes the identical
  replicated key; divergence happens on-device, where it is sharded
  state, not a replicated argument).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from midi_vae_tpu.models.vae import label_kwarg
from midi_vae_tpu.core.types import LossOutput
from midi_vae_tpu.parallel.collectives import psum_mean
from midi_vae_tpu.parallel.mesh import DATA_AXIS, SLICE_AXIS
from midi_vae_tpu.train.state import TrainState, accumulate_grads


def make_spmd_train_step(
    model,
    tx: optax.GradientTransformation,
    kl_schedule: Callable,
    mesh: Mesh,
    *,
    log_var_clamp: Optional[Tuple[float, float]] = None,
    free_bits: Optional[float] = None,
    pos_weight: Optional[float] = None,
    target_denorm: Optional[Tuple[Tuple[float, ...], Tuple[float, ...]]] = None,
    donate: bool = True,
    grad_accum: int = 1,
    ema_decay: Optional[float] = None,
    fused_loss: bool = False,
    loss_type: str = "elbo",
    tc_beta: float = 6.0,
    dataset_size: int = 1,
) -> Callable:
    """Build the explicit-SPMD train step: (state, x, key) → (state, LossOutput, grad_norm).

    ``mesh`` must be data-parallel: 1-D over the ``data`` axis, or the
    hierarchical 2-D ``(slice, data)`` multi-slice mesh
    (``parallel/mesh.py:make_mesh_multislice`` — psums then reduce over
    both axes, which XLA lowers as ICI-within-slice + DCN-across). Tensor
    parallelism composes through the auto path's sharding rules instead
    (``parallel/sharding_rules.py``).

    ``grad_accum=N`` splits each shard's LOCAL batch slice into N
    sequential microbatches inside the program (``lax.scan``, mirroring
    the auto path at train/state.py) — local gradients accumulate across
    micros, then ONE psum all-reduce and ONE optimizer update per batch.
    The microbatch grouping differs from the auto path (per-shard slices
    vs contiguous global slices), but the batch-averaged gradient is
    identical for per-sample losses (equivalence-tested for the no-BN
    model); BatchNorm statistics are per-shard AND per-micro here.
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    axes = tuple(mesh.axis_names)
    if any(a not in (SLICE_AXIS, DATA_AXIS) for a in axes) or DATA_AXIS not in axes:
        raise ValueError(
            f"explicit SPMD step needs a 1-D ('{DATA_AXIS}',) or 2-D "
            f"('{SLICE_AXIS}', '{DATA_AXIS}') mesh, got axes {mesh.axis_names}"
        )
    # One loss selector shared with the auto path (train/state.py:make_loss),
    # so every objective variant — fused Pallas BCE, β-TC-VAE, free-bits,
    # pos-weight, raw targets — behaves identically on both step
    # implementations. β-TC gets the mesh axes: its total-correlation
    # estimator all-gathers the per-shard latents so the pairwise density
    # matrix spans the GLOBAL batch (see losses/tcvae.py gather_axes).
    from midi_vae_tpu.train.state import make_loss

    _loss = make_loss(
        loss_type=loss_type,
        fused_loss=fused_loss,
        log_var_clamp=log_var_clamp,
        free_bits=free_bits,
        pos_weight=pos_weight,
        target_denorm=target_denorm,
        tc_beta=tc_beta,
        dataset_size=dataset_size,
        tc_gather_axes=axes if loss_type == "beta-tc" else None,
    )

    conditional = getattr(model, "num_classes", 0) > 0

    def local_step(state: TrainState, x: jax.Array, y, epoch_key: jax.Array):
        key = jax.random.fold_in(epoch_key, state.step)
        # Per-shard decorrelation INSIDE the program (see module docstring);
        # on a multi-slice mesh every (slice, data) coordinate gets its own key.
        for ax in axes:
            key = jax.random.fold_in(key, jax.lax.axis_index(ax))

        def loss_fn(params, batch_stats, xm, ym, k):
            # labels forward only to conditional models (see train/state.py)
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
            (_, (lo, batch_stats)), grads = grad_fn(state.params, state.batch_stats, x, y, key)
        else:
            # x/y here are the LOCAL shard slices (shard_map body)
            batch_stats, grads, lo = accumulate_grads(
                grad_fn, state.params, state.batch_stats, x, y, key, grad_accum,
                batch_desc="per-shard batch size",
            )

        # The hand-written collectives: gradient all-reduce (the reference's
        # missing DDP sync) and metric reduction. Equal shard sizes make the
        # mean-of-means the global mean. ``axes`` is ('data',) or
        # ('slice', 'data') — lax.psum over the tuple reduces over both.
        grads = psum_mean(grads, axes)
        lo = LossOutput(
            loss=psum_mean(lo.loss, axes),
            reconstruction_loss=psum_mean(lo.reconstruction_loss, axes),
            kld_loss=psum_mean(lo.kld_loss, axes),
            kl=psum_mean(lo.kl, axes),
            kld_weight=lo.kld_weight,  # schedule of a replicated step — already equal
        )
        batch_stats = psum_mean(batch_stats, axes)  # average per-shard BN running stats

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        from midi_vae_tpu.train.state import ema_update

        new_state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=state.step + 1,
            ema_params=ema_update(state.ema_params, params, ema_decay)
            if ema_decay is not None
            else state.ema_params,
        )
        return new_state, lo, grad_norm

    state_spec = P()  # replicated pytree (applied leaf-wise by shard_map)
    if conditional:
        # labels shard over the batch axes alongside the images
        body, in_specs = local_step, (state_spec, P(axes), P(axes), P())
    else:
        def body(state, x, epoch_key):
            return local_step(state, x, None, epoch_key)

        in_specs = (state_spec, P(axes), P())
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(state_spec, P(), P()),
        check_vma=False,  # axis_index-derived keys are intentionally unreplicated
    )
    step = jax.jit(sharded, donate_argnums=(0,) if donate else ())
    step.conditional = conditional
    return step
