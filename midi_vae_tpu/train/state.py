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

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

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
    """

    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: jax.Array  # int32 total optimizer steps taken


def create_train_state(model, tx: optax.GradientTransformation, init_key: jax.Array, sample_batch: jax.Array):
    """Initialize parameters (Xavier-uniform, models.py:227-236) and optimizer state."""
    variables = model.init({"params": init_key, "reparam": jax.random.fold_in(init_key, 1)}, sample_batch, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.int32(0),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    kl_schedule: Callable,
    *,
    log_var_clamp: Optional[Tuple[float, float]] = None,
    donate: bool = True,
    fused_loss: bool = False,
    loss_type: str = "elbo",
    tc_beta: float = 6.0,
    dataset_size: int = 1,
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
    """
    if loss_type not in ("elbo", "beta-tc"):
        raise ValueError(f"unknown loss_type: {loss_type}")
    if loss_type == "beta-tc" and fused_loss:
        raise ValueError("fused Pallas loss implements the plain ELBO only; drop --fused for beta-tc")

    def step_fn(state: TrainState, x: jax.Array, epoch_key: jax.Array):
        key = jax.random.fold_in(epoch_key, state.step)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                rngs={"reparam": key},
                mutable=["batch_stats"],
            )
            lo = _loss(out, kl_schedule(state.step))
            return lo.loss, (lo, mutated["batch_stats"])

        def _loss(out, w) -> LossOutput:
            if loss_type == "beta-tc":
                from midi_vae_tpu.losses.tcvae import beta_tc_elbo_loss

                return beta_tc_elbo_loss(
                    out,
                    tc_beta=tc_beta,
                    dataset_size=dataset_size,
                    kld_weight=w,
                    log_var_clamp=log_var_clamp,
                )
            if not fused_loss:
                return elbo_loss(out, kld_weight=w, log_var_clamp=log_var_clamp)
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

        (_, (loss_output, batch_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        new_state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, loss_output, grad_norm

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_forward_fn(model) -> Callable:
    """Jitted eval-mode forward pass: (params, batch_stats, x, key) → ModelOutput."""

    @jax.jit
    def forward(params, batch_stats, x, key):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=False,
            rngs={"reparam": key},
        )

    return forward


def loss_output_to_host(lo: LossOutput, grad_norm=None) -> dict:
    """Materialize step metrics on host (one sync, at logging time only)."""
    out = {
        "loss": float(lo.loss),
        "loss_recon": float(lo.reconstruction_loss),
        "loss_kld": float(lo.kld_loss),
        "kl": float(lo.kl),
        "kld_weight": float(lo.kld_weight),
    }
    if grad_norm is not None:
        out["grad_norm"] = float(grad_norm)
    return out
