"""Evaluation sweep (reference: ``evaluation.py:12-113``).

Design differences from the reference, which runs a device→host copy of
stimuli/reconstructions/latents for *every batch* and computes metrics
with sklearn on the concatenated arrays (evaluation.py:73-101):

- one jitted ``eval_step`` reduces each batch to a handful of device
  scalars (masked sums); only those cross to host. No O(dataset)
  transfers, no sklearn.
- padding correctness: the loader zero-pads the final batch with a
  validity mask, and every reduction is mask-weighted — the static-shape
  equivalent of the DistributedSampler pad-trim at evaluation.py:86-93.
- the reference's "cross-entropy" metric calls
  ``F.cross_entropy(recon, stimuli)`` treating the channel dim as
  classes; for 1-channel images softmax over a singleton is identically
  zero, so the metric is degenerate (SURVEY §3.3). We keep the metric
  name for dashboard comparability but report the mean *binary*
  cross-entropy in nats, computed from logits.
- mse/mae reported ×100 as percentages (evaluation.py:99-100). Note the
  reference-parity caveat these inherit: they compare the sigmoid
  reconstruction (range 0..1) against the *normalization-shifted* input
  (−0.5..0.5 under the default table), exactly as the reference does on
  its normalized stimuli — so they reward outputs that hug the shifted
  input range, and cross-variant comparisons should lean on the BCE
  (the objective, computed from logits). The printed value ranges make
  the mismatch visible in every eval report.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from midi_vae_tpu.losses.elbo import bce_from_logits
from midi_vae_tpu.models.vae import label_kwarg


def make_eval_step(
    model, collect_latents: bool = False, target_denorm=None, occupancy_denorm=None
) -> Callable:
    """Build the jitted per-batch metric reducer.

    ``collect_latents=True`` builds the diagnostic variant that also
    returns the per-batch latents (an O(batch x latent) output alive per
    step); the default variant omits it so the routine per-epoch
    validation keeps nothing but the reduction scalars on device.

    ``target_denorm`` (the ``(mean, std)`` pair of a ``--bce-targets
    raw`` run) adds a second reconstruction metric, ``bce-objective``:
    BCE against the de-normalized [0,1] targets — the function the run
    actually trained. The parity ``cross-entropy`` (normalized targets,
    reference semantics) is always reported so cross-variant comparisons
    keep one shared scale; best-model selection uses the objective
    metric when it exists (train/loop.py).

    ``occupancy_denorm`` (the eval transform's ``(mean, std)``, passable
    for ANY loss mode) adds binary-occupancy precision/recall/F1: both
    the de-normalized target and the sigmoid reconstruction are
    thresholded at 0.5 and compared cell-wise. On ~98%-empty piano rolls
    these are the informative reconstruction metrics — mse/mae are
    dominated by the zeros, and a silence-collapsed decoder scores a
    flattering mse while its recall is exactly 0. (Capability extension;
    meaningful for 1-channel rolls, computed harmlessly elsewhere.)
    """

    conditional = getattr(model, "num_classes", 0) > 0

    @jax.jit
    def _eval_core(params, batch_stats, x, y, mask, key):
        # the y kwarg only exists on conditional-capable models, so it is
        # forwarded only when the model actually is one (duck-typed models
        # and unconditional signatures stay untouched)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=False,
            rngs={"reparam": key},
            **label_kwarg(y if conditional else None),
        )
        m = mask.reshape(-1, 1, 1, 1)
        elems_per_sample = float(np.prod(x.shape[1:]))
        n_elem = jnp.sum(mask) * elems_per_sample

        bce = bce_from_logits(out.logits, x) * m
        sq = jnp.square(out.output - x) * m
        ab = jnp.abs(out.output - x) * m

        big = jnp.float32(jnp.inf)
        stim_masked_min = jnp.min(jnp.where(m > 0, x, big))
        stim_masked_max = jnp.max(jnp.where(m > 0, x, -big))
        recon_masked_min = jnp.min(jnp.where(m > 0, out.output, big))
        recon_masked_max = jnp.max(jnp.where(m > 0, out.output, -big))

        # latent-health partials (capability extension — the reference
        # reports no latent diagnostics): per-dim KL and posterior-mean
        # moments for the active-units measure (Burda et al. 2016).
        mu, lv = out.encoded.mu, out.encoded.log_var
        mv = mask.reshape(-1, 1)
        kl_dim = -0.5 * (1.0 + lv - jnp.square(mu) - jnp.exp(lv)) * mv

        res = {
            "bce_sum": jnp.sum(bce),
            "mse_sum": jnp.sum(sq),
        }
        if target_denorm is not None:
            from midi_vae_tpu.losses.elbo import denormalized_targets

            bce_raw = bce_from_logits(out.logits, denormalized_targets(x, target_denorm)) * m
            res["bce_raw_sum"] = jnp.sum(bce_raw)
        if occupancy_denorm is not None:
            from midi_vae_tpu.losses.elbo import denormalized_targets

            t = denormalized_targets(x, occupancy_denorm) > 0.5
            p = out.output > 0.5
            res["occ_tp"] = jnp.sum(p & t & (m > 0))
            res["occ_fp"] = jnp.sum(p & ~t & (m > 0))
            res["occ_fn"] = jnp.sum(~p & t & (m > 0))
        res |= {
            "mae_sum": jnp.sum(ab),
            "n_elem": n_elem,
            "n_samples": jnp.sum(mask),
            "stim_min": stim_masked_min,
            "stim_max": stim_masked_max,
            "recon_min": recon_masked_min,
            "recon_max": recon_masked_max,
            "kl_dim_sum": jnp.sum(kl_dim, axis=0),
            "mu_sum": jnp.sum(mu * mv, axis=0),
            "mu_sq_sum": jnp.sum(jnp.square(mu) * mv, axis=0),
        }
        if collect_latents:
            res["latents"] = out.latents
        return res

    if conditional:
        # conditional models evaluate with the batch labels (q(z|x,y))
        def eval_step(params, batch_stats, x, y, mask, key):
            return _eval_core(params, batch_stats, x, y, mask, key)
    else:
        # legacy signature — unconditional models need no labels
        def eval_step(params, batch_stats, x, mask, key):
            return _eval_core(params, batch_stats, x, None, mask, key)

    # markers so evaluate() can tell what a passed-in step provides
    eval_step.collect_latents = collect_latents
    eval_step.target_denorm = target_denorm
    eval_step.occupancy_denorm = occupancy_denorm
    eval_step.conditional = conditional
    return eval_step


def evaluate(
    loader,
    model,
    state,
    *,
    partition_name: str = "Val",
    seed: int = 0,
    verbosity: int = 1,
    collect_latents: bool = False,
    eval_step: Optional[Callable] = None,
) -> Dict[str, float]:
    """Full-dataset metric sweep (reference contract: evaluation.py:12).

    Returns ``{count, cross-entropy, mse, mae}`` (+ value ranges), the
    metric names/scalings of evaluation.py:95-101.

    Partials are accumulated as device arrays across the whole stream —
    the eval pipeline stays fully async (prefetch overlapped with
    compute) and the host syncs ONCE, at the end, materializing ~15
    values. (The reference syncs every batch, evaluation.py:73-76; so
    did round 1 via per-batch ``float()``.) ``collect_latents=True``
    switches to the diagnostic step variant and copies latents per batch
    by necessity; the passed ``eval_step`` is ignored in that mode
    unless it was built with ``collect_latents=True``.
    """
    if collect_latents and not (eval_step is not None and getattr(eval_step, "collect_latents", False)):
        # rebuild only when the caller didn't hand us a latent-collecting
        # step already (keep its target_denorm setting if it carried one)
        step_fn = make_eval_step(
            model, collect_latents=True,
            target_denorm=getattr(eval_step, "target_denorm", None),
            occupancy_denorm=getattr(eval_step, "occupancy_denorm", None),
        )
    else:
        step_fn = eval_step if eval_step is not None else make_eval_step(model)
    base_key = jax.random.PRNGKey(seed)

    _SUM = (
        "bce_sum", "bce_raw_sum", "mse_sum", "mae_sum", "n_elem", "n_samples",
        "kl_dim_sum", "mu_sum", "mu_sq_sum", "occ_tp", "occ_fp", "occ_fn",
    )
    _MIN = ("stim_min", "recon_min")
    _MAX = ("stim_max", "recon_max")

    acc = None
    latents = []
    cond = getattr(step_fn, "conditional", False)
    for i, batch in enumerate(loader.epoch(1)):
        step_key = jax.random.fold_in(base_key, i)  # `k` is the metric-name
        if cond:                                    # loop variable below
            res = step_fn(state.params, state.batch_stats, batch.x, batch.y, batch.mask, step_key)
        else:
            res = step_fn(state.params, state.batch_stats, batch.x, batch.mask, step_key)
        if collect_latents:
            valid = np.asarray(batch.mask) > 0
            latents.append(np.asarray(res.pop("latents"))[valid])
        if acc is None:
            acc = dict(res)
        else:
            # device-side merge: dispatched async, nothing crosses to host
            for k in _SUM:
                if k in res:
                    acc[k] = acc[k] + res[k]
            for k in _MIN:
                acc[k] = jnp.minimum(acc[k], res[k])
            for k in _MAX:
                acc[k] = jnp.maximum(acc[k], res[k])
    if acc is None:
        raise ValueError("empty evaluation stream")

    totals = jax.device_get(acc)  # the single host sync of the sweep

    if verbosity >= 1:
        print(f"input has range  [{totals['stim_min']:.03f}, {totals['stim_max']:.03f}]")
        print(f"output has range [{totals['recon_min']:.03f}, {totals['recon_max']:.03f}]")

    n_elem = max(float(totals["n_elem"]), 1.0)
    n = max(float(totals["n_samples"]), 1.0)
    # active units: dims whose posterior mean varies across the dataset
    # (Var_x(E[z|x]) > 0.01, Burda et al. 2016) — collapsed dims don't count
    mu_var = np.asarray(totals["mu_sq_sum"], np.float64) / n - np.square(
        np.asarray(totals["mu_sum"], np.float64) / n
    )
    results: Dict[str, float] = {
        "count": int(totals["n_samples"]),
        "cross-entropy": float(totals["bce_sum"]) / n_elem,
        "mse": 100.0 * float(totals["mse_sum"]) / n_elem,  # percentages, evaluation.py:98-100
        "mae": 100.0 * float(totals["mae_sum"]) / n_elem,
        "kl": float(np.sum(totals["kl_dim_sum"]) / n),
        "active-units": int(np.sum(mu_var > 0.01)),
    }
    if "bce_raw_sum" in totals:
        # the trained objective of a --bce-targets raw run (see make_eval_step)
        results["bce-objective"] = float(totals["bce_raw_sum"]) / n_elem
    if "occ_tp" in totals:
        # binary-occupancy metrics at threshold 0.5 (see make_eval_step):
        # empty denominators (a corpus slice with no set cells, or a
        # decoder predicting none) report 0, not NaN
        tp, fp, fn = (float(totals[k]) for k in ("occ_tp", "occ_fp", "occ_fn"))
        precision = tp / (tp + fp) if tp + fp else 0.0
        recall = tp / (tp + fn) if tp + fn else 0.0
        results["precision"] = 100.0 * precision
        results["recall"] = 100.0 * recall
        results["f1"] = (
            100.0 * 2.0 * precision * recall / (precision + recall) if precision + recall else 0.0
        )
    if collect_latents:
        results["latents"] = np.concatenate(latents) if latents else np.zeros((0,))

    if verbosity >= 1:
        print(f"\n{partition_name} evaluation results:")
        for k, v in results.items():
            if k == "latents":
                continue
            if "count" in k or "units" in k:
                print(f"  {k + ' ':.<21s}{v:7d}")
            elif "entropy" in k or k in ("kl", "bce-objective"):
                print(f"  {k + ' ':.<24s} {v:9.5f} nat")
            else:
                print(f"  {k + ' ':.<24s} {v:6.2f} %")

    return results
