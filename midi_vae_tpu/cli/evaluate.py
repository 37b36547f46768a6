"""Standalone evaluation CLI: the full metric sweep from a trained checkpoint.

The reference can only evaluate inside a training run (the final
test/val/train sweeps at ``train.py:503-551``); this CLI makes the same
suite usable post-hoc on any checkpoint and any partition — including
the reference's "train set under eval conditions" pass — without
touching optimizer state.

Usage::

    python -m midi_vae_tpu.cli.evaluate --checkpoint CKPT                     # test partition
    python -m midi_vae_tpu.cli.evaluate --checkpoint CKPT --partition all
    python -m midi_vae_tpu.cli.evaluate --checkpoint CKPT --latents-out z.npz
    python -m midi_vae_tpu.cli.evaluate --checkpoint CKPT --json results.json

Metrics are the reference contract (count / cross-entropy / mse / mae,
``evaluation.py:95-101``) plus the latent-health extensions (KL,
active-units). EMA-trained checkpoints evaluate with the averaged
weights unless ``--no-ema``.
"""

from __future__ import annotations

import argparse
import json
from dataclasses import dataclass
from typing import Any


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Evaluate a trained VAE checkpoint")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Checkpoint to load: a .msgpack file or an Orbax directory (auto-detected)")
    parser.add_argument("--partition", choices=("test", "val", "train", "all"), default="test",
                        help="Dataset partition(s) to sweep; 'train' uses eval-condition transforms"
                             " (the reference's final train-set pass). Default: %(default)s")
    parser.add_argument("--dataset", type=str, default=None,
                        help="Dataset to evaluate on (default: from checkpoint config)")
    parser.add_argument("--data-dir", type=str, default=None)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no-ema", action="store_true",
                        help="Use raw (non-averaged) parameters even when the checkpoint carries EMA weights")
    parser.add_argument("--iwae-samples", type=int, default=None, metavar="K",
                        help="Also report the K-sample importance-weighted log-likelihood bound "
                             "(IWAE, nats/sample; tightens toward log p(x) as K grows). Computed "
                             "against de-normalized [0,1] pixels so the Bernoulli likelihood is "
                             "well-defined regardless of the checkpoint's --bce-targets mode.")
    parser.add_argument("--mig", action="store_true",
                        help="Also report the Mutual Information Gap (Chen et al. 2018) of the "
                             "posterior means against the dataset's class labels — the "
                             "disentanglement number the --loss beta-tc objective targets. "
                             "NaN when the partition has a single class (zero label entropy).")
    parser.add_argument("--mig-bins", type=int, default=20, metavar="B",
                        help="Histogram bins per latent dimension for the MIG MI estimator "
                             "(default: %(default)s)")
    parser.add_argument("--latents-out", type=str, default=None,
                        help="Also collect per-sample posterior latents and write them to this .npz")
    parser.add_argument("--codes-out", type=str, default=None,
                        help="VQ checkpoints: write each partition's [N, s, s] int32 codebook-index "
                             "grids (+ labels when present) to this .npz — the tokenized corpus for "
                             "downstream symbolic-music models (the prior CLI consumes the same "
                             "encoding internally)")
    parser.add_argument("--json", dest="json_out", type=str, default=None,
                        help="Write the results dict as JSON to this path")
    parser.add_argument("--cpu", action="store_true", help="Force the CPU backend")
    return parser


@dataclass
class _EvalState:
    params: Any
    batch_stats: Any


def _stored_split_rate(raw: Any):
    """Checkpoint-stored protoval split rate → fetch_dataset argument.

    ``--protoval-split-rate auto`` is kept as the string "auto" in the
    config (cli/train.py _parse_split_rate) and fetch_dataset handles it
    natively; only absent/None falls back to the 0.1 default.
    """
    if raw is None:
        return 0.1
    return raw if raw == "auto" else float(raw)


def cli(argv=None) -> None:
    args = get_parser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from midi_vae_tpu.cli.generate import _load_model_and_state
    from midi_vae_tpu.data.fetch import fetch_dataset
    from midi_vae_tpu.data.pipeline import make_loader
    from midi_vae_tpu.data.transforms import VALID_TRANSFORMS, get_transform
    from midi_vae_tpu.evaluation.evaluate import evaluate

    model, params, batch_stats, cfg, image_size, channels, ckpt_dataset = _load_model_and_state(
        args.checkpoint, use_ema=not args.no_ema
    )
    state = _EvalState(params=params, batch_stats=batch_stats)

    dataset = args.dataset or ckpt_dataset
    data_dir = args.data_dir or cfg.get("data_dir")
    targs = {"normalization": dataset} if dataset in VALID_TRANSFORMS else {}
    # every partition under eval-condition transforms, incl. train —
    # exactly the reference's final train-set sweep (train.py:536-548)
    _, transform_eval = get_transform(cfg.get("transform_type", "digits"), image_size, targs)
    train, val, test, distinct = fetch_dataset(
        dataset,
        root=data_dir,
        prototyping=bool(cfg.get("prototyping", False)),
        transform_train=transform_eval,
        transform_eval=transform_eval,
        # reproduce the checkpoint's exact train/val split: id AND rate
        # (a different rate would leak training samples into --partition val)
        protoval_split_id=int(cfg.get("protoval_split_id") or 0),
        # "auto" is a supported rate (sized like the test set) and is stored
        # in the config as the string — pass it through, don't float() it
        protoval_split_rate=_stored_split_rate(cfg.get("protoval_split_rate")),
    )

    wanted = ("test", "val", "train") if args.partition == "all" else (args.partition,)
    partitions = []
    for name in wanted:
        if name == "val" and not distinct and "test" in wanted:
            print("val partition is the test set for this dataset (not distinct); skipping duplicate sweep")
            continue
        partitions.append((name, {"test": test, "val": val, "train": train}[name]))

    # one compiled eval step shared across partitions — built once with the
    # checkpoint's loss-target semantics (a --bce-targets raw run reports
    # its objective-space BCE too) and, when asked, the latent collector
    from midi_vae_tpu.evaluation.evaluate import make_eval_step

    target_denorm = (
        (tuple(transform_eval.mean), tuple(transform_eval.std))
        if cfg.get("bce_targets") == "raw"
        else None
    )
    shared_step = make_eval_step(
        model, collect_latents=bool(args.latents_out), target_denorm=target_denorm,
        occupancy_denorm=(tuple(transform_eval.mean), tuple(transform_eval.std)),
    )

    if args.codes_out and getattr(model, "latent_kind", "gaussian") != "vq":
        raise SystemExit(
            "--codes-out exports discrete codebook-index grids; this checkpoint is a "
            f"{type(model).__name__} (Gaussian latent — use --latents-out instead)"
        )

    results = {}
    collected = {}
    codes = {}
    for name, ds in partitions:
        loader = make_loader(ds, min(args.batch_size, len(ds)), train=False)
        out = evaluate(
            loader,
            model,
            state,
            partition_name=name.capitalize(),
            seed=args.seed,
            collect_latents=bool(args.latents_out),
            eval_step=shared_step,
        )
        if args.latents_out:
            collected[name] = out.pop("latents")
        if args.codes_out:
            from midi_vae_tpu.cli.train_prior import encode_corpus

            grids, labels = encode_corpus(
                model, state.params, state.batch_stats, loader, with_labels=True
            )
            codes[f"codes_{name}"] = grids
            if labels is not None:
                codes[f"labels_{name}"] = labels
        if args.mig:
            from midi_vae_tpu.evaluation.disentanglement import mig_from_loader

            import math as _math

            mig = mig_from_loader(loader, model, state, bins=args.mig_bins)
            out["mig"] = mig["mig"]
            top = ", ".join(
                f"factor{k}→z{int(d)}" for k, d in enumerate(mig["top_dims"])
            )
            if _math.isnan(mig["mig"]):
                print("  mig ................... nan (single-class partition: zero label entropy)")
            else:
                print(f"  {'mig ':.<24s} {mig['mig']:9.5f}  ({top})")
        if args.iwae_samples:
            from midi_vae_tpu.evaluation.iwae import iwae_bound

            # the likelihood needs [0,1] targets, so de-normalize with the
            # eval transform's table whatever the checkpoint's loss mode was
            bound = iwae_bound(
                loader, model, state,
                k=args.iwae_samples, seed=args.seed,
                target_denorm=(tuple(transform_eval.mean), tuple(transform_eval.std)),
            )
            out[f"iwae-{args.iwae_samples}"] = bound
            print(f"  {f'iwae-{args.iwae_samples} ':.<24s} {bound:9.5f} nat/sample")
        results[name] = out

    if args.latents_out:
        import numpy as np

        np.savez(args.latents_out, **{f"latents_{k}": v for k, v in collected.items()})
        print(f"wrote latents for {list(collected)} to {args.latents_out}")
    if args.codes_out:
        import numpy as np

        np.savez(args.codes_out, **codes)
        shapes = {k: v.shape for k, v in codes.items()}
        print(f"wrote code grids to {args.codes_out}: {shapes}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    cli()
