"""Nucleus-sampling (top-p) and code-augmentation sweep for the stage-2 priors.

The round-4 generation dossier left one measured-open gap: at the fine
(16x16) code grid the prior over-fragments in CODE space — samples carry
~5-column note durations against the corpus's 15.5 — and the two obvious
levers were built but never measured:

- **top-p (nucleus) sampling** (`models/prior.py:nucleus_mask`): truncate
  only the unreliable low-probability tail at each ancestral step.
  Temperature cooling was measured harmful (it rescales the WHOLE
  distribution toward the mode — `temperature_sweep_vq16.json`); the
  fragmentation hypothesis says single junk draws break note runs, which
  is exactly the failure mode tail truncation targets (Holtzman 2020).
- **--augment-passes** (`cli/train_prior.py`): multiply the ~800-grid code
  corpus through the frozen encoder under train-time transforms, against
  the data-limited-prior hypothesis.

This harness measures both on one loaded checkpoint: priors are trained
once per (arch, augment) cache tag through the framework trainer, then
each (arch, augment, top_p) point re-samples ``--samples`` rolls and
scores the decoded note statistics as JS divergence against the held-out
partition — same statistics, binarization and anchors as
``generation_eval.py`` (the heldout/train/EMA rows calibrate the scale).

Usage::

    python benchmarks/sampling_sweep.py --vq-checkpoint CKPT \
        [--top-p-grid 1.0 0.95 0.9 0.8] [--augment-grid 0 3] \
        [--thresholds 0.1 0.2] [--json-out benchmarks/sampling_sweep_vq16.json]

Reference: no equivalent (the reference's inference surface is
``models.py:250-263`` `sample`/`generate`, uncalled and unevaluated).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))

from generation_eval import (  # noqa: E402
    EXPORT_THRESHOLD,
    decode_codes,
    fetch_real_rolls,
    sample_path,
)
from midi_vae_tpu.midi.stats import js_profile, roll_statistics  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vq-checkpoint", required=True)
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--prior-epochs", type=int, default=40)
    ap.add_argument("--prior-features", type=int, default=128)
    ap.add_argument("--prior-layers", type=int, default=6)
    ap.add_argument("--archs", nargs="+", default=["pixelcnn", "transformer"],
                    choices=("pixelcnn", "transformer"))
    ap.add_argument("--top-p-grid", nargs="+", type=float,
                    default=[1.0, 0.97, 0.95, 0.9, 0.85, 0.8])
    ap.add_argument("--augment-grid", nargs="+", type=int, default=[0],
                    help="--augment-passes values; each nonzero value trains its own "
                         "cache-tagged prior")
    ap.add_argument("--thresholds", nargs="+", type=float, default=[EXPORT_THRESHOLD],
                    help="binarization thresholds to score at (the shipped export "
                         "threshold, plus e.g. the checkpoint's calibrated one)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--json-out", default=os.path.join(HERE, "sampling_sweep_vq16.json"))
    args = ap.parse_args()

    from midi_vae_tpu.cli.generate import _load_model_and_state
    from midi_vae_tpu.cli.train_prior import cli as prior_cli, load_prior

    model, params, batch_stats, cfg, image_size, channels, dataset = _load_model_and_state(
        args.vq_checkpoint
    )
    assert getattr(model, "latent_kind", "gaussian") == "vq", "needs a VQ checkpoint"
    workdir = args.workdir or os.path.dirname(os.path.abspath(args.vq_checkpoint))

    # -- priors: one per (arch, augment), through the framework trainer ----
    priors = {}  # (arch, augment) -> path
    for aug in args.augment_grid:
        for arch in args.archs:
            tag = (f"_f{args.prior_features}l{args.prior_layers}k5e{args.prior_epochs}"
                   + (f"a{aug}" if aug else ""))
            path = os.path.join(workdir, f"prior_{arch}{tag}.msgpack")
            priors[(arch, aug)] = path
            if not os.path.isfile(path):
                print(f"=== training {arch} prior (augment={aug}) ===", flush=True)
            prior_cli([
                "--checkpoint", args.vq_checkpoint, "--out", path,
                "--prior-arch", arch, "--epochs", str(args.prior_epochs),
                "--features", str(args.prior_features), "--layers", str(args.prior_layers),
                "--augment-passes", str(aug), "--seed", str(args.seed),
            ])

    # -- anchors ------------------------------------------------------------
    n = args.samples
    heldout = fetch_real_rolls(dataset, cfg, image_size, "test", n)
    ref_stats = roll_statistics(heldout)
    train_rolls = fetch_real_rolls(dataset, cfg, image_size, "train", n)

    rows = []

    def score(name: str, probs_or_binary, threshold=None, extra=None):
        if threshold is None:
            binary = probs_or_binary  # already binary (real rolls)
        else:
            binary = (probs_or_binary > threshold).astype(np.uint8)
        st = roll_statistics(binary)
        row = {
            "source": name,
            **({"threshold": threshold} if threshold is not None else {}),
            **js_profile(st, ref_stats),
            "mean_density": round(st["mean_density"], 5),
            "mean_duration": round(st["mean_duration"], 2),
            "notes_per_roll": round(st["notes_per_roll"], 1),
            **(extra or {}),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        return row

    score("heldout (self)", heldout)
    score("train (noise floor)", train_rolls)
    ema = sample_path("ema", model, params, batch_stats, n, args.seed)
    for t in args.thresholds:
        score("ema-marginal", ema, threshold=t)

    # -- the sweep ------------------------------------------------------------
    for (arch, aug), path in priors.items():
        _, _, pcfg = load_prior(path)
        nll = (round(float(pcfg["test_nll"]), 4)
               if pcfg.get("test_nll") is not None else None)
        for top_p in args.top_p_grid:
            tp = None if top_p >= 1.0 else top_p
            probs = sample_path(arch, model, params, batch_stats, n, args.seed,
                                prior_path=path, top_p=tp)
            for t in args.thresholds:
                score(f"prior:{arch}", probs, threshold=t,
                      extra={"top_p": top_p, "augment_passes": aug, "test_nll": nll})

    out = {
        "vq_checkpoint": os.path.abspath(args.vq_checkpoint),
        "dataset": dataset,
        "samples": n,
        "prior_epochs": args.prior_epochs,
        "prior_capacity": {"features": args.prior_features, "layers": args.prior_layers},
        "temperature": 1.0,
        "top_p_grid": args.top_p_grid,
        "augment_grid": args.augment_grid,
        "thresholds": args.thresholds,
        "rows": rows,
    }
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
