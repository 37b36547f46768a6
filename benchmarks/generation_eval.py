"""End-to-end generation evaluation for the two-stage VQ pipeline.

Round-4 dossier (VERDICT item: "two-stage generation quality is asserted
by NLL only"): decode actual samples from each generative path and
compare CORPUS-LEVEL musical statistics against the held-out partition —
the statistics a musician would notice, not just the bound a density
model reports.

Paths compared (all over the same frozen VQ-VAE checkpoint):

- ``ema``         — i.i.d. EMA-marginal code draws (``VQVAE.sample_codes``),
                    the honest-but-weak baseline sampler;
- ``pixelcnn``    — ancestral draws from the masked-conv code prior;
- ``transformer`` — ancestral draws from the decoder-only code prior;
- ``train``       — REAL rolls from the train partition: the noise floor
                    (how far two real samples of the corpus sit apart).

Statistics (binary rolls; decoded probabilities are binarized at the
SHIPPED MIDI-export threshold — ``midi/derasterize.py:roll_to_notes``
uses 0.1, so these statistics describe exactly the note events a user
exports and hears; ``--bernoulli`` switches to per-cell sampling, which
treats the decoder output as independent Bernoulli parameters instead):

- **note density** per roll (fraction of active cells), 24-bin histogram;
- **pitch-class usage** (active cells per ``row % 12``), 12 bins;
- **polyphony** (active pitches per time column), 17 bins (0-16+);
- **note duration** (run lengths along time), 16 log-spaced bins.

Each histogram is scored as Jensen-Shannon divergence (base-2, in
[0, 1]) against the held-out test partition; lower = closer to the real
corpus. The ``train`` row anchors what "as close as real data" means.

Class-conditional steering: with ``--conditional``, a conditional
PixelCNN prior p(codes | density-bucket) is trained over the SAME
unconditional VQ-VAE and sampled per class — the mean decoded density
must rise monotonically with the requested bucket, mirroring the CVAE
steering table (RESULTS.md round 3).

Usage::

    python benchmarks/generation_eval.py --vq-checkpoint CKPT \
        [--samples 512] [--prior-epochs 30] [--conditional]

Priors are trained through the framework-grade trainer
(``cli/train_prior.py``) and cached in the workdir, so re-runs only
re-sample. Writes ``generation_eval.json`` and splices the AUTOGEN
GENERATION section of RESULTS.md.

Reference: no equivalent (the reference has no sampling evaluation at
all — ``models.py:250-263`` defines ``sample`` but nothing calls it).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

HERE = os.path.dirname(os.path.abspath(__file__))


# ----------------------------------------------------------- statistics
# The histogram/JS machinery was promoted into the package in round 4
# (midi/stats.py) so the export-threshold calibrator (midi/calibrate.py)
# and this dossier score corpora with one implementation.

from midi_vae_tpu.midi.stats import roll_statistics  # noqa: E402
from midi_vae_tpu.midi.stats import js_profile as js_row  # noqa: E402

EXPORT_THRESHOLD = 0.1  # midi/derasterize.py:roll_to_notes default


def binarize(probs: np.ndarray, seed: int = 0, bernoulli: bool = False) -> np.ndarray:
    """Decoded probabilities [N, H, W] → binary rolls.

    Default: the MIDI-export path's threshold (one code path with what
    the generate CLI writes to .mid). ``bernoulli=True`` samples each
    cell instead — fragments notes when probabilities are uncalibrated,
    so it is the opt-in view, not the shipped one.
    """
    if bernoulli:
        rng = np.random.default_rng(seed)
        return (rng.random(probs.shape) < probs).astype(np.uint8)
    return (probs > EXPORT_THRESHOLD).astype(np.uint8)


# ----------------------------------------------------------- sample sources


def fetch_real_rolls(dataset: str, cfg: dict, image_size: int, partition: str, n: int):
    """Real corpus rolls in raw [0, 1] space → binary uint8 [n, H, W]."""
    from midi_vae_tpu.data.fetch import fetch_dataset
    from midi_vae_tpu.data.pipeline import make_loader
    from midi_vae_tpu.data.transforms import VALID_TRANSFORMS, denormalize, get_transform

    targs = {"normalization": dataset} if dataset in VALID_TRANSFORMS else {}
    _, transform_eval = get_transform(cfg.get("transform_type", "digits"), image_size, targs)
    train, _, test, _ = fetch_dataset(
        dataset, root=cfg.get("data_dir"), prototyping=bool(cfg.get("prototyping", False)),
        transform_train=transform_eval, transform_eval=transform_eval,
        protoval_split_id=int(cfg.get("protoval_split_id") or 0),
    )
    ds = {"train": train, "test": test}[partition]
    loader = make_loader(ds, min(256, len(ds)), train=False)
    rolls = []
    for batch in loader.epoch(1):
        x01 = np.asarray(denormalize(transform_eval, batch.x))
        valid = np.asarray(batch.mask) > 0
        rolls.append(x01[valid])
        if sum(len(r) for r in rolls) >= n:
            break
    if hasattr(loader, "release"):
        loader.release()
    rolls = np.concatenate(rolls, axis=0)[:n, ..., 0]  # [n, H, W]
    # real rolls are {0, velocity}-valued; binarize at the same export
    # threshold as the generated sources (velocities sit far above it)
    return (rolls > EXPORT_THRESHOLD).astype(np.uint8)


def decode_codes(model, params, batch_stats, idx, chunk: int = 256) -> np.ndarray:
    """Code grids [N, s, s] → decoded probabilities [N, H, W] (raw space)."""
    import jax
    import jax.numpy as jnp

    from midi_vae_tpu.models.vq import VQVAE

    @jax.jit
    def dec(i):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, i, method=VQVAE.decode_indices
        )

    outs = []
    for i in range(0, len(idx), chunk):
        outs.append(np.asarray(jax.device_get(dec(jnp.asarray(idx[i:i + chunk])))))
    return np.concatenate(outs, axis=0)[..., 0]


def sample_path(name: str, model, params, batch_stats, n: int, seed: int,
                prior_path: str | None = None, temperature: float = 1.0,
                labels=None, top_p: float | None = None) -> np.ndarray:
    """Draw n code grids via the named path and decode to probabilities."""
    import jax
    import jax.numpy as jnp

    from midi_vae_tpu.models.vq import VQVAE

    key = jax.random.PRNGKey(seed)
    if name == "ema":
        idx = model.apply(
            {"params": params, "batch_stats": batch_stats}, key, n,
            method=VQVAE.sample_codes,
        )
    else:
        from midi_vae_tpu.cli.train_prior import load_prior
        from midi_vae_tpu.models.prior import sample_codes_autoregressive

        prior, pparams, pcfg = load_prior(prior_path)
        y = jnp.asarray(labels, jnp.int32) if labels is not None else None
        idx = sample_codes_autoregressive(
            prior, pparams, key, n, model.last_conv_size, temperature=temperature, y=y,
            top_p=top_p,
        )
    return decode_codes(model, params, batch_stats, np.asarray(idx))


# ----------------------------------------------------------- harness


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vq-checkpoint", required=True,
                    help="Trained VQ-VAE checkpoint (e.g. the quality-dossier vq_fold8 run)")
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--prior-epochs", type=int, default=30)
    ap.add_argument("--prior-features", type=int, default=128)
    ap.add_argument("--prior-layers", type=int, default=6)
    ap.add_argument("--prior-kernel", type=int, default=5,
                    help="PixelCNN masked-conv kernel size (receptive-field lever for the "
                         "code-fragmentation study)")
    ap.add_argument("--prior-augment-passes", type=int, default=0,
                    help="train_prior --augment-passes: extra train-transform encode passes "
                         "multiplying the code corpus (code-space data augmentation lever)")
    ap.add_argument("--archs", nargs="+", default=["pixelcnn", "transformer"],
                    choices=("pixelcnn", "transformer"),
                    help="Which prior architectures to train/evaluate (capacity sweeps "
                         "usually only need pixelcnn)")
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--top-p", type=float, default=None,
                    help="Nucleus sampling for the prior draws (tail-truncation lever; "
                         "temperature is the mode-sharpening lever and measured harmful)")
    ap.add_argument("--conditional", action="store_true",
                    help="Also train a class-conditional PixelCNN prior and report the "
                         "per-class density steering table")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default=None, help="Prior checkpoint cache (default: alongside "
                    "the VQ checkpoint)")
    ap.add_argument("--bernoulli", action="store_true",
                    help="Binarize generated rolls by per-cell Bernoulli sampling instead of "
                         "the MIDI-export threshold")
    ap.add_argument("--no-splice", action="store_true", help="Skip rewriting RESULTS.md")
    ap.add_argument("--json-out", default=None,
                    help="Output JSON path (default: benchmarks/generation_eval.json)")
    ap.add_argument("--threshold-sweep", nargs="*", type=float, default=None,
                    help="Also score each generated source at these binarization thresholds "
                         "(no args = a default grid). Diagnoses whether the duration gap is "
                         "an export-threshold artifact (lower threshold heals note "
                         "fragmentation) or a real decoder probability sag (it doesn't).")
    args = ap.parse_args()

    from midi_vae_tpu.cli.generate import _load_model_and_state
    from midi_vae_tpu.cli.train_prior import cli as prior_cli, load_prior

    model, params, batch_stats, cfg, image_size, channels, dataset = _load_model_and_state(
        args.vq_checkpoint
    )
    assert getattr(model, "latent_kind", "gaussian") == "vq", "needs a VQ checkpoint"
    workdir = args.workdir or os.path.dirname(os.path.abspath(args.vq_checkpoint))
    os.makedirs(workdir, exist_ok=True)

    # -- train (or reuse) the priors through the framework trainer --------
    # non-default capacity configs get their own cache names so a sweep
    # never silently reuses a differently-sized prior
    cap = (args.prior_features, args.prior_layers, args.prior_kernel, args.prior_augment_passes)
    tag = "" if cap == (128, 6, 5, 0) else (
        f"_f{args.prior_features}l{args.prior_layers}k{args.prior_kernel}e{args.prior_epochs}"
        + (f"a{args.prior_augment_passes}" if args.prior_augment_passes else "")
    )
    priors = {}
    for arch in args.archs:
        path = os.path.join(workdir, f"prior_{arch}{tag}.msgpack")
        priors[arch] = path
        if not os.path.isfile(path):
            print(f"=== training {arch} prior ({args.prior_epochs} epochs) ===", flush=True)
        prior_cli([
            "--checkpoint", args.vq_checkpoint, "--out", path,
            "--prior-arch", arch, "--epochs", str(args.prior_epochs),
            "--features", str(args.prior_features), "--layers", str(args.prior_layers),
            "--kernel-size", str(args.prior_kernel),
            "--augment-passes", str(args.prior_augment_passes),
            "--seed", str(args.seed),
        ])
    cond_path = None
    if args.conditional:
        aug_tag = f"_a{args.prior_augment_passes}" if args.prior_augment_passes else ""
        cond_path = os.path.join(workdir, f"prior_cond{aug_tag}.msgpack")
        if not os.path.isfile(cond_path):
            print("=== training conditional pixelcnn prior ===", flush=True)
        prior_cli([
            "--checkpoint", args.vq_checkpoint, "--out", cond_path,
            "--prior-arch", "pixelcnn", "--epochs", str(args.prior_epochs),
            "--features", str(args.prior_features), "--layers", str(args.prior_layers),
            "--augment-passes", str(args.prior_augment_passes),
            "--seed", str(args.seed), "--conditional",
        ])

    # -- reference statistics: the held-out partition ----------------------
    n = args.samples
    print(f"=== computing statistics over {n} rolls per source ===", flush=True)
    heldout = fetch_real_rolls(dataset, cfg, image_size, "test", n)
    ref_stats = roll_statistics(heldout)
    train_rolls = fetch_real_rolls(dataset, cfg, image_size, "train", n)

    rows = []

    def add_row(name, binary_rolls, extra=None):
        st = roll_statistics(binary_rolls)
        row = {
            "source": name,
            **js_row(st, ref_stats),
            "mean_density": round(st["mean_density"], 5),
            "mean_polyphony": round(st["mean_polyphony"], 3),
            "mean_duration": round(st["mean_duration"], 2),
            "notes_per_roll": round(st["notes_per_roll"], 1),
            **(extra or {}),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        return row

    add_row("heldout (self)", heldout)
    add_row("train (noise floor)", train_rolls)
    decoded = {}  # source name -> decoded probabilities (for the threshold sweep)
    decoded["ema-marginal"] = sample_path("ema", model, params, batch_stats, n, args.seed)
    add_row("ema-marginal", binarize(decoded["ema-marginal"], args.seed, args.bernoulli))
    for arch in args.archs:
        probs = sample_path(arch, model, params, batch_stats, n, args.seed,
                            prior_path=priors[arch], temperature=args.temperature,
                            top_p=args.top_p)
        decoded[f"prior:{arch}"] = probs
        _, _, pcfg = load_prior(priors[arch])
        add_row(f"prior:{arch}", binarize(probs, args.seed, args.bernoulli),
                extra={"test_nll": round(float(pcfg["test_nll"]), 4)
                       if pcfg.get("test_nll") is not None else None})

    # -- binarization-threshold sweep ---------------------------------------
    sweep = None
    if args.threshold_sweep is not None:
        grid = args.threshold_sweep or [0.02, 0.03, 0.05, 0.08, 0.1, 0.15, 0.2, 0.3]
        sweep = []
        print("=== threshold sweep ===", flush=True)
        for source, probs in decoded.items():
            for t in grid:
                st = roll_statistics((probs > t).astype(np.uint8))
                entry = {"source": source, "threshold": t, **js_row(st, ref_stats),
                         "mean_duration": round(st["mean_duration"], 2),
                         "notes_per_roll": round(st["notes_per_roll"], 1),
                         "mean_density": round(st["mean_density"], 5)}
                sweep.append(entry)
                print(json.dumps(entry), flush=True)

    # -- conditional steering ----------------------------------------------
    steering = None
    if cond_path:
        _, _, ccfg = load_prior(cond_path)
        k = int(ccfg["num_classes"])
        steering = []
        for c in range(k):
            probs = sample_path("pixelcnn", model, params, batch_stats,
                                max(64, n // k), args.seed + c, prior_path=cond_path,
                                labels=np.full(max(64, n // k), c))
            steering.append({"class": c, "mean_density": round(float(probs.mean()), 5)})
            print(json.dumps(steering[-1]), flush=True)

    out = {
        "binarization": "bernoulli" if args.bernoulli else f"export threshold {EXPORT_THRESHOLD}",
        "vq_checkpoint": os.path.abspath(args.vq_checkpoint),
        "dataset": dataset,
        "samples": n,
        "prior_epochs": args.prior_epochs,
        "prior_capacity": {"features": args.prior_features, "layers": args.prior_layers,
                           "kernel": args.prior_kernel,
                           "augment_passes": args.prior_augment_passes},
        "temperature": args.temperature,
        "top_p": args.top_p,
        "rows": rows,
        "steering": steering,
        "threshold_sweep": sweep,
    }
    path = args.json_out or os.path.join(HERE, "generation_eval.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    if not args.no_splice:
        splice_results(out)


def splice_results(out: dict) -> None:
    """Rewrite the AUTOGEN GENERATION section of RESULTS.md (same pattern
    as quality_check.py: published tables only contain regenerated numbers)."""
    results_md = os.path.join(HERE, "RESULTS.md")
    begin, end = "<!-- BEGIN AUTOGEN GENERATION -->", "<!-- END AUTOGEN GENERATION -->"
    lines = [
        "| source | JS density | JS pitch-class | JS polyphony | JS duration | JS mean |"
        " density | polyphony | dur (cols) | notes/roll |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in out["rows"]:
        nll = f" (prior test NLL {r['test_nll']:.3f})" if r.get("test_nll") is not None else ""
        lines.append(
            f"| {r['source']}{nll} | {r['js_density']:.4f} | {r['js_pitch_class']:.4f} "
            f"| {r['js_polyphony']:.4f} | {r['js_duration']:.4f} | **{r['js_mean']:.4f}** | "
            f"{r['mean_density']:.4f} | {r['mean_polyphony']:.2f} | "
            f"{r['mean_duration']:.1f} | {r['notes_per_roll']:.0f} |"
        )
    if out.get("steering"):
        lines.append("")
        lines.append("Conditional prior steering (mean decode probability per requested "
                     "density bucket, prior draws fixed):")
        lines.append("")
        lines.append("| requested class | " + " | ".join(str(s["class"]) for s in out["steering"]) + " |")
        lines.append("|---|" + "---|" * len(out["steering"]))
        lines.append("| mean density | " + " | ".join(f"{s['mean_density']:.4f}"
                                                      for s in out["steering"]) + " |")
    lines.append("")
    lines.append(f"({out['samples']} rolls/source on `{out['dataset']}`, priors trained "
                 f"{out['prior_epochs']} epochs, JS divergence base-2 vs the held-out "
                 f"partition; regenerated by `benchmarks/generation_eval.py`)")
    block = f"{begin}\n" + "\n".join(lines) + f"\n{end}"
    with open(results_md) as f:
        text = f.read()
    if begin not in text:
        print(f"RESULTS.md has no {begin} marker; skipping splice")
        return
    pre = text.split(begin)[0]
    post = text.split(end)[1]
    with open(results_md, "w") as f:
        f.write(pre + block + post)
    print("rewrote RESULTS.md AUTOGEN GENERATION section")


if __name__ == "__main__":
    main()
