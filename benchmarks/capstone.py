"""Flagship convergence capstone: one long run at the reference's MIDI scale.

Round-4 VERDICT item 8: every quality number so far came from
probe-length runs (10-60 epochs). This harness runs the flagship
(fold8m, the held-out-IWAE winner of the round-4 quality dossier) for a
convergence-length schedule at the reference's recorded MIDI-run scale
(`/root/reference/midi_autoencoder/configs/vae.yaml:16-27`: lr 1e-3,
wd 1e-5, kld_weight 2.5e-4, latent 10, batch 100, ≥100 epochs) on the
held-out-split MIDI corpus, under the sparse-corpus anti-collapse
protocol (raw targets, base-rate bias, KL warmup — RESULTS.md round 3),
then:

- scores the held-out partition with IWAE-64 and MIG (the dossier's
  metrics, at depth);
- exports prior-sample and reconstruction grids through the generate
  CLI into ``benchmarks/assets/`` (the artifacts a reader can look at);
- writes ``capstone.json`` and splices the AUTOGEN CAPSTONE section of
  RESULTS.md.

Together with ``elbo_parity.py --at-scale`` (convergence-level torch/JAX
parity) this closes the north star's "held-out ELBO parity" claim on a
convergence-length run rather than probe-length runs.

Usage::

    python benchmarks/capstone.py [--epochs 120] [--workdir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--samples-grid", type=int, default=64)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--f32", action="store_true", help="float32 compute (default bfloat16)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-splice", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    workdir = args.workdir or os.path.join("/tmp", "capstone_r4")
    config = TrainConfig(
        # corpus + anti-collapse protocol (quality dossier's midi protocol)
        dataset_name="midi-synthetic",
        transform_type="pianoroll",
        image_size=args.image_size,
        bce_targets="raw",
        output_bias_init="auto",
        kl_schedule="linear",
        kl_warmup_steps=2000,
        # flagship architecture (round-4 dossier IWAE winner)
        arch="FoldedVAE",
        fold=8,
        hidden_dims=(48, 64, 128, 256),
        n_features=10,
        # reference MIDI-run scale (configs/vae.yaml:16-27)
        epochs=args.epochs,
        batch_size_per_device=100,
        lr_relative=0.00128,  # lr = 1e-3 at batch 100 (linear scaling, BASE=128)
        weight_decay=1e-5,
        kld_weight=2.5e-4,
        optimizer="AdamW",
        scheduler="OneCycle",
        dtype="float32" if args.f32 else "bfloat16",
        # depth-grade evaluation
        final_iwae=64,
        final_mig=20,
        save_best_model=True,
        seed=0,
        models_dir=workdir,
        run_name="capstone",
        run_id="r4",
        log_images=False,
    )
    t0 = time.time()
    results = run(config)
    duration = time.time() - t0
    t = results["final_test"]

    # -- sample + reconstruction grids through the real CLI ---------------
    from midi_vae_tpu.cli.generate import cli as generate_cli

    assets = os.path.join(HERE, "assets")
    os.makedirs(assets, exist_ok=True)
    ckpt = config.checkpoint_path
    generate_cli(["--checkpoint", ckpt, "--mode", "sample", "-n", str(args.samples_grid),
                  "--seed", "0", "--out", os.path.join(assets, "capstone_samples.png")])
    generate_cli(["--checkpoint", ckpt, "--mode", "reconstruct", "-n", "16",
                  "--seed", "0", "--out", os.path.join(assets, "capstone_recon.png")])

    out = {
        "arch": "fold8m (FoldedVAE fold=8, hidden 48-64-128-256)",
        "dataset": "midi-synthetic (held-out split)",
        "epochs": args.epochs,
        "image_size": args.image_size,
        "dtype": config.dtype,
        "protocol": "reference vae.yaml scale: lr 1e-3@100, wd 1e-5, beta 2.5e-4 "
                    "+ linear warmup 2000 (anti-collapse raw targets / auto bias)",
        "duration_sec": round(duration, 1),
        "best_epoch": int(results.get("best_epoch", 0)),
        "final_test": {
            "bce_nats": round(float(t["cross-entropy"]), 4),
            "bce_objective": round(float(t["bce-objective"]), 5) if "bce-objective" in t else None,
            "mse_pct": round(float(t["mse"]), 2),
            "mae_pct": round(float(t["mae"]), 2),
            "kl_nats": round(float(t["kl"]), 3),
            "active_units": int(t["active-units"]),
            "iwae64_nats": round(float(t["iwae-64"]), 2) if "iwae-64" in t else None,
            "mig": round(float(t["mig"]), 4) if "mig" in t else None,
        },
        "checkpoint": ckpt,
        "assets": ["assets/capstone_samples.png", "assets/capstone_recon.png"],
    }
    path = os.path.join(HERE, "capstone.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}")
    if not args.no_splice:
        splice_results(out)


def splice_results(out: dict) -> None:
    results_md = os.path.join(HERE, "RESULTS.md")
    begin, end = "<!-- BEGIN AUTOGEN CAPSTONE -->", "<!-- END AUTOGEN CAPSTONE -->"
    t = out["final_test"]
    lines = [
        "| | |",
        "|---|---|",
        f"| architecture | {out['arch']} |",
        f"| schedule | {out['epochs']} epochs @ {out['image_size']} px, {out['dtype']} |",
        f"| protocol | {out['protocol']} |",
        f"| wall clock | {out['duration_sec']:.0f} s (incl. final sweeps) |",
        f"| best epoch | {out['best_epoch']} |",
        f"| held-out BCE (parity space) | {t['bce_nats']:.4f} nats |",
        f"| held-out BCE (objective space) | {t['bce_objective']} nats |",
        f"| held-out IWAE-64 | {t['iwae64_nats']} nats/sample |",
        f"| held-out MIG | {t['mig']} |",
        f"| KL / active units | {t['kl_nats']:.3f} nats, {t['active_units']}/10 |",
        "",
        f"Sample grid: `{out['assets'][0]}` · reconstructions: `{out['assets'][1]}` "
        f"(regenerated by `benchmarks/capstone.py`)",
    ]
    block = f"{begin}\n" + "\n".join(lines) + f"\n{end}"
    with open(results_md) as f:
        text = f.read()
    if begin not in text:
        print(f"RESULTS.md has no {begin} marker; skipping splice")
        return
    with open(results_md, "w") as f:
        f.write(text.split(begin)[0] + block + text.split(end)[1])
    print("rewrote RESULTS.md AUTOGEN CAPSTONE section")


if __name__ == "__main__":
    main()
