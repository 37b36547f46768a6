"""Training-quality comparison across architecture variants.

Perf decisions in this repo are made on measured throughput PLUS a
quality gate: a fast layout that can't learn is worthless. This script
trains each variant for a few epochs on the synthetic-lines dataset at
128 px (the flagship image size) with matched hyperparameters and
reports the eval metrics (BCE nats / mse% / active units) side by side
— the regenerable version of the quality table in RESULTS.md
"architecture experiments".

Run on the TPU (CPU works but is slow at 128 px):

    python benchmarks/quality_check.py [--epochs 3] [--variants ref fold4 fold8]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# Per-dataset training protocol. The synthetic-lines rows are the
# round-2/3 published table (reference MIDI hyperparameters, matched
# across variants). The midi-synthetic rows are the round-3 sparse-probe
# protocol (RESULTS.md "posterior collapse: FIXED"): the 1.3%-fill
# held-out-MIDI corpus with the anti-collapse recipe — raw-space BCE
# targets, base-rate output bias, and linear KL warmup — which every
# variant needs to survive 60 epochs on 98.7%-empty rolls.
DATASETS = {
    "vae-lines-synthetic": dict(transform_type="noaug"),
    "midi-synthetic": dict(
        transform_type="pianoroll",
        bce_targets="raw",
        output_bias_init="auto",
        kl_schedule="linear",
        kl_warmup_steps=2000,
    ),
    # Tonal corpus (round 5, midi/factory.py structured_notes): ~2% fill,
    # same sparse-probe protocol — the corpus whose second-order
    # statistics can fail a generator (RESULTS.md "Prior-side
    # fragmentation" follow-up)
    "midi-structured": dict(
        transform_type="pianoroll",
        bce_targets="raw",
        output_bias_init="auto",
        kl_schedule="linear",
        kl_warmup_steps=2000,
    ),
}

# dataset -> published-table artifact; other datasets write their own
# side file and never merge into (or splice over) a published table
PUBLISHED_TABLES = {
    "vae-lines-synthetic": "quality.json",
    "midi-synthetic": "quality_midi.json",
}

VARIANTS = {
    "ref": dict(arch="VanillaVAE"),
    # the no-KL-anneal control: on the midi protocol (which anneals by
    # default) this row isolates what the linear warmup contributes —
    # the reference's own constant-β semantics (models.py:218-219 left
    # the annealing commented out)
    "ref_const": dict(arch="VanillaVAE", kl_schedule="constant"),
    # β-TC-VAE on the reference trunk (configs/beta_tc_vae.yaml): the
    # objective exists to improve MIG — this row is measured against
    # `ref`'s MIG (same trunk, plain ELBO)
    "beta_tc": dict(arch="VanillaVAE", loss_type="beta-tc", tc_beta=6.0,
                    kld_weight=1.0, kl_schedule="constant", dtype="float32"),
    "s2d": dict(arch="VanillaVAE", stem="s2d"),
    "d2s": dict(arch="VanillaVAE", head="d2s"),
    "fold2": dict(arch="FoldedVAE", fold=2),
    "fold4": dict(arch="FoldedVAE", fold=4),
    "fold8": dict(arch="FoldedVAE", fold=8),
    "fold16": dict(arch="FoldedVAE", fold=16),
    # fold=8 with a widened first stage: the s2d(8) stem emits 64 channels,
    # which the default hidden_dims[0]=32 immediately compresses 2x while
    # also striding — the suspected source of fold8's small quality gap
    "fold8w": dict(arch="FoldedVAE", fold=8, hidden_dims=(64, 64, 128, 256)),
    # the 48-channel compromise between fold8 (fastest) and fold8w (best
    # objective): does most of the widened first stage's quality win come
    # at less of its throughput cost? (round-3 flagship-config probe)
    "fold8m": dict(arch="FoldedVAE", fold=8, hidden_dims=(48, 64, 128, 256)),
    # round-4 MFU lever: BN statistics from a stride-4 batch subsample
    # (models/vae.py SubsampledBatchNorm) on the flagship trunk — the
    # quality gate for the norm_bench throughput row
    "fold8m_bnsub4": dict(arch="FoldedVAE", fold=8, hidden_dims=(48, 64, 128, 256),
                          norm="batch-sub4"),
    # fold=16 with the widened first stage: the s2d(16) stem emits 256
    # channels, so the narrow fold16's 32-ch first stage compresses 8x —
    # the same bottleneck the fold8 widening removed. Measured round 3:
    # 201.7k samples/sec/chip at a better 300-step loss than fold8m.
    "fold16w": dict(arch="FoldedVAE", fold=16, hidden_dims=(64, 64, 128, 256)),
    # the flagship with GroupNorm in place of BatchNorm: the round-3
    # backward trace attributes ~2.3 ms/step of f32 convert+reduce fusions
    # largely to train-mode BN's two full activation passes; GN normalizes
    # within-sample (no running stats, no cross-replica coupling) — this
    # row is the quality gate for adopting it
    "fold8m_gn": dict(arch="FoldedVAE", fold=8, hidden_dims=(48, 64, 128, 256), norm="group"),
    # the flagship with NO normalization: the fastest variant on the norm
    # sweep (+12.6% over BatchNorm — benchmarks/norm_bench.json); this row
    # is its quality gate (conv stacks + AdamW often train fine un-normed
    # at this depth, but it must be measured, not assumed)
    "fold8m_nn": dict(arch="FoldedVAE", fold=8, hidden_dims=(48, 64, 128, 256), norm="none"),
    # discrete-latent family (models/vq.py): reference trunk + EMA-codebook
    # bottleneck, trained under the VQ objective (kld_weight = commitment
    # beta 0.25, the paper default). The table's kl column reports the
    # commitment distance for this row; active_units reports the encoder
    # output's variability (codebook health is in the extra columns).
    # (VQ rows pin kl_schedule=constant: under the midi protocol the
    # linear warmup would otherwise anneal the commitment β, which is
    # not a KL weight — the paper trains it constant at 0.25)
    "vq": dict(arch="VQVAE", loss_type="vq", n_features=16, codebook_size=512,
               kld_weight=0.25, kl_schedule="constant"),
    # round-4 follow-up to the generation dossier's duration-fragmentation
    # finding: a 16x16 code grid (3 downsamples instead of 4) gives the
    # prior 4x more positions along time — does coarser compression cause
    # the short-note artifact?
    "vq16": dict(arch="VQVAE", loss_type="vq", n_features=16, codebook_size=512,
                 kld_weight=0.25, kl_schedule="constant", hidden_dims=(32, 64, 128)),
    # discrete bottleneck on the folded flagship trunk (models/vq.py
    # FoldedVQVAE): same quantizer grid, flagship compute layout
    "vq_fold8": dict(arch="FoldedVQVAE", loss_type="vq", fold=8,
                     hidden_dims=(48, 64, 128, 256), n_features=16,
                     codebook_size=512, kld_weight=0.25, kl_schedule="constant"),
    # the promotion candidate from the round-4 calibration study: the
    # folded layout (s2d(8) -> every conv at 16^2 spatial) with the
    # 16x16 code grid whose decoder reconstructs durations near-perfectly
    # (vq16's finding) — flagship-style compute AND the calibrated grid
    "vq16_fold8": dict(arch="FoldedVQVAE", loss_type="vq", fold=8,
                       hidden_dims=(64, 128, 256), n_features=16,
                       codebook_size=512, kld_weight=0.25, kl_schedule="constant"),
    # round-5 fine-grid throughput swings (VERDICT weak #4): the layer
    # profile shows the 128<->256-channel convs at 16^2 carry ~2/3 of the
    # trunk's FLOPs. These rows are the quality gates for cutting them —
    # slim (-39% conv FLOPs) and narrow-top (-17%); bench.py measures the
    # corresponding throughput via MIDI_VAE_BENCH_HIDDEN.
    "vq16_fold8s": dict(arch="FoldedVQVAE", loss_type="vq", fold=8,
                        hidden_dims=(48, 96, 192), n_features=16,
                        codebook_size=512, kld_weight=0.25, kl_schedule="constant"),
    "vq16_fold8n": dict(arch="FoldedVQVAE", loss_type="vq", fold=8,
                        hidden_dims=(64, 128, 192), n_features=16,
                        codebook_size=512, kld_weight=0.25, kl_schedule="constant"),
}


def run_variant(name: str, epochs: int, image_size: int, bf16: bool, workdir: str,
                iwae_k=None, dataset="vae-lines-synthetic", mig_bins=None, seed=0):
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    base = dict(
        dataset_name=dataset,
        image_size=image_size,
        epochs=epochs,
        batch_size_per_device=100,
        lr_relative=1e-3 * 128 / 100,  # reference MIDI config: lr 1e-3 @ batch 100
        kld_weight=2.5e-4,
        seed=seed,
        dtype="bfloat16" if bf16 else "float32",
        models_dir=os.path.join(workdir, name if seed == 0 else f"{name}_s{seed}"),
        log_images=False,
        run_name=name,
        run_id="qual" if seed == 0 else f"qual_s{seed}",
        final_iwae=iwae_k,
        final_mig=mig_bins,
    )
    base.update(DATASETS[dataset])  # per-dataset protocol (transform, anti-collapse recipe)
    base.update(VARIANTS[name])  # variant keys (incl. kld_weight for vq) win
    config = TrainConfig(**base)
    results = run(config)
    t = results["final_test"]
    iwae_val = t.get(f"iwae-{iwae_k}") if iwae_k else None  # absent for vq (skipped)
    mig_val = t.get("mig") if mig_bins else None
    return {
        "variant": name,
        "bce_nats": round(float(t["cross-entropy"]), 4),
        "mse_pct": round(float(t["mse"]), 2),
        "mae_pct": round(float(t["mae"]), 2),
        "kl_nats": round(float(t["kl"]), 3),
        "active_units": int(t["active-units"]),
        # raw-target runs (the midi protocol) also report the BCE in the
        # trained objective's space — the number the probe tables quote
        **({"bce_objective": round(float(t["bce-objective"]), 4)} if "bce-objective" in t else {}),
        **({f"iwae{iwae_k}_nats": round(float(iwae_val), 2)} if iwae_val is not None else {}),
        **({"mig": round(float(mig_val), 4)} if mig_val is not None else {}),
        **(
            {
                "codebook_perplexity": round(float(t["codebook-perplexity"]), 1),
                "active_codes": int(t["active-codes"]),
            }
            if "codebook-perplexity" in t
            else {}
        ),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--dataset", default="vae-lines-synthetic", choices=sorted(DATASETS),
                    help="training corpus + protocol: the published lines table, or the "
                         "held-out-MIDI quality dossier (sparse-probe protocol)")
    ap.add_argument("--variants", nargs="+", default=["ref", "fold4", "fold8"],
                    choices=sorted(VARIANTS))
    ap.add_argument("--iwae", type=int, default=None, metavar="K",
                    help="also report the K-sample IWAE bound per variant (nats/sample)")
    ap.add_argument("--mig", type=int, default=None, metavar="BINS",
                    help="also report each variant's MIG against the dataset labels")
    ap.add_argument("--f32", action="store_true", help="float32 compute (default bfloat16)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    workdir = args.workdir or tempfile.mkdtemp(prefix="quality_")
    rows = []
    for name in args.variants:
        print(f"=== training variant: {name} ===", flush=True)
        rows.append(run_variant(name, args.epochs, args.image_size, not args.f32, workdir,
                                iwae_k=args.iwae, dataset=args.dataset, mig_bins=args.mig))
        print(json.dumps(rows[-1]), flush=True)

    print("\nvariant      BCE(nats)   mse%    mae%    KL     active")
    for r in rows:
        print(f"{r['variant']:<12s} {r['bce_nats']:>8.4f} {r['mse_pct']:>7.2f} "
              f"{r['mae_pct']:>7.2f} {r['kl_nats']:>7.3f} {r['active_units']:>5d}")

    midi = args.dataset != "vae-lines-synthetic"
    fname = PUBLISHED_TABLES.get(
        args.dataset, f"quality_{args.dataset.replace('-', '_')}.json"
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), fname)
    # merge with prior rows measured at the same epochs/size, so partial
    # re-runs update their variants without dropping the rest of the table
    dropped = []
    if os.path.exists(path):
        try:
            with open(path) as f:
                prior = json.load(f)
            if prior.get("epochs") == args.epochs and prior.get("image_size") == args.image_size:
                ran = {r["variant"] for r in rows}
                rows = [r for r in prior["rows"] if r["variant"] not in ran] + rows
                order = list(VARIANTS)
                rows.sort(key=lambda r: order.index(r["variant"]) if r["variant"] in order else 99)
            else:
                # a run at different settings cannot be merged; publishing it
                # would silently drop every previously published variant row
                ran = {r["variant"] for r in rows}
                dropped = sorted({r["variant"] for r in prior.get("rows", [])} - ran)
        except (ValueError, KeyError):
            pass
    if dropped:
        # quality.json backs the published table — a run at other settings
        # must not clobber it; park the data in a settings-named side file
        path = path.replace(".json", f"_{args.epochs}e_{args.image_size}px.json")
    with open(path, "w") as f:
        json.dump({"dataset": args.dataset, "epochs": args.epochs,
                   "image_size": args.image_size, "rows": rows}, f, indent=1)
    print(f"wrote {path}")
    if dropped:
        print(
            f"WARNING: this run ({args.epochs} epochs @ {args.image_size}px) does not match the "
            f"published table's settings and omits previously published variants {dropped}; "
            "NOT rewriting RESULTS.md — re-run with all variants (or the published settings) "
            "to update the table."
        )
        return
    if args.dataset not in PUBLISHED_TABLES:
        return  # side corpora publish through their own harnesses
    splice_results(args.epochs, args.image_size, rows, dataset=args.dataset)


def splice_results(epochs: int, image_size: int, rows, dataset="vae-lines-synthetic") -> None:
    """Rewrite the AUTOGEN QUALITY section of RESULTS.md (same pattern as
    measure.py: published tables only ever contain regenerated numbers).
    The midi dossier writes its own AUTOGEN QUALITY MIDI section."""
    import re

    midi = dataset != "vae-lines-synthetic"
    results_md = os.path.join(os.path.dirname(os.path.abspath(__file__)), "RESULTS.md")
    marker = "AUTOGEN QUALITY MIDI" if midi else "AUTOGEN QUALITY"
    begin, end = f"<!-- BEGIN {marker} -->", f"<!-- END {marker} -->"
    iwae_col = next((k for r in rows for k in r if k.startswith("iwae")), None)
    if iwae_col and not all(iwae_col in r for r in rows if "codebook_perplexity" not in r):
        iwae_col = None  # partial re-runs without --iwae keep the plain table
    mig_col = all("mig" in r for r in rows)
    obj_col = all("bce_objective" in r for r in rows)
    hdr = "| variant | BCE (nats) |" + (" objective BCE |" if obj_col else "") + " mse % | mae % | KL (nats) | active units |"
    sep = "|---|---|" + ("---|" if obj_col else "") + "---|---|---|---|"
    if iwae_col:
        hdr += f" {iwae_col.replace('_nats', '')} (nats/sample) |"
        sep += "---|"
    if mig_col:
        hdr += " MIG |"
        sep += "---|"
    lines = [hdr, sep]
    for r in rows:
        if "codebook_perplexity" in r:
            # VQ rows: the Gaussian KL of z_e is not a KL (point-mass
            # posterior) — report the codebook health instead
            kl_cell = "— (VQ)"
            active_cell = f"perplexity {r['codebook_perplexity']:.0f}, {r['active_codes']}/512 codes"
        else:
            kl_cell = f"{r['kl_nats']:.3f}"
            active_cell = f"{r['active_units']}/10"
        row = (f"| {r['variant']} | {r['bce_nats']:.4f} | "
               + (f"{r['bce_objective']:.4f} | " if obj_col else "")
               + f"{r['mse_pct']:.2f} | {r['mae_pct']:.2f} | {kl_cell} | {active_cell} |")
        if iwae_col:
            row += f" {r[iwae_col]:.2f} |" if iwae_col in r else " — (VQ: point-mass posterior) |"
        if mig_col:
            row += f" {r['mig']:.3f} |"
        lines.append(row)
    corpus = ("held-out midi-synthetic (1.3%-fill sparse rolls, anti-collapse protocol)"
              if midi else "synthetic-lines")
    lines.append(
        f"\n({epochs}-epoch {corpus} runs at {image_size} px, matched hyperparameters, "
        f"regenerated by `benchmarks/quality_check.py{' --dataset ' + dataset if midi else ''}`)"
    )
    block = f"{begin}\n" + "\n".join(lines) + f"\n{end}"
    with open(results_md) as f:
        text = f.read()
    pattern = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.DOTALL)
    if not pattern.search(text):
        print(f"NOTE: RESULTS.md has no {begin} markers; skipping splice")
        return
    with open(results_md, "w") as f:
        f.write(pattern.sub(lambda _: block, text))
    print("rewrote RESULTS.md AUTOGEN QUALITY section")


if __name__ == "__main__":
    main()
