"""Flagship (fold8m) train-step throughput by conv-block normalization.

The round-3 backward trace (`benchmarks/backward_profile.json`)
attributed ~2.3 ms/step to f32 convert+reduce fusions — part gradient
reductions, part train-mode BatchNorm's two full passes over every
activation tensor. This sweep measures the BN cost directly by swapping
the normalization sublayer (`--norm`, models/vae.py:_apply_norm) with
everything else held fixed: same architecture, batch, data stream, and
measurement core (bench.py's value-materialized `lax.scan` windows,
median of 3 per config).

Run on the TPU:  python benchmarks/norm_bench.py [--batch 2048] [--steps 300]

Writes benchmarks/norm_bench.json — the source for the RESULTS.md
"normalization" numbers.
"""

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--norms", nargs="+", default=["batch", "group", "none"],
                    help="Norm variants to measure (batch-subN = subsampled-stats BN, "
                         "the round-4 MFU lever)")
    args = ap.parse_args()

    import bench

    results = {
        "batch_per_chip": args.batch,
        "steps": args.steps,
        "date": datetime.date.today().isoformat(),
        "arch": "FoldedVAE fold=8 (48,64,128,256) bf16 — the flagship (fold8m)",
        "configs": [],
    }
    for norm in args.norms:
        ctx = bench.setup(
            batch=args.batch, bf16=True, fused=False, stem="conv", head="deconv",
            arch="FoldedVAE", fold=8, hidden_dims=(48, 64, 128, 256), norm=norm,
        )
        windows = []
        final_loss = None
        for _ in range(args.windows):
            per_chip, final_loss, _ = bench.measure_train(ctx, steps=args.steps)
            windows.append(round(per_chip))
        entry = {
            "norm": norm,
            "samples_per_sec_per_chip": sorted(windows)[len(windows) // 2],
            "windows": windows,
            "final_loss": round(float(final_loss), 4),
            "backend": ctx["backend"],
        }
        results["configs"].append(entry)
        print(json.dumps(entry), flush=True)

    base = next((c["samples_per_sec_per_chip"] for c in results["configs"]
                 if c["norm"] == "batch"), results["configs"][0]["samples_per_sec_per_chip"])
    for c in results["configs"]:
        c["vs_batchnorm"] = round(c["samples_per_sec_per_chip"] / base, 3)

    path = os.path.join(HERE, "norm_bench.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
