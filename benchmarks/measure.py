"""Regenerate the RESULTS.md measurement tables from one code path.

Round-1 VERDICT flagged a 14% gap between a published sampling number
and the driver-captured one. The fix is structural: this script runs
the whole config matrix through the SAME functions ``bench.py`` uses
(one process, one compile per config), writes ``benchmarks/measured.json``,
and rewrites the marked sections of RESULTS.md — so published tables
can only ever contain regenerated numbers, with run-to-run variance
stated.

Usage (on the TPU):  python benchmarks/measure.py [--steps 300] [--sample-repeats 5]
"""

import argparse
import datetime
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

HERE = os.path.dirname(os.path.abspath(__file__))
RESULTS = os.path.join(HERE, "RESULTS.md")

TRAIN_CONFIGS = [
    # (label, kwargs for bench.setup); "(bench default)" marks the flagship
    # config bench.py runs — sampling is measured on that one
    ("bf16, FoldedVAE fold=8 flagship fold8m (48,64,128,256) (bench default)",
     dict(bf16=True, fused=False, arch="FoldedVAE", fold=8, hidden_dims=(48, 64, 128, 256))),
    ("bf16, FoldedVAE fold=8 narrow (32,64,128,256)", dict(bf16=True, fused=False, arch="FoldedVAE", fold=8)),
    ("bf16, FoldedVAE fold=4", dict(bf16=True, fused=False, arch="FoldedVAE", fold=4)),
    ("bf16, FoldedVAE fold=16", dict(bf16=True, fused=False, arch="FoldedVAE", fold=16)),
    ("bf16, FoldedVAE fold=8 wide fold8w (64,64,128,256)",
     dict(bf16=True, fused=False, arch="FoldedVAE", fold=8, hidden_dims=(64, 64, 128, 256))),
    ("bf16, reference arch", dict(bf16=True, fused=False, stem="conv")),
    ("bf16, s2d stem", dict(bf16=True, fused=False, stem="s2d")),
    ("bf16, d2s head", dict(bf16=True, fused=False, stem="conv", head="d2s")),
    ("bf16, s2d stem + d2s head", dict(bf16=True, fused=False, stem="s2d", head="d2s")),
    ("f32, reference arch", dict(bf16=False, fused=False, stem="conv")),
    ("f32 + Pallas fused loss", dict(bf16=False, fused=True, stem="conv")),
    # discrete-latent family (models/vq.py; trains under the VQ objective,
    # so final_loss is recon+commitment — compare throughput, not loss)
    ("bf16, VQVAE d2s head (discrete bottleneck, reference trunk)",
     dict(bf16=True, fused=False, arch="VQVAE", head="d2s")),
    ("bf16, FoldedVQVAE fold=8 (48,64,128,256)",
     dict(bf16=True, fused=False, arch="FoldedVQVAE", fold=8, hidden_dims=(48, 64, 128, 256))),
]


def run_matrix(steps: int, sample_repeats: int, batch: int):
    import bench

    ref = bench.read_baseline()
    results = {"batch_per_chip": batch, "steps": steps, "configs": [], "torch_cpu_baseline": ref,
               "date": datetime.date.today().isoformat()}
    sampling = None
    for label, kwargs in TRAIN_CONFIGS:
        print(f"--- measuring: {label}", flush=True)
        ctx = bench.setup(batch=batch, **kwargs)
        per_chip, final_loss, measured = bench.measure_train(ctx, steps=steps)
        entry = {
            "label": label,
            **kwargs,
            "samples_per_sec_per_chip": round(per_chip, 1),
            "vs_baseline": round(per_chip / ref, 1) if ref else None,
            "final_loss": round(final_loss, 5),
            "backend": ctx["backend"],
        }
        results["configs"].append(entry)
        print(json.dumps(entry), flush=True)
        if label.endswith("(bench default)"):
            rates = bench.measure_sampling(ctx, repeats=sample_repeats)
            sampling = {
                "rates": [round(r, 1) for r in rates],
                "mean": round(sum(rates) / len(rates), 1),
                "min": round(min(rates), 1),
                "max": round(max(rates), 1),
                "spread_pct": round(100 * (max(rates) - min(rates)) / (sum(rates) / len(rates)), 1),
            }
            print("sampling:", json.dumps(sampling), flush=True)
    results["sampling_default_config"] = sampling
    return results


def render_train_table(results) -> str:
    lines = ["| config | samples/sec/chip | vs CPU reference |", "|---|---|---|"]
    for c in results["configs"]:
        vs = f"{c['vs_baseline']:,.0f}×" if c["vs_baseline"] else "—"
        lines.append(f"| {c['label']} | {c['samples_per_sec_per_chip']:,.0f} | {vs} |")
    lines.append(
        f"\n(batch {results['batch_per_chip']}/chip, {results['steps']}-step windows, "
        f"regenerated {results['date']} by `benchmarks/measure.py`)"
    )
    return "\n".join(lines)


def render_sampling(results) -> str:
    s = results["sampling_default_config"]
    if not s:
        return "(not measured)"
    rates = sorted(s["rates"])
    median = rates[len(rates) // 2]
    return (
        f"Decode-only prior sampling (serving path), batch {results['batch_per_chip']}, z sharded over "
        f"the data mesh: **{median:,.0f} samples/sec/chip steady-state** "
        f"(median of {len(s['rates'])} back-to-back windows: {', '.join(f'{r:,.0f}' for r in s['rates'])}). "
        f"The FIRST window after compile is routinely much slower (cold caches/power state) — "
        f"single-window measurements of this short path are unreliable; quote the median with the "
        f"window list."
    )


def splice(text: str, marker: str, replacement: str) -> str:
    begin, end = f"<!-- BEGIN AUTOGEN {marker} -->", f"<!-- END AUTOGEN {marker} -->"
    pattern = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.DOTALL)
    block = f"{begin}\n{replacement}\n{end}"
    if not pattern.search(text):
        raise SystemExit(f"RESULTS.md is missing the {begin} / {end} markers")
    return pattern.sub(block, text)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--sample-repeats", type=int, default=5)
    ap.add_argument("--no-rewrite", action="store_true", help="measure + JSON only")
    args = ap.parse_args()

    results = run_matrix(args.steps, args.sample_repeats, args.batch)
    with open(os.path.join(HERE, "measured.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("wrote benchmarks/measured.json")

    if not args.no_rewrite:
        with open(RESULTS) as f:
            text = f.read()
        text = splice(text, "TRAIN", render_train_table(results))
        text = splice(text, "SAMPLING", render_sampling(results))
        with open(RESULTS, "w") as f:
            f.write(text)
        print("rewrote RESULTS.md autogen sections")


if __name__ == "__main__":
    main()
