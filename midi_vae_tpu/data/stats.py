"""Corpus statistics for loss/initialization auto-configuration.

No reference equivalent — the reference hand-tunes its loss weights
(configs/vae.yaml:20). These helpers measure the one statistic the
sparse-corpus fixes need: the base rate p = mean BCE-target value, used
for

- ``--output-bias-init auto`` → decoder output bias = log(p/(1-p))
  (the decoder *starts* at the corpus mean; see models/vae.py
  ``_logit_bias_init``), and
- ``--bce-pos-weight auto`` → positive-class weight = (1-p)/p
  (balances the two classes' total gradient mass; losses/elbo.py
  ``bce_from_logits``).

Both are the standard reconstruction-side anti-collapse tools for
~98%-empty piano-rolls (RESULTS.md "posterior collapse on sparse MIDI").
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_P_MIN, _P_MAX = 1e-4, 1.0 - 1e-4


def estimate_base_rate(dataset, max_samples: int = 4096, seed: int = 0) -> float:
    """Raw fill rate of a dataset: mean pixel value in [0, 1], from a row sample.

    Deliberately measured BEFORE the normalization shift. Under the
    reference's mean-0.5 normalization the actual BCE targets live in
    [-0.5, 0.5] and their mean is negative on sparse corpora — a regime
    where no finite base-rate logit exists (the per-empty-cell optimum is
    saturated σ→0, which IS the silence attractor). The raw fill rate is
    the statistic both fixes want: σ(log(p/(1-p))) = p starts the decoder
    at the corpus mean instead of at the 0.5 cliff where 98%+ of cells
    emit a coherent "go to zero" gradient, and (1-p)/p re-balances the
    filled cells' share of the total gradient mass.
    """
    rng = np.random.default_rng(seed)
    if getattr(dataset, "is_rrd_stream", False):
        from midi_vae_tpu.native.rrd import read_rrd

        images, _ = read_rrd(dataset.path, mmap=True)
        rows = dataset.indices
        if len(rows) > max_samples:
            rows = rng.choice(rows, size=max_samples, replace=False)
        sample = images[np.sort(rows)]
    else:
        images = dataset.images
        n = len(images)
        if n > max_samples:
            sample = images[np.sort(rng.choice(n, size=max_samples, replace=False))]
        else:
            sample = images
    x = sample.astype(np.float64)
    if sample.dtype == np.uint8:
        x = x / 255.0
    return float(np.clip(x.mean(), _P_MIN, _P_MAX))


def base_rate_logit(p: float) -> float:
    """log(p/(1-p)) — the constant logit whose sigmoid equals the base rate."""
    p = float(np.clip(p, _P_MIN, _P_MAX))
    return float(np.log(p / (1.0 - p)))


def pos_weight_from_base_rate(p: float) -> float:
    """(1-p)/p — equalizes the positive/negative classes' total BCE mass."""
    p = float(np.clip(p, _P_MIN, _P_MAX))
    return float((1.0 - p) / p)


def resolve_auto(value, dataset, what: str, base_rate: Optional[float] = None) -> Optional[float]:
    """Resolve a config value that may be None, a float, or "auto".

    ``what`` selects the auto formula: "bias" → :func:`base_rate_logit`,
    "pos_weight" → :func:`pos_weight_from_base_rate`. Callers resolving
    several autos pass one shared ``base_rate`` measurement so the corpus
    sweep runs once.
    """
    if value is None:
        return None
    if value == "auto":
        p = base_rate if base_rate is not None else estimate_base_rate(dataset)
        out = base_rate_logit(p) if what == "bias" else pos_weight_from_base_rate(p)
        print(f"auto {what}: corpus base rate p={p:.5f} -> {out:.4f}")
        return out
    return float(value)


# ------------------------------------------------------------ pre-flight CLI
#
# ``python -m midi_vae_tpu.data.stats --dataset midi-mycorpus --data-dir /data``
# prints the statistics an operator wants BEFORE committing a training run:
# split sizes, image geometry, class count, and the corpus fill rate with the
# auto-resolved anti-collapse settings. docs/OPERATIONS.md points here from
# the NaN/collapse triage rows.

_SPARSE_WARN = 0.05  # below this fill rate the silence attractor is live


def _describe(name: str, ds) -> None:
    if getattr(ds, "is_rrd_stream", False):
        n = len(ds.indices)
        shape, dtype = "(rrd stream)", "uint8"
    else:
        n = len(ds)
        shape, dtype = "x".join(map(str, ds.images.shape[1:])), str(ds.images.dtype)
    labels = getattr(ds, "labels", None)
    n_classes = len(np.unique(labels)) if labels is not None and len(np.atleast_1d(labels)) else 0
    print(f"  {name:<6} {n:>8} samples  {shape:>12} {dtype}  {n_classes} classes")


def cli(argv=None) -> None:
    import argparse

    from midi_vae_tpu.data.fetch import fetch_dataset

    parser = argparse.ArgumentParser(
        prog="python -m midi_vae_tpu.data.stats",
        description="Corpus pre-flight: split sizes, geometry, fill rate, anti-collapse settings.",
    )
    parser.add_argument("--dataset", required=True, help="dataset name (same values cli.train accepts)")
    parser.add_argument("--data-dir", default=None)
    parser.add_argument("--allow-download-dataset", action="store_true")
    parser.add_argument("--max-samples", type=int, default=4096, help="rows sampled for the fill rate")
    parser.add_argument("--cpu", action="store_true", help="Force the CPU backend (no TPU needed for stats)")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    train, val, test, distinct = fetch_dataset(args.dataset, root=args.data_dir, download=args.allow_download_dataset)
    print(f"dataset {args.dataset} (val==test: {not distinct})")
    for name, ds in (("train", train), ("val", val), ("test", test)):
        _describe(name, ds)

    p = estimate_base_rate(train, max_samples=args.max_samples)
    print(f"fill rate p = {p:.5f}  ->  --output-bias-init auto = {base_rate_logit(p):.4f}, "
          f"--bce-pos-weight auto = {pos_weight_from_base_rate(p):.2f}")
    if p < _SPARSE_WARN:
        print(f"SPARSE corpus (p < {_SPARSE_WARN}): train with the anti-collapse recipe "
              "--bce-targets raw --output-bias-init auto, and watch eval active-units "
              "(benchmarks/RESULTS.md 'Posterior collapse').")


if __name__ == "__main__":
    cli()
