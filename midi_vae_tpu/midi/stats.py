"""Corpus-level musical statistics of binary piano-rolls.

The statistics a musician would notice about a corpus — note density,
pitch-class usage, polyphony, note duration — as normalized histograms,
plus Jensen-Shannon divergence to compare two corpora. These back the
generation-quality dossier (``benchmarks/generation_eval.py``) and the
export-threshold calibrator (:mod:`midi.calibrate`): the round-4 dossier
found generated notes fragmenting to ~4 columns against the corpus's
15.5 because decoder probabilities sag below a fixed export threshold
mid-note, and these histograms are how that is measured and fixed.

Reference: no equivalent — the reference evaluates cell-wise losses only
(``/root/reference/midi_autoencoder/evaluation.py:95-101``) and never
scores what its ``sample`` method generates.
"""

from __future__ import annotations

import numpy as np

#: note-duration histogram bin edges (columns), log-spaced; the last bin
#: absorbs arbitrarily long runs
DUR_BINS = np.array([1, 2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32, 48, 64, 96, 1_000_000])
#: polyphony histogram covers 0..16+ simultaneous pitches
POLY_MAX = 16
#: per-roll density histogram: 1.3%-fill corpora live well under 6%
DENSITY_BINS = np.linspace(0.0, 0.06, 25)

STAT_KEYS = ("density", "pitch_class", "polyphony", "duration")


def run_lengths(rolls: np.ndarray) -> np.ndarray:
    """All note durations (run lengths of 1s along the time axis) in a
    binary [N, H, W] roll stack."""
    n, h, w = rolls.shape
    pad = np.zeros((n, h, 1), rolls.dtype)
    d = np.diff(np.concatenate([pad, rolls, pad], axis=2).astype(np.int8), axis=2)
    starts = np.flatnonzero(d == 1)
    ends = np.flatnonzero(d == -1)
    # row-major flatnonzero: within each (n, h) row, starts/ends alternate
    # in order, so the k-th end closes the k-th start
    return ends - starts


def roll_statistics(rolls: np.ndarray) -> dict:
    """Corpus-level musical statistics of a binary [N, H, W] roll stack.

    Returns normalized histograms (probability vectors) per statistic,
    plus scalar summaries for human-readable tables.
    """
    rolls = np.asarray(rolls, np.uint8)
    n, h, w = rolls.shape
    density = rolls.mean(axis=(1, 2))  # [N]
    # clip into the last bin so off-scale generations still count (np.histogram
    # silently DROPS out-of-range values, which would distort normalization)
    dens_hist, _ = np.histogram(np.clip(density, 0, DENSITY_BINS[-1] - 1e-9), bins=DENSITY_BINS)

    pitch_rows = rolls.sum(axis=(0, 2), dtype=np.int64)  # [H] active cells per pitch
    pc = np.zeros(12, np.int64)
    np.add.at(pc, np.arange(h) % 12, pitch_rows)

    poly = rolls.sum(axis=1)  # [N, W] active pitches per column
    poly_hist, _ = np.histogram(np.minimum(poly, POLY_MAX), bins=np.arange(POLY_MAX + 2))

    durs = run_lengths(rolls)
    dur_hist, _ = np.histogram(durs, bins=DUR_BINS)

    def norm(hist):
        s = hist.sum()
        return (hist / s) if s > 0 else np.full(len(hist), 1.0 / len(hist))

    return {
        "density": norm(dens_hist),
        "pitch_class": norm(pc),
        "polyphony": norm(poly_hist),
        "duration": norm(dur_hist),
        "mean_density": float(density.mean()),
        "mean_polyphony": float(poly.mean()),
        "mean_duration": float(durs.mean()) if len(durs) else 0.0,
        "notes_per_roll": float(len(durs) / max(n, 1)),
    }


def js_divergence(p: np.ndarray, q: np.ndarray) -> float:
    """Jensen-Shannon divergence, base 2 (0 = identical, 1 = disjoint)."""
    p = np.asarray(p, np.float64)
    q = np.asarray(q, np.float64)
    m = 0.5 * (p + q)

    def kl(a, b):
        mask = a > 0
        return float(np.sum(a[mask] * np.log2(a[mask] / b[mask])))

    return 0.5 * kl(p, m) + 0.5 * kl(q, m)


def js_profile(stats: dict, ref: dict) -> dict:
    """Per-statistic JS divergences of one corpus against a reference,
    plus their mean — the dossier's comparison row."""
    out = {f"js_{k}": round(js_divergence(stats[k], ref[k]), 4) for k in STAT_KEYS}
    out["js_mean"] = round(float(np.mean([out[f"js_{k}"] for k in STAT_KEYS])), 4)
    return out
