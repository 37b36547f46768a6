"""Export-threshold calibration: fit the roll→MIDI binarization threshold
to a model checkpoint.

The MIDI export path (:func:`midi.derasterize.roll_to_notes`) turns each
maximal run of above-threshold cells into one note. The round-4
generation dossier measured that a FIXED threshold fragments notes: a
decoder's probabilities sag mid-note (the VQ decoder upsamples each code
cell 8-16x, so probability mass peaks at onsets), and wherever they dip
below the threshold one long note shatters into several short ones —
generated notes averaged ~4 columns against the corpus's 15.5.

The fix is per-checkpoint calibration, not a different constant: sweep
candidate thresholds over the model's OWN reconstructions of real rolls
(where ground truth exists) and pick the threshold whose note-event
statistics (:mod:`midi.stats`) sit closest to the real corpus's, scored
as mean Jensen-Shannon divergence. Reconstructions are the right probe
because they expose exactly the decoder's probability calibration — how
its output mass maps to intended note extents — independent of what the
latent sampler draws.

Used by ``cli/generate.py --export-threshold auto`` (and reusable
against any decoded probabilities). Reference: no equivalent — the
reference has no MIDI export at all.
"""

from __future__ import annotations

import numpy as np

from midi_vae_tpu.midi.stats import STAT_KEYS, js_divergence, roll_statistics

#: default candidate grid: log-spaced through the plausible range of a
#: sigmoid decoder's output; 0.1 (the historical fixed default) included
DEFAULT_GRID = (0.02, 0.03, 0.05, 0.07, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5)


def calibrate_export_threshold(
    recon_probs: np.ndarray,
    target_rolls: np.ndarray,
    thresholds=DEFAULT_GRID,
    target_threshold: float = 0.1,
):
    """Pick the export threshold whose thresholded reconstructions best
    match the targets' note-event statistics.

    Args:
        recon_probs: decoded reconstruction probabilities ``[N, H, W]``
            (raw [0, 1] space — denormalized decoder output).
        target_rolls: the matching real rolls ``[N, H, W]`` in raw space
            ({0, velocity}-valued; binarized at ``target_threshold``,
            which velocities sit far above).
        thresholds: candidate grid to sweep.
        target_threshold: binarization for the real rolls only.

    Returns:
        ``(best_threshold, rows)`` — the argmin-JS threshold and the
        per-candidate score table (list of dicts with ``threshold``,
        ``js_mean``, per-statistic JS, ``mean_duration``,
        ``notes_per_roll``) for logging/inspection.
    """
    recon_probs = np.asarray(recon_probs)
    target_rolls = np.asarray(target_rolls)
    if recon_probs.ndim == 4:  # [N, H, W, 1] channel-last decoder output
        recon_probs = recon_probs[..., 0]
    if target_rolls.ndim == 4:
        target_rolls = target_rolls[..., 0]
    ref = roll_statistics((target_rolls > target_threshold).astype(np.uint8))

    rows = []
    for t in thresholds:
        st = roll_statistics((recon_probs > t).astype(np.uint8))
        js = {f"js_{k}": round(js_divergence(st[k], ref[k]), 4) for k in STAT_KEYS}
        rows.append({
            "threshold": float(t),
            **js,
            "js_mean": round(float(np.mean(list(js.values()))), 4),
            "mean_duration": round(st["mean_duration"], 2),
            "notes_per_roll": round(st["notes_per_roll"], 1),
        })
    best = min(rows, key=lambda r: r["js_mean"])
    return best["threshold"], rows
