"""Piano-roll rasterization + stochastic augmentation, TPU-first.

Two rasterization paths over the shared note-event contract
(:class:`~midi_vae_tpu.midi.smf.NoteArrays`):

- :func:`rasterize_notes` — jit-compiled, fixed-shape: padded note
  arrays → one [P, T] roll on device via ``segment_max`` over pitch.
  Used by on-device pipelines and vmapped for batches.
- :func:`notes_to_windows` — vectorized numpy: a whole file → stacked
  non-overlapping [P, T] windows, uint8. Runs once per corpus when
  building the RRD cache (``data/sources.py``), so it stays on host.

Augmentation (:func:`augment_pianoroll`) is the on-device "crop / shift
/ velocity" stack from the BASELINE.json north star: random time-crop,
pitch-shift with edge zeroing, velocity scaling — all jit, per-sample
keys, composable under vmap. The reference has no equivalent (it crops
pre-rasterized PNGs with torchvision, data_transformations.py:31-32).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from midi_vae_tpu.midi.smf import MAX_PITCH, NoteArrays

DEFAULT_SECONDS_PER_STEP = 0.05  # 20 columns/sec: 128 steps ≈ 6.4 s of music


# ------------------------------------------------------------- jit rasterizer


@functools.partial(jax.jit, static_argnames=("pitches", "steps"))
def rasterize_notes(
    onset_steps: jax.Array,  # float32 [N] in step units
    duration_steps: jax.Array,  # float32 [N]
    pitch: jax.Array,  # int32 [N]
    velocity: jax.Array,  # float32 [N] in [0, 1]
    valid: jax.Array,  # bool [N] — padding mask
    *,
    pitches: int = MAX_PITCH,
    steps: int = 128,
) -> jax.Array:
    """Padded note arrays → float32 [pitches, steps] roll of velocities.

    Overlapping notes on one pitch keep the louder velocity (max), the
    same resolution rule as the synthetic generator
    (data/synthetic.py). Notes wholly outside [0, steps) vanish.
    """
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, steps), 1)
    start = onset_steps[:, None]
    end = (onset_steps + jnp.maximum(duration_steps, 1.0))[:, None]
    occupied = (cols >= jnp.floor(start)) & (cols < jnp.ceil(end)) & valid[:, None]
    vel_rows = jnp.where(occupied, velocity[:, None], 0.0)  # [N, steps]
    # invalid/padded notes get an out-of-range segment id and fall off
    seg = jnp.where(valid, pitch, pitches)
    roll = jax.ops.segment_max(vel_rows, seg, num_segments=pitches + 1, indices_are_sorted=False)
    return jnp.maximum(roll[:pitches], 0.0)  # empty segments yield -inf


def rasterize_batch(
    onset_steps: jax.Array,
    duration_steps: jax.Array,
    pitch: jax.Array,
    velocity: jax.Array,
    valid: jax.Array,
    *,
    pitches: int = MAX_PITCH,
    steps: int = 128,
) -> jax.Array:
    """vmapped :func:`rasterize_notes` over a leading batch axis → [B, P, T, 1]."""
    fn = functools.partial(rasterize_notes, pitches=pitches, steps=steps)
    return jax.vmap(fn)(onset_steps, duration_steps, pitch, velocity, valid)[..., None]


# --------------------------------------------------------- host corpus path


def notes_to_windows(
    notes: NoteArrays,
    *,
    pitches: int = MAX_PITCH,
    steps: int = 128,
    seconds_per_step: float = DEFAULT_SECONDS_PER_STEP,
    min_notes_per_window: int = 1,
) -> np.ndarray:
    """Rasterize a parsed file into non-overlapping uint8 windows
    [W, pitches, steps, 1] (velocity 0..127 → 0..255, 0 = silence).

    This is the corpus-cache path (host, numpy). Only the KEPT windows
    are ever allocated: with the default ``min_notes_per_window >= 1``
    that is at most one window per note, so memory is bounded by the
    note count — a corrupt or adversarial file declaring a huge
    delta-time cannot make ingest allocate a timeline-sized buffer
    (the previous dense implementation painted the whole timeline:
    one 4-byte varlen at ppq=1 could demand a multi-GB roll).
    ``min_notes_per_window=0`` keeps every window up to the last note's
    end and is budget-capped for the same reason.
    """
    if len(notes) == 0:
        return np.zeros((0, pitches, steps, 1), np.uint8)
    onset = np.asarray(notes.onset, np.float64)
    duration = np.asarray(notes.duration, np.float64)
    if not (np.isfinite(onset).all() and np.isfinite(duration).all()) or bool((onset < 0).any()):
        raise ValueError("note onsets/durations must be finite and onsets non-negative")
    start_col = np.floor(onset / seconds_per_step).astype(np.int64)
    end_col = np.ceil((onset + np.maximum(duration, 1e-9)) / seconds_per_step).astype(np.int64)
    end_col = np.maximum(end_col, start_col + 1)
    vel = np.clip((notes.velocity.astype(np.float64) / 127.0) * 255.0, 0, 255).astype(np.uint8)
    pit = np.clip(notes.pitch, 0, pitches - 1)

    if min_notes_per_window <= 0:
        n_kept = -(-int(end_col.max()) // steps)
    else:
        ids, counts = np.unique(start_col // steps, return_counts=True)
        kept = ids[counts >= min_notes_per_window]
        n_kept = len(kept)
    # budget check BEFORE any window-count-sized allocation (min=0's arange
    # included): the window count derives from tick values an adversarial
    # file controls independently of its byte size
    if n_kept * pitches * steps > 1 << 31:
        raise ValueError(
            f"rasterization would allocate {n_kept} windows of {pitches}x{steps} (>2 GiB); "
            "the file's timeline is implausibly long for its note count"
        )
    if min_notes_per_window <= 0:
        kept = np.arange(n_kept, dtype=np.int64)

    out = np.zeros((len(kept), pitches, steps, 1), np.uint8)
    # each note paints its clipped span into every kept window it overlaps
    lo = np.searchsorted(kept, start_col // steps, side="left")
    hi = np.searchsorted(kept, (end_col - 1) // steps, side="right")
    for s, e, p, v, a, b in zip(start_col, end_col, pit, vel, lo, hi):
        for k in range(a, b):
            ws = int(kept[k]) * steps
            cs, ce = max(int(s) - ws, 0), min(int(e) - ws, steps)
            if cs < ce:
                row = out[k, p, cs:ce, 0]
                np.maximum(row, v, out=row)
    return out


# ------------------------------------------------------------- augmentation


@functools.partial(jax.jit, static_argnames=("max_pitch_shift", "max_time_shift"))
def augment_pianoroll(
    key: jax.Array,
    roll: jax.Array,  # float32 [P, T, 1] in [0, 1]
    *,
    max_pitch_shift: int = 6,
    max_time_shift: int = 16,
    velocity_scale: Tuple[float, float] = (0.7, 1.2),
) -> jax.Array:
    """One sample's stochastic augmentation: pitch-shift (±semitones,
    vacated rows zeroed), circular-free time-shift, velocity scale.

    All shifts use ``jnp.roll`` + edge masking so shapes stay static;
    vmap with per-sample keys for batches (the pipeline does this).
    """
    k_pitch, k_time, k_vel = jax.random.split(key, 3)
    P, T = roll.shape[0], roll.shape[1]

    dp = jax.random.randint(k_pitch, (), -max_pitch_shift, max_pitch_shift + 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (P, 1, 1), 0)
    shifted = jnp.roll(roll, dp, axis=0)
    shifted = jnp.where((rows >= jnp.maximum(dp, 0)) & (rows < P + jnp.minimum(dp, 0)), shifted, 0.0)

    dt = jax.random.randint(k_time, (), -max_time_shift, max_time_shift + 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
    shifted = jnp.roll(shifted, dt, axis=1)
    shifted = jnp.where((cols >= jnp.maximum(dt, 0)) & (cols < T + jnp.minimum(dt, 0)), shifted, 0.0)

    scale = jax.random.uniform(k_vel, (), minval=velocity_scale[0], maxval=velocity_scale[1])
    return jnp.clip(shifted * scale, 0.0, 1.0)


def augment_pianoroll_batch(key: jax.Array, rolls: jax.Array, **kwargs) -> jax.Array:
    """Per-sample-keyed augmentation over a batch [B, P, T, 1]."""
    keys = jax.random.split(key, rolls.shape[0])
    return jax.vmap(lambda k, r: augment_pianoroll(k, r, **kwargs))(keys, rolls)
