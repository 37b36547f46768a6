"""Synthetic MIDI dataset factory — the .mid analog of the reference's
PNG line-image factory (``data_generators.py:8-104``).

Generates random note-event sequences (chord-free random walks over a
pitch range, varying density) and writes them as Standard MIDI Files in
a class-per-subdirectory tree (classes = note-density buckets, like the
reference's line-count classes). The resulting tree feeds
``data/sources.py:load_midi_folder`` → parse → rasterize → RRD cache,
exercising the full MIDI ingestion path end-to-end.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from midi_vae_tpu.midi.smf import NoteArrays, write_smf


def random_notes(
    rng: np.random.Generator,
    n_notes: int,
    *,
    length_seconds: float = 8.0,
    pitch_range: Tuple[int, int] = (21, 109),  # piano compass A0..C8
    duration_range: Tuple[float, float] = (0.1, 1.5),
    velocity_range: Tuple[int, int] = (32, 127),
) -> NoteArrays:
    """Draw a random note-event sequence (uniform onsets, pitches, durations)."""
    onset = np.sort(rng.uniform(0.0, length_seconds, n_notes))
    duration = rng.uniform(*duration_range, n_notes)
    pitch = rng.integers(*pitch_range, n_notes).astype(np.int32)
    velocity = rng.integers(velocity_range[0], velocity_range[1] + 1, n_notes).astype(np.int32)
    return NoteArrays(onset=onset, duration=duration, pitch=pitch, velocity=velocity)


def generate_midi_dataset(
    n_files: int,
    path: str,
    *,
    max_notes: int = 48,
    length_seconds: float = 8.0,
    density_classes: int = 4,
    seed: Optional[int] = 0,
) -> int:
    """Write ``n_files`` random .mid files under ``path`` in density-bucket
    class folders ``{path}/{k}_density/file_{i}.mid``; returns files written.

    Mirrors ``generate_line_images``'s contract (count, path, class
    subdirs, deterministic seed) with MIDI in place of PNGs.
    """
    rng = np.random.default_rng(seed)
    written = 0
    for i in range(n_files):
        bucket = int(rng.integers(0, density_classes))
        lo = 1 + bucket * max_notes // density_classes
        hi = (bucket + 1) * max_notes // density_classes
        n_notes = int(rng.integers(lo, max(hi, lo) + 1))
        notes = random_notes(rng, n_notes, length_seconds=length_seconds)
        class_dir = os.path.join(path, f"{bucket}_density")
        os.makedirs(class_dir, exist_ok=True)
        write_smf(notes, os.path.join(class_dir, f"file_{i + 1}.mid"))
        written += 1
    return written
