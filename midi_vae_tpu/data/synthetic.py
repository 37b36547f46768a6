"""Synthetic line-image factories (reference: ``data_generators.py:8-104``).

Two implementations of the same capability:

- :func:`generate_line_images` — host/numpy, array-in-memory analogue of
  the reference's PNG-writing generator (same image semantics: 1..max_lines
  random horizontal/vertical lines, optional random width, optional
  partial length, duplicate filtering, class = line count). Use
  :func:`midi_vae_tpu.data.sources.write_image_folder` to export PNG
  folders identical in layout to the reference's output.
- :func:`make_lines_batch` — fully on-device, jit-able batch generator.
  Rasterizes with broadcasted-iota masks (no scatter, no host traffic),
  so synthetic training data costs no HBM bandwidth from the host —
  the TPU-native replacement for the PNG round-trip (SURVEY §3.5).

Deviations from the reference, deliberate:
- the reference reassigns its ``line_width`` argument after the first
  random draw (data_generators.py:52), so "random width" is only random
  once per run; here every line draws its own width in [1, 5].
- duplicate filtering drops duplicates but tops the set back up so
  exactly ``num_images`` are returned (the reference silently returns
  fewer, data_generators.py:80-84). When the UNIQUE-image space itself
  is smaller than ``num_images`` (tiny canvas, few line positions), the
  attempt budget runs out and a warning reports the shortfall — unlike
  the reference, which stays silent.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _draw_line(img: np.ndarray, rng: np.random.Generator, line_width: int, full_length: bool) -> None:
    height, width = img.shape
    is_vertical = bool(rng.integers(0, 2))
    w = int(rng.integers(1, 6)) if line_width == 0 else line_width
    if is_vertical:
        x = int(rng.integers(0, width))
        if full_length:
            start_y, end_y = 0, height
        else:
            start_y = int(rng.integers(0, height))
            end_y = int(rng.integers(start_y, height))
        img[start_y:end_y, max(0, x - w // 2) : min(width, x + w // 2 + 1)] = 255
    else:
        y = int(rng.integers(0, height))
        if full_length:
            start_x, end_x = 0, width
        else:
            start_x = int(rng.integers(0, width))
            end_x = int(rng.integers(start_x, width))
        img[max(0, y - w // 2) : min(height, y + w // 2 + 1), start_x:end_x] = 255


def generate_line_images(
    num_images: int,
    img_size: Tuple[int, int] = (28, 28),
    max_lines: int = 2,
    line_width: int = 2,
    full_length: bool = True,
    filter_duplicates: bool = True,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Generate a line-image dataset in memory.

    Returns
    -------
    images : uint8 [N, H, W] in {0, 255}
    labels : int64 [N], the line count per image (the reference's class
        folder ``{k}_lines``, data_generators.py:86-88)
    """
    rng = np.random.default_rng(seed)
    height, width = img_size
    images, labels = [], []
    seen = set()
    attempts = 0
    max_attempts = num_images * 20
    while len(images) < num_images and attempts < max_attempts:
        attempts += 1
        img = np.zeros((height, width), dtype=np.uint8)
        num_lines = int(rng.integers(1, max_lines + 1))
        for _ in range(num_lines):
            _draw_line(img, rng, line_width, full_length)
        if filter_duplicates:
            fingerprint = img.tobytes()
            if fingerprint in seen:
                continue
            seen.add(fingerprint)
        images.append(img)
        labels.append(num_lines)
    if len(images) < num_images:
        import warnings

        warnings.warn(
            f"generate_line_images: unique-image space exhausted at {len(images)}/"
            f"{num_images} after {attempts} attempts; returning the smaller set",
            UserWarning,
            stacklevel=2,
        )
    if not images:  # num_images == 0: np.stack rejects an empty list
        return np.zeros((0, height, width), np.uint8), np.zeros(0, np.int64)
    return np.stack(images), np.asarray(labels, dtype=np.int64)


@functools.partial(jax.jit, static_argnames=("batch_size", "height", "width", "max_lines", "line_width", "full_length"))
def make_lines_batch(
    key: jax.Array,
    batch_size: int,
    height: int = 128,
    width: int = 128,
    max_lines: int = 20,
    line_width: int = 0,
    full_length: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """On-device synthetic line batch: float32 [B, H, W, 1] in {0, 1} + line counts.

    One fused XLA program: all randomness from the threaded key, lines
    rasterized as iota-mask comparisons OR-reduced over ``max_lines``
    slots. Static shapes, no data-dependent control flow.
    """
    k_count, k_vert, k_pos, k_width, k_a, k_b = jax.random.split(key, 6)
    B, L = batch_size, max_lines

    num_lines = jax.random.randint(k_count, (B, 1), 1, max_lines + 1)  # [B,1]
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    active = slot < num_lines  # [B,L]

    vertical = jax.random.bernoulli(k_vert, 0.5, (B, L))
    # position along the line's normal axis; sample in the larger range and
    # mod by the per-orientation extent to stay uniform per axis
    pos_v = jax.random.randint(k_pos, (B, L), 0, width)
    pos_h = jax.random.randint(jax.random.fold_in(k_pos, 1), (B, L), 0, height)
    if line_width == 0:
        w = jax.random.randint(k_width, (B, L), 1, 6)
    else:
        w = jnp.full((B, L), line_width, jnp.int32)

    if full_length:
        start_v = jnp.zeros((B, L), jnp.int32)
        end_v = jnp.full((B, L), height, jnp.int32)
        start_h = jnp.zeros((B, L), jnp.int32)
        end_h = jnp.full((B, L), width, jnp.int32)
    else:
        start_v = jax.random.randint(k_a, (B, L), 0, height)
        end_v = start_v + jax.random.randint(k_b, (B, L), 0, height) % jnp.maximum(height - start_v, 1)
        start_h = jax.random.randint(jax.random.fold_in(k_a, 1), (B, L), 0, width)
        end_h = start_h + jax.random.randint(jax.random.fold_in(k_b, 1), (B, L), 0, width) % jnp.maximum(
            width - start_h, 1
        )

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, height, 1), 2)  # [1,1,H,1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, width), 3)  # [1,1,1,W]

    def band(center, w_):
        lo = (center - w_ // 2)[:, :, None, None]
        hi = (center + w_ // 2 + 1)[:, :, None, None]
        return lo, hi

    vlo, vhi = band(pos_v, w)
    mask_v = (cols >= vlo) & (cols < vhi) & (rows >= start_v[:, :, None, None]) & (rows < end_v[:, :, None, None])
    hlo, hhi = band(pos_h, w)
    mask_h = (rows >= hlo) & (rows < hhi) & (cols >= start_h[:, :, None, None]) & (cols < end_h[:, :, None, None])

    line_mask = jnp.where(vertical[:, :, None, None], mask_v, mask_h) & active[:, :, None, None]
    img = jnp.any(line_mask, axis=1).astype(jnp.float32)  # [B,H,W]
    return img[..., None], num_lines[:, 0]


@functools.partial(
    jax.jit, static_argnames=("batch_size", "pitches", "steps", "max_notes", "max_duration")
)
def make_pianoroll_batch(
    key: jax.Array,
    batch_size: int,
    pitches: int = 128,
    steps: int = 128,
    max_notes: int = 24,
    max_duration: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """On-device synthetic piano-roll batch: float32 [B, P, T, 1] velocities in [0, 1].

    Capability extension (BASELINE.json north star "MIDI piano-roll"
    data): random note events (pitch, onset, duration, velocity)
    rasterized as horizontal bars, the image-space shape real rasterized
    MIDI takes in the ``sageev*`` datasets. Returns note counts as labels.
    """
    k_count, k_pitch, k_onset, k_dur, k_vel = jax.random.split(key, 5)
    B, N = batch_size, max_notes

    num_notes = jax.random.randint(k_count, (B, 1), 1, max_notes + 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    active = slot < num_notes

    pitch = jax.random.randint(k_pitch, (B, N), 0, pitches)
    onset = jax.random.randint(k_onset, (B, N), 0, steps)
    duration = jax.random.randint(k_dur, (B, N), 1, max_duration + 1)
    velocity = jax.random.uniform(k_vel, (B, N), minval=0.25, maxval=1.0)

    # Rasterize via per-sample segment_max over the pitch axis: build each
    # note's [T] time-profile (a [B, N, T] tensor — N·T, small) and
    # max-scatter rows into their pitch bins. The naive formulation — a
    # broadcast [B, N, P, T] select + max-reduce — is bitwise-identical
    # but VPU-compute-bound on N·P·T elements; this one touches N·T + P·T
    # and measured 2.9x faster on the TPU (round-3 backward_profile work:
    # the generator was ~2.2 ms of the 10.8 ms bench step).
    tcols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, steps), 2)  # [1,1,T]
    tmask = (
        (tcols >= onset[..., None]) & (tcols < (onset + duration)[..., None]) & active[..., None]
    )
    vals = jnp.where(tmask, velocity[..., None], 0.0)  # [B,N,T]

    def per_sample(v, p):
        return jax.ops.segment_max(v, p, num_segments=pitches)  # [P,T]

    # empty pitch bins come back -inf from segment_max; clamp to the
    # zero background the select+max formulation produces
    roll = jnp.maximum(jax.vmap(per_sample)(vals, pitch), 0.0)
    return roll[..., None], num_notes[:, 0]
