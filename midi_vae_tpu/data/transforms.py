"""On-device jit transform stacks (reference: ``data_transformations.py``).

The reference runs PIL/torchvision transforms in host DataLoader worker
processes; here the whole stack — resize, crop, dtype-scale, normalize,
grayscale — is one jitted XLA program applied to uint8 batches *after*
the host→device copy. Raw uint8 crosses PCIe (4× less traffic than
f32), and every transform fuses into the training step's program
(BASELINE north star: "jit-compiled on-device transforms").

Stack parity (``get_transform``, data_transformations.py:14-119):
- ``noaug``: Resize(shortest→S) → RandomCrop(S) (train) / CenterCrop (eval)
  → scale [0,1] → Normalize
- ``midi``: same + Grayscale last
- ``digits``: Resize → CenterCrop → scale → Normalize (both train & eval)

Normalization table matches data_transformations.py:4-9 (mean 0.5 /
std 1.0 — so pixel values land in [-0.5, 0.5]). ``VALID_TRANSFORMS``
gates dataset-specific normalization as at train.py:135-137.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NORMALIZATION = {
    "mnist": ((0.5,), (1.0,)),
    "vae-lines": ((0.5,), (1.0,)),
    "vae-lines-large": ((0.5,), (1.0,)),
    "vae-lines-synthetic": ((0.5,), (1.0,)),
    "vae-lines-large-synthetic": ((0.5,), (1.0,)),
    "pianoroll-synthetic": ((0.5,), (1.0,)),
    "midi-synthetic": ((0.5,), (1.0,)),
    "midi-structured": ((0.5,), (1.0,)),
    "midi-folder": ((0.5,), (1.0,)),
}

VALID_TRANSFORMS = list(NORMALIZATION.keys())

# ITU-R 601 luma weights, as torchvision Grayscale()
_LUMA = (0.2989, 0.587, 0.114)


@dataclasses.dataclass(frozen=True)
class TransformSpec:
    """A static (hashable) description of one transform stack.

    Static so it can be a jit static argument: one compiled program per
    distinct stack, reused across all batches.
    """

    image_size: int = 32
    mean: Tuple[float, ...] = (0.5,)
    std: Tuple[float, ...] = (1.0,)
    random_crop: bool = False  # False → center crop
    grayscale: bool = False
    # MIDI piano-roll augmentation (north star "crop/shift/velocity
    # augment"; midi/rasterize.py) — applied pre-normalization in [0,1]
    pianoroll_augment: bool = False
    max_pitch_shift: int = 6
    max_time_shift: int = 16
    velocity_scale: Tuple[float, float] = (0.7, 1.2)


def get_transform(transform_type: str = "noaug", image_size: int = 32, args: Optional[dict] = None):
    """(train_spec, eval_spec) for a named stack — signature parity with
    data_transformations.py:14."""
    if args is None:
        args = {}
    mean, std = NORMALIZATION[args.get("normalization", "mnist")]
    mean = tuple(args.get("mean", mean))
    std = tuple(args.get("std", std))

    if transform_type == "noaug":
        train = TransformSpec(image_size, mean, std, random_crop=True)
        test = TransformSpec(image_size, mean, std, random_crop=False)
    elif transform_type == "midi":
        train = TransformSpec(image_size, mean, std, random_crop=True, grayscale=True)
        test = TransformSpec(image_size, mean, std, random_crop=False, grayscale=True)
    elif transform_type == "digits":
        # The reference's digits stack center-crops for train as well
        # (data_transformations.py:94-102).
        train = TransformSpec(image_size, mean, std, random_crop=False)
        test = TransformSpec(image_size, mean, std, random_crop=False)
    elif transform_type == "pianoroll":
        # Capability extension (no reference equivalent): stochastic
        # pitch/time-shift + velocity scaling on the roll, then the
        # standard crop/normalize stack.
        train = TransformSpec(image_size, mean, std, random_crop=True, pianoroll_augment=True)
        test = TransformSpec(image_size, mean, std, random_crop=False)
    else:
        raise NotImplementedError(f"Unknown transform type: {transform_type}")
    return train, test


def _resize_shortest(x: jax.Array, target: int) -> jax.Array:
    """Resize so the shortest spatial side equals ``target`` (aspect kept).

    Equivalent of torchvision ``Resize(image_size)``. Bilinear with
    antialiasing (jax.image default for 'linear' downsampling).
    """
    b, h, w, c = x.shape
    if min(h, w) == target:
        return x
    scale = target / min(h, w)
    nh, nw = max(target, round(h * scale)), max(target, round(w * scale))
    return jax.image.resize(x, (b, nh, nw, c), method="linear")


def _center_crop(x: jax.Array, size: int) -> jax.Array:
    _, h, w, _ = x.shape
    top, left = (h - size) // 2, (w - size) // 2
    return x[:, top : top + size, left : left + size, :]


def _random_crop(x: jax.Array, size: int, key: jax.Array) -> jax.Array:
    """Per-sample random square crop (torchvision RandomCrop semantics)."""
    b, h, w, c = x.shape
    if h == size and w == size:
        return x
    tops = jax.random.randint(key, (b,), 0, h - size + 1)
    lefts = jax.random.randint(jax.random.fold_in(key, 1), (b,), 0, w - size + 1)

    def crop_one(img, top, left):
        return jax.lax.dynamic_slice(img, (top, left, 0), (size, size, c))

    return jax.vmap(crop_one)(x, tops, lefts)


@functools.partial(jax.jit, static_argnames=("spec",))
def apply_transform(spec: TransformSpec, batch: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
    """Apply a transform stack to a uint8/float NHWC batch, on device.

    uint8 input is scaled to [0, 1] (torchvision ``ToDtype(float32,
    scale=True)``); float input is assumed already in [0, 1] (the
    on-device synthetic generators emit that directly).
    """
    x = batch
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    else:
        x = x.astype(jnp.float32)

    if spec.pianoroll_augment and key is not None:
        from midi_vae_tpu.midi.rasterize import augment_pianoroll_batch

        x = augment_pianoroll_batch(
            jax.random.fold_in(key, 2),
            x,
            max_pitch_shift=spec.max_pitch_shift,
            max_time_shift=spec.max_time_shift,
            velocity_scale=spec.velocity_scale,
        )

    x = _resize_shortest(x, spec.image_size)
    if spec.random_crop and key is not None:
        x = _random_crop(x, spec.image_size, key)
    else:
        x = _center_crop(x, spec.image_size)

    mean = jnp.asarray(spec.mean, jnp.float32).reshape(1, 1, 1, -1)
    std = jnp.asarray(spec.std, jnp.float32).reshape(1, 1, 1, -1)
    x = (x - mean) / std

    if spec.grayscale and x.shape[-1] == 3:
        # Reference applies Grayscale after Normalize (data_transformations.py:60)
        luma = jnp.asarray(_LUMA, jnp.float32).reshape(1, 1, 1, 3)
        x = jnp.sum(x * luma, axis=-1, keepdims=True)
    return x


def denormalize_with(mean, std, x: jax.Array) -> jax.Array:
    """``x·std + mean`` with per-channel (1,1,1,C) broadcasting — the one
    place the un-normalization layout lives (image logging and the
    raw-target BCE in losses/elbo.py both ride it)."""
    m = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, -1)
    s = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, -1)
    return x * s + m


def denormalize(spec: TransformSpec, x: jax.Array) -> jax.Array:
    """Invert the normalization (for image logging / BCE targets in [0,1])."""
    return denormalize_with(spec.mean, spec.std, x)
