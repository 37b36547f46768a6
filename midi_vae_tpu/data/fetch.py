"""Dataset fetching and partition handling (reference: ``datasets.py:65-281``).

Same contract as the reference's ``fetch_dataset``: returns
``(train, val, test, distinct_val_test)`` with

- folder datasets (``sageev*``, ``vae-lines*``) split 80/20 train/test
  (datasets.py:97-121),
- MNIST/SVHN with native train/test partitions (datasets.py:123-159),
- val = test when not prototyping (datasets.py:236-240),
- prototyping: val carved from train via K-fold, with the val copy using
  eval transforms (datasets.py:241-274),

plus in-memory ``*-synthetic`` variants that need no data on disk.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

from midi_vae_tpu.data.registry import TRAIN_TEST_RATIO
from midi_vae_tpu.data.sources import ArrayDataset, download_mnist, load_image_folder, load_mnist, load_svhn
from midi_vae_tpu.data.splits import create_train_val_split, random_train_test_split
from midi_vae_tpu.data.synthetic import generate_line_images
from midi_vae_tpu.data.transforms import TransformSpec

# Size of generated in-memory synthetic datasets (train+test pool).
# vae-lines-synthetic is capped by the unique-image space of 28px
# full-length lines (~1.6k distinct images under dedupe).
SYNTHETIC_SIZES = {
    "vae-lines-synthetic": 1024,
    "vae-lines-large-synthetic": 4096,
    "pianoroll-synthetic": 4096,
    "midi-synthetic": 512,  # .mid files, each yielding 1-2 training windows
    # Dense variant: ~8.5% roll fill vs ~1.3% — the corpus where the
    # folded family keeps full latent health (RESULTS.md "posterior
    # collapse on sparse MIDI": the collapse trigger is sparsity)
    "midi-synthetic-dense": 512,
    # Tonal/metric/phrased corpus (midi/factory.py structured_notes):
    # keys+scales, chord progressions on a bar grid, small-step melodies,
    # phrase repeats — the corpus whose second-order statistics
    # (midi/stats.py ioi/pitch_interval/scale_consistency) can actually
    # fail a broken generator.
    "midi-structured": 512,
}


def _synthetic_dataset(dataset: str, seed: int = 0) -> ArrayDataset:
    n = SYNTHETIC_SIZES[dataset]
    if dataset == "vae-lines-synthetic":
        images, labels = generate_line_images(n, img_size=(28, 28), max_lines=2, line_width=2, seed=seed)
    elif dataset == "vae-lines-large-synthetic":
        images, labels = generate_line_images(
            n, img_size=(128, 128), max_lines=20, line_width=0, full_length=False, seed=seed
        )
    elif dataset in ("midi-synthetic", "midi-synthetic-dense", "midi-structured"):
        # Full MIDI ingestion exercised end-to-end: write a synthetic
        # .mid corpus to a per-seed temp tree, then parse + rasterize it
        # through the real folder path (factory → SMF → parser → windows).
        # The -dense variant raises max_notes 48 → 384 (~8.5% roll fill);
        # -structured swaps the note soup for the tonal/metric generator.
        import tempfile

        from midi_vae_tpu.data.sources import load_midi_folder
        from midi_vae_tpu.midi.factory import generate_midi_dataset

        max_notes = 384 if dataset.endswith("-dense") else 48
        style = "structured" if dataset.endswith("-structured") else "random"
        # generate into a private tmp dir, then atomic-rename: a crashed or
        # concurrent generator can never leave a half-corpus that later runs
        # silently mistake for complete
        corpus = os.path.join(
            tempfile.gettempdir(),
            f"midi_vae_tpu_synth_{n}files_{seed}_structured" if style == "structured"
            else f"midi_vae_tpu_synth_{n}files_{seed}_n{max_notes}"
            if max_notes != 48 else f"midi_vae_tpu_synth_{n}files_{seed}"
        )
        if not os.path.isdir(corpus):
            staging = tempfile.mkdtemp(prefix=f"midi_vae_tpu_synth_{seed}_", dir=tempfile.gettempdir())
            generate_midi_dataset(n, staging, seed=seed, max_notes=max_notes, style=style)
            try:
                os.rename(staging, corpus)
            except OSError:  # lost the race: another process finished first
                import shutil

                shutil.rmtree(staging, ignore_errors=True)
        ds = load_midi_folder(corpus)
        images, labels = ds.images, ds.labels
    elif dataset == "pianoroll-synthetic":
        # Host-side materialization of the on-device generator, for the
        # disk-free piano-roll workflow.
        import jax
        import numpy as np

        from midi_vae_tpu.data.synthetic import make_pianoroll_batch

        rolls, counts = make_pianoroll_batch(jax.random.PRNGKey(seed), n)
        images = (np.asarray(rolls) * 255).astype("uint8")
        labels = np.asarray(counts, dtype="int64")
    else:
        raise ValueError(dataset)
    if images.ndim == 3:
        images = images[:, :, :, None]
    return ArrayDataset(images=images, labels=labels, name=dataset)


def fetch_image_dataset(
    dataset: str,
    root: Optional[str] = None,
    transform_train: Optional[TransformSpec] = None,
    transform_eval: Optional[TransformSpec] = None,
    download: bool = False,
    split_seed: int = 0,
) -> Tuple[ArrayDataset, Optional[ArrayDataset], ArrayDataset]:
    """(train, val-or-None, test) for a dataset name (datasets.py:65-164).

    ``split_seed`` pins the 80/20 folder split (the reference's
    ``random_split`` draws from ambient global RNG; we make it explicit).
    """
    root = root or os.environ.get("MIDI_VAE_DATA_DIR", os.path.expanduser("~/Datasets"))

    if dataset in SYNTHETIC_SIZES:
        full = _synthetic_dataset(dataset)
        train_idx, test_idx = random_train_test_split(len(full), TRAIN_TEST_RATIO, seed=split_seed)
        dataset_train = full.subset(train_idx).with_transform(transform_train)
        dataset_test = full.subset(test_idx).with_transform(transform_eval)
        dataset_val = None
    elif dataset.startswith("sageev") or dataset.startswith("vae-lines"):
        full = load_image_folder(os.path.join(root, dataset))
        train_idx, test_idx = random_train_test_split(len(full), TRAIN_TEST_RATIO, seed=split_seed)
        dataset_train = full.subset(train_idx).with_transform(transform_train)
        dataset_test = full.subset(test_idx).with_transform(transform_eval)
        dataset_val = None
    elif dataset.startswith("rrd:"):
        # Out-of-core RRD stream: splits stay lazy index subsets; batches
        # are gathered by the native threaded loader at train time.
        from midi_vae_tpu.data.sources import open_rrd_stream

        full = open_rrd_stream(dataset[4:])
        train_idx, test_idx = random_train_test_split(len(full), TRAIN_TEST_RATIO, seed=split_seed)
        dataset_train = full.subset(train_idx).with_transform(transform_train)
        dataset_test = full.subset(test_idx).with_transform(transform_eval)
        dataset_val = None
    elif dataset.startswith("midi"):
        # A folder of .mid files: parse + rasterize (data/sources.py),
        # then the same 80/20 folder-split contract as sageev*.
        from midi_vae_tpu.data.sources import load_midi_folder

        full = load_midi_folder(os.path.join(root, dataset))
        train_idx, test_idx = random_train_test_split(len(full), TRAIN_TEST_RATIO, seed=split_seed)
        dataset_train = full.subset(train_idx).with_transform(transform_train)
        dataset_test = full.subset(test_idx).with_transform(transform_eval)
        dataset_val = None
    elif dataset == "mnist":
        try:
            dataset_train = load_mnist(root, train=True)
        except FileNotFoundError:
            if not download:
                raise
            download_mnist(root)
            dataset_train = load_mnist(root, train=True)
        dataset_train = dataset_train.with_transform(transform_train)
        dataset_test = load_mnist(root, train=False).with_transform(transform_eval)
        dataset_val = None
    elif dataset == "svhn":
        svhn_root = os.path.join(root, dataset)
        try:
            dataset_train = load_svhn(svhn_root, "train")
        except FileNotFoundError:
            if not download:
                raise
            from midi_vae_tpu.data.sources import download_svhn

            download_svhn(svhn_root)
            dataset_train = load_svhn(svhn_root, "train")
        dataset_train = dataset_train.with_transform(transform_train)
        dataset_test = load_svhn(svhn_root, "test").with_transform(transform_eval)
        dataset_val = None
    else:
        raise ValueError("Unrecognised dataset: {}".format(dataset))

    return dataset_train, dataset_val, dataset_test


def fetch_dataset(
    dataset: str,
    root: Optional[str] = None,
    prototyping: bool = False,
    transform_train: Optional[TransformSpec] = None,
    transform_eval: Optional[TransformSpec] = None,
    protoval_split_rate: float = 0.1,
    protoval_split_id: int = 0,
    download: bool = False,
    split_seed: int = 0,
) -> Tuple[ArrayDataset, ArrayDataset, ArrayDataset, bool]:
    """(train, val, test, distinct_val_test) — contract of datasets.py:167-281."""
    dataset_train, dataset_val, dataset_test = fetch_image_dataset(
        dataset,
        root=root,
        transform_train=transform_train,
        transform_eval=transform_eval,
        download=download,
        split_seed=split_seed,
    )

    if dataset_val is not None:
        distinct_val_test = True
    elif not prototyping:
        dataset_val = dataset_test
        distinct_val_test = False
    else:
        if isinstance(protoval_split_rate, str):
            if protoval_split_rate == "auto":
                # val sized to match test (datasets.py:261-264)
                protoval_split_rate = len(dataset_test) / len(dataset_train)
            else:
                raise ValueError(f"Unsupported protoval_split_rate: {protoval_split_rate}")
        labels = dataset_train.labels if dataset_train.labels is not None else None
        train_idx, val_idx = create_train_val_split(
            len(dataset_train),
            labels=labels,
            split_rate=protoval_split_rate,
            split_id=protoval_split_id,
        )
        # val is the same samples with the *eval* transform (datasets.py:250-257)
        dataset_val = dataset_train.subset(val_idx).with_transform(transform_eval)
        dataset_train = dataset_train.subset(train_idx)
        distinct_val_test = True

    return dataset_train, dataset_val, dataset_test, distinct_val_test
