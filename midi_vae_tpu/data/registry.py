"""Dataset registry (reference: ``midi_autoencoder/datasets.py:17-62``).

Maps dataset names to (num_classes, img_size, num_channels). Extends the
reference table with ``*-synthetic`` variants that generate their data
in memory (no disk round-trip) — the TPU-native path for the line/
piano-roll factories (SURVEY §3.5: "can generate on-device instead of
PNG round-trip").
"""

from __future__ import annotations

TRAIN_TEST_RATIO = 0.8  # reference: datasets.py:14


def image_dataset_sizes(dataset: str):
    """(num_classes, img_size, num_channels) for a dataset name.

    ``num_classes == -1`` means "unlabeled/by-folder" as in the reference.
    """
    if dataset.startswith("sageev"):
        return -1, 128, 1
    if dataset in ("vae-lines", "vae-lines-synthetic"):
        return -1, 28, 1
    if dataset in ("vae-lines-large", "vae-lines-large-synthetic"):
        return -1, 128, 1
    if dataset == "pianoroll-synthetic":
        # On-device synthetic piano-rolls (capability extension; no
        # reference equivalent — BASELINE.json north star).
        return -1, 128, 1
    if dataset.startswith("midi"):
        # Real MIDI ingestion: .mid files parsed (native/midiparse.cc)
        # and rasterized to 128-pitch rolls (midi/rasterize.py). Any
        # ``midi*`` name maps to a folder of .mid files under the data
        # root; ``midi-synthetic`` generates its corpus in a temp dir.
        return -1, 128, 1
    if dataset.startswith("rrd:"):
        # Out-of-core raw-tensor stream (native/rollloader.cc): the name
        # carries the file path; shape comes from the RRD header.
        from midi_vae_tpu.data.sources import rrd_shape

        _, h, w, c = rrd_shape(dataset[4:])
        return -1, min(h, w), c
    if dataset == "mnist":
        return 10, 28, 1
    if dataset == "svhn":
        return 10, 32, 3
    raise ValueError("Unrecognised dataset: {}".format(dataset))
