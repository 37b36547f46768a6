"""Dataset sources: in-memory arrays, PNG folders, MNIST/SVHN files.

TPU-native stance: every dataset materializes as contiguous uint8 NHWC
numpy arrays (the largest reference dataset — 100k 128px grayscale
images, data_generators.py:96-104 — is 1.6 GB, comfortably in host
RAM). Static shapes + whole-array slicing feed the jitted on-device
transform pipeline; there are no per-sample Python transforms and no
worker processes to seed (replaces DataLoader workers,
train.py:168-191).
"""

from __future__ import annotations

import dataclasses
import gzip
import os
import struct
from typing import List, Optional, Tuple

import numpy as np

from midi_vae_tpu.data.transforms import TransformSpec

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".gif", ".webp")


@dataclasses.dataclass
class ArrayDataset:
    """A dataset fully resident in host memory.

    ``transform`` is the stack the loader applies on device — the
    equivalent of the reference attaching torchvision transforms to
    dataset objects (datasets.py:102, 115, 127).
    """

    images: np.ndarray  # uint8 [N, H, W, C]
    labels: np.ndarray  # int64 [N]
    name: str = ""
    transform: Optional[TransformSpec] = None
    class_names: Optional[List[str]] = None

    def __post_init__(self):
        assert self.images.ndim == 4, f"images must be NHWC, got {self.images.shape}"
        assert len(self.images) == len(self.labels)

    def __len__(self) -> int:
        return len(self.images)

    def subset(self, indices: np.ndarray) -> "ArrayDataset":
        return dataclasses.replace(self, images=self.images[indices], labels=self.labels[indices])

    def with_transform(self, transform: TransformSpec) -> "ArrayDataset":
        return dataclasses.replace(self, transform=transform)


# ----------------------------------------------------------------- RRD stream


@dataclasses.dataclass
class RRDStreamDataset:
    """An out-of-core dataset: an RRD file streamed through the native
    threaded loader (``native/rollloader.cc``) instead of resident arrays.

    Carries a row-index subset so train/test splits stay lazy — nothing
    is materialized in host RAM beyond the in-flight batch buffers. The
    pipeline's ``make_loader`` routes this to :class:`NativeDeviceLoader`.
    """

    path: str
    indices: np.ndarray  # int64 row subset of the file
    name: str = ""
    transform: Optional["TransformSpec"] = None
    is_rrd_stream = True

    def __len__(self) -> int:
        return len(self.indices)

    @property
    def labels(self) -> np.ndarray:
        """Labels for this split (reads only the label block — small)."""
        from midi_vae_tpu.native.rrd import read_rrd

        _, labels = read_rrd(self.path, mmap=True)
        return labels[self.indices]

    def subset(self, indices: np.ndarray) -> "RRDStreamDataset":
        return dataclasses.replace(self, indices=self.indices[indices])

    def with_transform(self, transform: "TransformSpec") -> "RRDStreamDataset":
        return dataclasses.replace(self, transform=transform)


def open_rrd_stream(path: str) -> RRDStreamDataset:
    """Open an RRD file as a streaming dataset over all rows."""
    from midi_vae_tpu.native.rrd import read_rrd

    images, _ = read_rrd(path, mmap=True)  # header check; images stay lazy
    return RRDStreamDataset(
        path=path, indices=np.arange(len(images), dtype=np.int64), name=os.path.basename(path)
    )


def rrd_shape(path: str):
    """(n, h, w, c) of an RRD file from its (validated) header."""
    from midi_vae_tpu.native.rrd import read_rrd

    # read_rrd validates magic + declared-vs-actual size; mmap keeps it cheap
    images, _ = read_rrd(path, mmap=True)
    return images.shape


# ---------------------------------------------------------------- ImageFolder


def load_image_folder(root: str) -> ArrayDataset:
    """Load a class-per-subdirectory image tree (torchvision ImageFolder
    semantics: classes = sorted subdir names, files sorted within each;
    reference usage at datasets.py:102,115).

    All images must share one size; they are stacked into a single uint8
    array. A sidecar ``_cache.npz`` is written next to the tree so
    subsequent runs skip PNG decoding.
    """
    from PIL import Image

    cache = os.path.join(root, "_cache.npz")
    if os.path.isfile(cache):
        data = np.load(cache, allow_pickle=False)
        return ArrayDataset(
            images=data["images"],
            labels=data["labels"].astype(np.int64),
            name=os.path.basename(root),
            class_names=[str(c) for c in data["class_names"]],
        )

    classes = sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    if not classes:
        raise FileNotFoundError(f"No class subdirectories under {root}")
    images, labels = [], []
    for idx, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for fname in sorted(os.listdir(cdir)):
            if not fname.lower().endswith(IMG_EXTENSIONS):
                continue
            with Image.open(os.path.join(cdir, fname)) as im:
                arr = np.asarray(im)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            images.append(arr.astype(np.uint8))
            labels.append(idx)
    if not images:
        raise FileNotFoundError(f"No images found under {root}")
    images_arr = np.stack(images)
    labels_arr = np.asarray(labels, dtype=np.int64)
    try:
        np.savez_compressed(cache, images=images_arr, labels=labels_arr, class_names=np.asarray(classes))
    except OSError:
        pass  # read-only dataset dir: skip the cache, stay functional
    return ArrayDataset(images=images_arr, labels=labels_arr, name=os.path.basename(root), class_names=classes)


def write_image_folder(images: np.ndarray, labels: np.ndarray, path: str, label_suffix: str = "_lines") -> None:
    """Export arrays as the reference's PNG class-folder layout
    (``{path}/{k}_lines/image_{i}.png``, data_generators.py:86-93)."""
    from PIL import Image

    os.makedirs(path, exist_ok=True)
    for i, (img, label) in enumerate(zip(images, labels)):
        class_dir = os.path.join(path, f"{label}{label_suffix}")
        os.makedirs(class_dir, exist_ok=True)
        arr = img[..., 0] if (img.ndim == 3 and img.shape[-1] == 1) else img
        Image.fromarray(arr).save(os.path.join(class_dir, f"image_{i + 1}.png"))


# --------------------------------------------------------------- MIDI folder

MIDI_EXTENSIONS = (".mid", ".midi")


def load_midi_folder(
    root: str,
    *,
    pitches: int = 128,
    steps: int = 128,
    seconds_per_step: float = 0.05,
    use_cache: bool = True,
) -> ArrayDataset:
    """Load a tree of .mid files as rasterized piano-roll windows.

    The MIDI ingestion path (BASELINE north star; no reference
    equivalent — the reference consumes pre-rasterized PNGs): each file
    is parsed (native C++ parser when available, ``midi/parse.py``),
    rasterized to velocity piano-rolls, and chopped into
    non-overlapping [pitches, steps] windows. Class subdirectories act
    as labels (ImageFolder semantics); a flat tree gets label 0.

    The rasterized corpus caches to ``_midi_cache.rrd`` next to the
    tree (the native runtime's raw format, ``native/rrd.py``), so
    subsequent runs mmap it directly and can stream it through
    ``NativeLoader`` without re-parsing.
    """
    from midi_vae_tpu.midi.parse import parse_midi
    from midi_vae_tpu.midi.rasterize import notes_to_windows
    from midi_vae_tpu.native.rrd import read_rrd, write_rrd

    # cache key carries every rasterization parameter; a resolution change
    # must miss, never silently return rolls at the wrong time scale
    spc_tag = f"{seconds_per_step:g}".replace(".", "p")
    cache = os.path.join(root, f"_midi_cache_{pitches}x{steps}@{spc_tag}.rrd")
    class_dirs = sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    # the class-tree decision must be identical on the cache-hit and build
    # paths: a non-MIDI subdir next to flat .mid files previously made the
    # cached load report that subdir as class 0 while the cache's labels
    # were built flat (all 0, class "midi")
    classified = bool(class_dirs) and any(
        f.lower().endswith(MIDI_EXTENSIONS) for d in class_dirs for f in os.listdir(os.path.join(root, d))
    )
    if use_cache and os.path.isfile(cache):
        images, labels = read_rrd(cache)
        return ArrayDataset(
            images=np.asarray(images),
            labels=labels,
            name=os.path.basename(root),
            class_names=class_dirs if classified else ["midi"],
        )
    sources: List[Tuple[str, int]] = []  # (file path, label)
    class_names: List[str]
    if classified:
        class_names = class_dirs
        for idx, cls in enumerate(class_dirs):
            cdir = os.path.join(root, cls)
            sources += [
                (os.path.join(cdir, f), idx)
                for f in sorted(os.listdir(cdir))
                if f.lower().endswith(MIDI_EXTENSIONS)
            ]
    else:
        class_names = ["midi"]
        sources = [
            (os.path.join(root, f), 0) for f in sorted(os.listdir(root)) if f.lower().endswith(MIDI_EXTENSIONS)
        ]
    if not sources:
        raise FileNotFoundError(f"No .mid files found under {root}")

    all_windows, all_labels, skipped = [], [], []
    for fpath, label in sources:
        # one corrupt file must not kill a corpus build: both parsers
        # raise ValueError on malformed bytes (midi/smf.py contract)
        try:
            windows = notes_to_windows(
                parse_midi(fpath), pitches=pitches, steps=steps, seconds_per_step=seconds_per_step
            )
        except ValueError as e:
            skipped.append(fpath)
            print(f"skipping unparseable MIDI file {fpath}: {e}")
            continue
        all_windows.append(windows)
        all_labels.append(np.full(len(windows), label, np.int64))
    if not all_windows:
        raise ValueError(f"none of the {len(sources)} .mid files under {root} could be parsed")
    if skipped:
        print(f"MIDI corpus {root}: skipped {len(skipped)}/{len(sources)} unparseable files")
    images_arr = np.concatenate(all_windows)
    labels_arr = np.concatenate(all_labels)
    if use_cache:
        try:
            write_rrd(images_arr, labels_arr, cache)
        except OSError:
            pass  # read-only dataset dir: skip the cache, stay functional
    return ArrayDataset(
        images=images_arr, labels=labels_arr, name=os.path.basename(root), class_names=class_names
    )


# -------------------------------------------------------------------- MNIST


def _read_idx(path: str) -> np.ndarray:
    """Read an IDX-format file (optionally gzipped) — the raw MNIST format."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        magic = struct.unpack(">I", f.read(4))[0]
        ndim = magic & 0xFF
        dims = struct.unpack(">" + "I" * ndim, f.read(4 * ndim))
        data = np.frombuffer(f.read(), dtype=np.uint8)
    return data.reshape(dims)


def load_mnist(root: str, train: bool) -> ArrayDataset:
    """Load MNIST from raw IDX files under ``root`` (reference:
    ``torchvision.datasets.MNIST``, datasets.py:123-137).

    Looks in ``root`` and ``root/MNIST/raw`` for
    ``{train,t10k}-images-idx3-ubyte[.gz]``.
    """
    prefix = "train" if train else "t10k"
    candidates = [root, os.path.join(root, "MNIST", "raw"), os.path.join(root, "mnist")]
    for base in candidates:
        for ext in ("", ".gz"):
            img_path = os.path.join(base, f"{prefix}-images-idx3-ubyte{ext}")
            lbl_path = os.path.join(base, f"{prefix}-labels-idx1-ubyte{ext}")
            if os.path.isfile(img_path) and os.path.isfile(lbl_path):
                images = _read_idx(img_path)[:, :, :, None]  # [N,28,28,1]
                labels = _read_idx(lbl_path).astype(np.int64)
                return ArrayDataset(images=images, labels=labels, name="mnist")
    raise FileNotFoundError(
        f"MNIST IDX files not found under {root} (searched {candidates}). "
        "Place train-images-idx3-ubyte[.gz] etc. there, or pass --allow-download-dataset."
    )


def load_svhn(root: str, split: str) -> ArrayDataset:
    """Load SVHN cropped-digit .mat files (reference:
    ``torchvision.datasets.SVHN``, datasets.py:147-159)."""
    import scipy.io

    path = os.path.join(root, f"{split}_32x32.mat")
    if not os.path.isfile(path):
        raise FileNotFoundError(f"SVHN file not found: {path}")
    mat = scipy.io.loadmat(path)
    images = np.transpose(mat["X"], (3, 0, 1, 2)).astype(np.uint8)  # HWCN → NHWC
    labels = mat["y"].astype(np.int64).squeeze()
    labels[labels == 10] = 0  # SVHN convention: label "10" is digit 0
    return ArrayDataset(images=images, labels=labels, name="svhn")


_MNIST_URLS = [
    "https://ossci-datasets.s3.amazonaws.com/mnist/",
    "http://yann.lecun.com/exdb/mnist/",
]
_MNIST_FILES = [
    "train-images-idx3-ubyte.gz",
    "train-labels-idx1-ubyte.gz",
    "t10k-images-idx3-ubyte.gz",
    "t10k-labels-idx1-ubyte.gz",
]


_SVHN_URL = "http://ufldl.stanford.edu/housenumbers/"
_SVHN_FILES = ["train_32x32.mat", "test_32x32.mat"]


def download_svhn(root: str) -> None:
    """Fetch the SVHN cropped-digit .mat files — capability parity with
    ``torchvision.datasets.SVHN(download=True)`` (reference
    datasets.py:147-159; same upstream URLs torchvision uses).
    Requires network egress."""
    import urllib.request

    os.makedirs(root, exist_ok=True)
    for fname in _SVHN_FILES:
        dest = os.path.join(root, fname)
        if os.path.isfile(dest):
            continue
        tmp = dest + ".tmp"
        try:
            urllib.request.urlretrieve(_SVHN_URL + fname, tmp)
        except OSError as e:  # pragma: no cover - network-dependent
            raise RuntimeError(f"Could not download {fname} from {_SVHN_URL}: {e}")
        os.rename(tmp, dest)


def download_mnist(root: str) -> None:
    """Fetch the MNIST IDX files (capability parity with torchvision's
    ``download=True``, datasets.py:129; requires network egress)."""
    import urllib.request

    raw = os.path.join(root, "MNIST", "raw")
    os.makedirs(raw, exist_ok=True)
    for fname in _MNIST_FILES:
        dest = os.path.join(raw, fname)
        if os.path.isfile(dest):
            continue
        last_err = None
        for base in _MNIST_URLS:
            try:
                # tmp+rename like download_svhn: an interrupted transfer must
                # not leave a truncated file that later runs treat as complete
                urllib.request.urlretrieve(base + fname, dest + ".tmp")
                os.rename(dest + ".tmp", dest)
                break
            except OSError as e:  # pragma: no cover - network-dependent
                last_err = e
        else:  # pragma: no cover
            raise RuntimeError(f"Could not download {fname}: {last_err}")
