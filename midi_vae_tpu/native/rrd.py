"""ctypes bindings + build for the C++ rollloader runtime.

The RRD path replaces the reference's DataLoader worker processes
(train.py:168-191) with a native threaded batch assembler over an
mmap-ed raw tensor file — see ``rollloader.cc`` for the design. The
shared library builds lazily with g++ on first use and is cached next
to the source; everything degrades gracefully (``native_available()``)
when no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional

import numpy as np

from midi_vae_tpu.native._build import load_library

_MAGIC = 0x5252443144564154
_HEADER_BYTES = 40


def _load():
    lib = load_library("rollloader")
    if lib is None or getattr(lib, "_configured", False):
        return lib
    lib._configured = True
    lib.rrd_open.restype = ctypes.c_void_p
    lib.rrd_open.argtypes = [ctypes.c_char_p]
    lib.rrd_info.restype = ctypes.c_int
    lib.rrd_info.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int64)] * 4
    lib.rrd_close.argtypes = [ctypes.c_void_p]
    lib.rrd_loader_create.restype = ctypes.c_void_p
    lib.rrd_loader_create.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.rrd_loader_set_indices.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64), ctypes.c_long]
    lib.rrd_loader_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int]
    lib.rrd_loader_num_batches.restype = ctypes.c_long
    lib.rrd_loader_num_batches.argtypes = [ctypes.c_void_p]
    lib.rrd_loader_next.restype = ctypes.c_long
    lib.rrd_loader_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rrd_loader_destroy.argtypes = [ctypes.c_void_p]
    return lib


def native_available() -> bool:
    return _load() is not None


def write_rrd(images: np.ndarray, labels: np.ndarray, path: str) -> None:
    """Serialize an NHWC uint8 dataset to the RRD raw format."""
    assert images.ndim == 4 and images.dtype == np.uint8
    n, h, w, c = images.shape
    header = np.asarray([_MAGIC, n, h, w, c], dtype=np.uint64)
    with open(path + ".tmp", "wb") as f:
        f.write(header.tobytes())
        f.write(np.ascontiguousarray(images).tobytes())
        f.write(np.ascontiguousarray(labels.astype(np.int64)).tobytes())
    os.rename(path + ".tmp", path)


def read_rrd(path: str, mmap: bool = True):
    """Read an RRD file into ``(images uint8 [N,H,W,C], labels int64 [N])``
    with numpy — no native runtime needed, so RRD doubles as the
    cache/interchange format (e.g. the rasterized-MIDI corpus cache in
    ``data/sources.py``). ``mmap=True`` maps images lazily."""
    header = np.fromfile(path, dtype=np.uint64, count=5)
    if len(header) != 5 or header[0] != _MAGIC:
        raise ValueError(f"not an RRD file: {path}")
    n, h, w, c = (int(v) for v in header[1:])
    image_bytes = n * h * w * c  # python ints: no overflow
    # a truncated/corrupt cache must fail loudly here — np.fromfile would
    # otherwise return SHORT labels silently and desync images from labels
    need = _HEADER_BYTES + image_bytes + n * 8
    actual = os.path.getsize(path)
    if actual < need:
        raise ValueError(
            f"corrupt RRD file {path}: header declares {need} bytes, file has {actual} "
            "(delete the cache and rebuild)"
        )
    if mmap:
        images = np.memmap(path, dtype=np.uint8, mode="r", offset=_HEADER_BYTES, shape=(n, h, w, c))
    else:
        images = np.fromfile(path, dtype=np.uint8, count=image_bytes, offset=_HEADER_BYTES).reshape(n, h, w, c)
    labels = np.fromfile(path, dtype=np.int64, count=n, offset=_HEADER_BYTES + image_bytes)
    return images, labels


class NativeDataset:
    """An RRD file opened through the native runtime (mmap, zero-copy)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native rollloader unavailable (no compiler?)")
        self._lib = lib
        self._handle = lib.rrd_open(path.encode())
        if not self._handle:
            raise FileNotFoundError(f"cannot open RRD file: {path}")
        vals = [ctypes.c_int64() for _ in range(4)]
        lib.rrd_info(self._handle, *[ctypes.byref(v) for v in vals])
        self.n, self.h, self.w, self.c = (v.value for v in vals)

    def __len__(self) -> int:
        return self.n

    def close(self):
        if self._handle:
            self._lib.rrd_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeLoader:
    """Threaded batch iterator over a :class:`NativeDataset`.

    Yields (images uint8 [B,H,W,C], labels int64 [B], n_valid) host
    batches; compose with ``data.pipeline``'s device transforms. Batch
    order and shuffles are deterministic for a given (seed, epoch).
    """

    def __init__(
        self,
        dataset: NativeDataset,
        batch_size: int,
        *,
        drop_last: bool = True,
        n_threads: int = 2,
        prefetch_depth: int = 3,
        indices: Optional[np.ndarray] = None,
        reuse_buffers: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.reuse_buffers = reuse_buffers
        self._lib = dataset._lib
        self._handle = self._lib.rrd_loader_create(
            dataset._handle, batch_size, int(drop_last), n_threads, prefetch_depth
        )
        n = len(dataset)
        if indices is not None:
            self.set_indices(indices)
            n = len(indices)
        self.num_samples_total = n
        self.num_batches = n // batch_size if drop_last else -(-n // batch_size)

    def set_indices(self, indices: np.ndarray) -> None:
        """Replace the row subset served by subsequent epochs (the C side
        copies the array). Updates num_batches/num_samples_total."""
        idx = np.ascontiguousarray(indices, dtype=np.uint64)
        assert idx.size == 0 or int(idx.max()) < len(self.dataset), "split index out of range"
        self._lib.rrd_loader_set_indices(
            self._handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(idx)
        )
        self.num_samples_total = len(idx)
        self.num_batches = (
            len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        )

    def epoch(self, seed: int, shuffle: bool = True) -> Iterator:
        self._lib.rrd_loader_start_epoch(self._handle, seed & 0xFFFF_FFFF_FFFF_FFFF, int(shuffle))
        ds = self.dataset
        images = np.empty((self.batch_size, ds.h, ds.w, ds.c), dtype=np.uint8)
        labels = np.empty(self.batch_size, dtype=np.int64)
        img_ptr = images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        lbl_ptr = labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        while True:
            valid = self._lib.rrd_loader_next(self._handle, img_ptr, lbl_ptr)
            if valid <= 0:
                break
            if self.reuse_buffers:
                yield images, labels, int(valid)
            else:
                # fresh arrays per batch: safe to hand to async consumers
                # (jax.device_put) that may read after the next iteration
                yield images.copy(), labels.copy(), int(valid)

    def close(self):
        if self._handle:
            self._lib.rrd_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
