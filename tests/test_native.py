"""Native C++ rollloader tests: format roundtrip, determinism, threading, edge cases."""

import numpy as np
import pytest

from midi_vae_tpu.native import NativeDataset, NativeLoader, native_available, write_rrd

pytestmark = pytest.mark.skipif(not native_available(), reason="native rollloader unavailable")


@pytest.fixture()
def rrd_file(tmp_path):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (100, 16, 16, 1)).astype(np.uint8)
    labels = np.arange(100, dtype=np.int64)
    path = str(tmp_path / "data.rrd")
    write_rrd(images, labels, path)
    return path, images, labels


def test_open_info(rrd_file):
    path, images, _ = rrd_file
    ds = NativeDataset(path)
    assert (ds.n, ds.h, ds.w, ds.c) == (100, 16, 16, 1)
    ds.close()


def test_open_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        NativeDataset(str(tmp_path / "nope.rrd"))


def test_open_corrupt_raises(tmp_path):
    path = str(tmp_path / "bad.rrd")
    with open(path, "wb") as f:
        f.write(b"not an rrd file at all..........")
    with pytest.raises(FileNotFoundError):
        NativeDataset(path)


def test_truncated_rrd_rejected_by_both_readers(rrd_file, tmp_path):
    """A truncated cache must fail loudly: the C++ side validates declared
    vs actual bytes (it would SIGBUS on row reads otherwise) and the numpy
    reader raises instead of returning silently short labels."""
    from midi_vae_tpu.native.rrd import read_rrd

    path, _, _ = rrd_file
    data = open(path, "rb").read()
    cut = str(tmp_path / "cut.rrd")
    with open(cut, "wb") as f:
        f.write(data[: len(data) - 64])
    with pytest.raises(FileNotFoundError):
        NativeDataset(cut)
    with pytest.raises(ValueError, match="declares"):
        read_rrd(cut)
    with pytest.raises(ValueError, match="declares"):
        read_rrd(cut, mmap=False)


def test_overflowing_header_dims_rejected(tmp_path):
    """Crafted dims whose byte-size product wraps 64 bits must not pass
    the size check (n*h*w*c ≡ small mod 2^64 → SIGBUS on first read)."""
    from midi_vae_tpu.native.rrd import _MAGIC, read_rrd

    path = str(tmp_path / "wrap.rrd")
    header = np.asarray([_MAGIC, 1 << 32, 1 << 16, 1 << 16, 1], dtype=np.uint64)
    with open(path, "wb") as f:
        f.write(header.tobytes())
        f.write(b"\x00" * 4096)
    with pytest.raises(FileNotFoundError):
        NativeDataset(path)
    with pytest.raises(ValueError):
        read_rrd(path)


def test_unshuffled_epoch_roundtrips_data(rrd_file):
    path, images, labels = rrd_file
    ds = NativeDataset(path)
    loader = NativeLoader(ds, 32, drop_last=False)
    got_images, got_labels = [], []
    for imgs, lbls, valid in loader.epoch(seed=0, shuffle=False):
        got_images.append(imgs[:valid].copy())
        got_labels.append(lbls[:valid].copy())
    out = np.concatenate(got_images)
    np.testing.assert_array_equal(out, images)
    np.testing.assert_array_equal(np.concatenate(got_labels), labels)
    loader.close()
    ds.close()


def test_drop_last_and_padding(rrd_file):
    path, _, _ = rrd_file
    ds = NativeDataset(path)
    dropping = NativeLoader(ds, 32, drop_last=True)
    assert dropping.num_batches == 3
    batches = list(dropping.epoch(seed=1))
    assert len(batches) == 3
    assert all(v == 32 for _, _, v in batches)
    dropping.close()

    padded = NativeLoader(ds, 32, drop_last=False)
    assert padded.num_batches == 4
    batches = list(padded.epoch(seed=1, shuffle=False))
    assert batches[-1][2] == 4  # 100 - 96 valid in final batch
    # pad region zeroed
    assert batches[-1][0][4:].sum() == 0
    padded.close()
    ds.close()


def test_shuffle_deterministic_per_seed(rrd_file):
    path, _, _ = rrd_file
    ds = NativeDataset(path)
    loader = NativeLoader(ds, 50, drop_last=True, n_threads=3)

    def epoch_labels(seed):
        return np.concatenate([lbls[:v].copy() for _, lbls, v in loader.epoch(seed=seed)])

    a, b, c = epoch_labels(7), epoch_labels(7), epoch_labels(8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert sorted(a.tolist()) == list(range(100))  # a permutation, no dupes
    loader.close()
    ds.close()


def test_shuffled_batches_match_source(rrd_file):
    """Every yielded sample is the exact source sample its label names."""
    path, images, _ = rrd_file
    ds = NativeDataset(path)
    loader = NativeLoader(ds, 16, drop_last=False, n_threads=4)
    for imgs, lbls, valid in loader.epoch(seed=3):
        for i in range(valid):
            np.testing.assert_array_equal(imgs[i], images[lbls[i]])
    loader.close()
    ds.close()


def test_multiple_epochs_reuse_loader(rrd_file):
    path, _, _ = rrd_file
    ds = NativeDataset(path)
    loader = NativeLoader(ds, 32)
    for epoch in range(3):
        n = sum(v for _, _, v in loader.epoch(seed=epoch))
        assert n == 96
    loader.close()
    ds.close()


def test_threads_exceed_prefetch_depth(rrd_file):
    """Deadlock regression: n_threads > depth requires ordered slot claims.

    Without them, workers holding later batches can own every buffer while
    the next-to-enqueue batch waits for one (circular wait). Many short
    epochs maximize the chance of hitting the bad interleaving.
    """
    path, _, labels = rrd_file
    ds = NativeDataset(path)
    loader = NativeLoader(ds, 4, drop_last=False, n_threads=8, prefetch_depth=2)
    for epoch in range(20):
        got = np.concatenate([lbls[:v].copy() for _, lbls, v in loader.epoch(seed=epoch)])
        assert sorted(got.tolist()) == labels.tolist()
    loader.close()
    ds.close()


def test_large_thread_count(rrd_file):
    path, _, labels = rrd_file
    ds = NativeDataset(path)
    loader = NativeLoader(ds, 8, drop_last=False, n_threads=8, prefetch_depth=6)
    got = np.concatenate([lbls[:v].copy() for _, lbls, v in loader.epoch(seed=0)])
    assert sorted(got.tolist()) == labels.tolist()
    loader.close()
    ds.close()


def test_index_subset(rrd_file):
    """Split indices restrict and reorder the rows the loader serves."""
    path, images, _ = rrd_file
    ds = NativeDataset(path)
    subset = np.array([5, 3, 50, 99, 7], dtype=np.int64)
    loader = NativeLoader(ds, 2, drop_last=False, indices=subset, reuse_buffers=False)
    assert loader.num_batches == 3
    got = np.concatenate([lbls[:v] for _, lbls, v in loader.epoch(seed=0, shuffle=False)])
    np.testing.assert_array_equal(got, subset)  # labels == row ids in fixture
    # shuffled epochs permute exactly the subset
    got_s = np.concatenate([lbls[:v] for _, lbls, v in loader.epoch(seed=1, shuffle=True)])
    assert sorted(got_s.tolist()) == sorted(subset.tolist())
    loader.close()
    ds.close()


def test_fresh_buffers_are_distinct(rrd_file):
    path, images, _ = rrd_file
    ds = NativeDataset(path)
    loader = NativeLoader(ds, 10, drop_last=True, reuse_buffers=False)
    batches = [imgs for imgs, _, _ in loader.epoch(seed=0, shuffle=False)]
    assert batches[0].ctypes.data != batches[1].ctypes.data
    np.testing.assert_array_equal(batches[0], images[0:10])
    loader.close()
    ds.close()


def test_native_device_loader_end_to_end(rrd_file, tmp_path):
    """RRD stream → NativeDeviceLoader → transformed device batches."""
    from midi_vae_tpu.data.pipeline import make_loader
    from midi_vae_tpu.data.sources import open_rrd_stream
    from midi_vae_tpu.data.transforms import TransformSpec

    path, images, _ = rrd_file
    stream = open_rrd_stream(path).with_transform(TransformSpec(image_size=16))
    loader = make_loader(stream, 32, train=True, seed=0)
    n = 0
    for batch in loader.epoch(1):
        assert batch.x.shape == (32, 16, 16, 1)
        assert batch.mask.sum() == 32
        n += 1
    assert n == len(loader) == 3
    # deterministic across epochs with the same seed
    a = np.asarray(next(iter(loader.epoch(1))).y)
    b = np.asarray(next(iter(loader.epoch(1))).y)
    np.testing.assert_array_equal(a, b)
    loader.close()


def test_train_on_rrd_stream(tmp_path):
    """Full training run with the out-of-core rrd: dataset path."""
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    rng = np.random.default_rng(1)
    images = (rng.uniform(size=(300, 32, 32, 1)) > 0.8).astype(np.uint8) * 255
    labels = np.zeros(300, np.int64)
    path = str(tmp_path / "train.rrd")
    write_rrd(images, labels, path)

    config = TrainConfig(
        dataset_name=f"rrd:{path}",
        transform_type="noaug",
        image_size=32,
        arch="MLPVAE",
        n_features=8,
        hidden_dims=(64,),
        epochs=1,
        batch_size_per_device=16,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "models"),
        log_images=False,
    )
    results = run(config)
    assert np.isfinite(results["train"]["loss"])
    assert results["final_test"]["count"] == 60  # 20% of 300
    assert results["n_samples_seen"] == results["total_step"] * 16


import contextlib


@contextlib.contextmanager
def _fake_process(n_proc, rank):
    """Simulate a multi-host rank: patch jax.process_count/index for the
    loader's construction and iteration (put_sharded stays on the
    device_put path because no NamedSharding is used here)."""
    import unittest.mock as mock

    import jax

    with mock.patch.object(jax, "process_count", lambda: n_proc), mock.patch.object(
        jax, "process_index", lambda: rank
    ):
        yield


def test_multiproc_slices_cover_global_batches(rrd_file):
    """Simulated 4-host NativeDeviceLoader: per-host windows reassemble into
    exactly the global batches a single host would serve (same seed), and
    every host emits the same number of batches (incl. all-pad tails)."""
    from midi_vae_tpu.data.pipeline import NativeDeviceLoader
    from midi_vae_tpu.data.sources import open_rrd_stream

    path, images, labels = rrd_file
    stream = open_rrd_stream(path)  # 100 rows
    B, n_proc = 40, 4
    lbs = B // n_proc

    per_host = []
    for rank in range(n_proc):
        with _fake_process(n_proc, rank):
            loader = NativeDeviceLoader(stream, B, train=False, seed=0)
            got = [(np.asarray(b.y), int(np.asarray(b.mask).sum())) for b in loader.epoch(1)]
        per_host.append(got)
        loader.close()

    n_batches = len(per_host[0])
    assert all(len(h) == n_batches == 3 for h in per_host)  # 100/40 → 3 (padded)
    for b in range(n_batches):
        rows = np.concatenate([per_host[r][b][0][: per_host[r][b][1]] for r in range(n_proc)])
        expect = labels[b * B : (b + 1) * B]
        np.testing.assert_array_equal(np.sort(rows), np.sort(expect))
    # final global batch: 100-80=20 valid → hosts get 10,10,0,0
    assert [per_host[r][2][1] for r in range(n_proc)] == [10, 10, 0, 0]


def test_multiproc_train_shuffle_consistent(rrd_file):
    """Simulated 2-host train epochs: both hosts derive the same global
    order, and their windows partition each global batch."""
    from midi_vae_tpu.data.pipeline import NativeDeviceLoader
    from midi_vae_tpu.data.sources import open_rrd_stream

    path, _, labels = rrd_file
    stream = open_rrd_stream(path)
    B, n_proc = 32, 2
    hosts = []
    for rank in range(n_proc):
        with _fake_process(n_proc, rank):
            loader = NativeDeviceLoader(stream, B, train=True, seed=7)
            hosts.append([np.asarray(b.y).copy() for b in loader.epoch(3)])
        loader.close()
    all_rows = np.concatenate([np.concatenate(h) for h in hosts])
    assert len(all_rows) == 3 * B  # 100//32 = 3 full global batches
    assert len(np.unique(all_rows)) == 3 * B  # a permutation slice — no dupes
