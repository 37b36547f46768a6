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
