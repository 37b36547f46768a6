"""Data layer tests: synthetic generators, transforms, splits, fetch, pipeline."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midi_vae_tpu.data.fetch import fetch_dataset
from midi_vae_tpu.data.pipeline import DeviceLoader
from midi_vae_tpu.data.registry import image_dataset_sizes
from midi_vae_tpu.data.sources import ArrayDataset, load_image_folder, write_image_folder
from midi_vae_tpu.data.splits import create_train_val_split, random_train_test_split
from midi_vae_tpu.data.synthetic import generate_line_images, make_lines_batch, make_pianoroll_batch
from midi_vae_tpu.data.transforms import TransformSpec, apply_transform, denormalize, get_transform


class TestRegistry:
    def test_reference_table(self):
        """Parity with datasets.py:17-62."""
        assert image_dataset_sizes("sageev-midi") == (-1, 128, 1)
        assert image_dataset_sizes("vae-lines") == (-1, 28, 1)
        assert image_dataset_sizes("vae-lines-large") == (-1, 128, 1)
        assert image_dataset_sizes("mnist") == (10, 28, 1)
        assert image_dataset_sizes("svhn") == (10, 32, 3)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            image_dataset_sizes("bogus")


class TestSynthetic:
    def test_host_generator_shapes_and_values(self):
        images, labels = generate_line_images(100, img_size=(28, 28), max_lines=2, line_width=2, seed=0)
        assert images.shape == (100, 28, 28)
        assert images.dtype == np.uint8
        assert set(np.unique(images)) <= {0, 255}
        assert labels.min() >= 1 and labels.max() <= 2
        # full-length default: every image has at least one full row or column
        img = images[0]
        assert (img.sum(axis=0) == 255 * 28).any() or (img.sum(axis=1) == 255 * 28).any()

    def test_exhausted_unique_space_warns_not_silent(self):
        """A tiny canvas can't supply 5000 unique images — the shortfall is
        reported (the reference returns fewer silently)."""
        with pytest.warns(UserWarning, match="unique-image space exhausted"):
            images, labels = generate_line_images(
                5000, img_size=(4, 4), max_lines=1, line_width=1, seed=0
            )
        assert 0 < len(images) < 5000
        assert len(images) == len(labels)
        # num_images=0 returns well-formed empties (np.stack rejects [])
        e_img, e_lbl = generate_line_images(0, img_size=(4, 4))
        assert e_img.shape == (0, 4, 4) and e_lbl.shape == (0,)

    def test_host_generator_deterministic(self):
        a, _ = generate_line_images(50, seed=3)
        b, _ = generate_line_images(50, seed=3)
        c, _ = generate_line_images(50, seed=4)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_host_generator_no_duplicates(self):
        images, _ = generate_line_images(200, img_size=(28, 28), max_lines=2, line_width=1, seed=0)
        fingerprints = {img.tobytes() for img in images}
        assert len(fingerprints) == len(images)

    def test_device_generator(self):
        imgs, counts = make_lines_batch(jax.random.PRNGKey(0), 16, height=32, width=32, max_lines=3, line_width=2)
        assert imgs.shape == (16, 32, 32, 1)
        assert set(np.unique(np.asarray(imgs))) <= {0.0, 1.0}
        assert counts.shape == (16,)
        assert int(counts.min()) >= 1 and int(counts.max()) <= 3
        # deterministic under key
        imgs2, _ = make_lines_batch(jax.random.PRNGKey(0), 16, height=32, width=32, max_lines=3, line_width=2)
        np.testing.assert_array_equal(np.asarray(imgs), np.asarray(imgs2))

    def test_device_pianoroll(self):
        rolls, counts = make_pianoroll_batch(jax.random.PRNGKey(1), 8, pitches=64, steps=64, max_notes=10)
        assert rolls.shape == (8, 64, 64, 1)
        r = np.asarray(rolls)
        assert r.min() >= 0.0 and r.max() <= 1.0
        assert (r > 0).any()
        # notes are horizontal bars: every nonzero row segment is contiguous in time
        assert int(counts.max()) <= 10


class TestTransforms:
    def test_get_transform_stacks(self):
        """Stack semantics parity with data_transformations.py:23-114."""
        tr, ev = get_transform("noaug", 32)
        assert tr.random_crop and not ev.random_crop
        tr, ev = get_transform("midi", 32)
        assert tr.grayscale and ev.grayscale and tr.random_crop
        tr, ev = get_transform("digits", 32)
        assert not tr.random_crop and not ev.random_crop
        with pytest.raises(NotImplementedError):
            get_transform("bogus", 32)

    def test_normalization_table(self):
        tr, _ = get_transform("noaug", 28, {"normalization": "vae-lines"})
        assert tr.mean == (0.5,) and tr.std == (1.0,)

    def test_uint8_scale_and_normalize(self):
        spec = TransformSpec(image_size=8, mean=(0.5,), std=(1.0,))
        batch = np.full((2, 8, 8, 1), 255, np.uint8)
        out = np.asarray(apply_transform(spec, jnp.asarray(batch)))
        np.testing.assert_allclose(out, 0.5, atol=1e-6)  # 1.0 - 0.5
        batch0 = np.zeros((2, 8, 8, 1), np.uint8)
        out0 = np.asarray(apply_transform(spec, jnp.asarray(batch0)))
        np.testing.assert_allclose(out0, -0.5, atol=1e-6)

    def test_resize_shortest_side(self):
        spec = TransformSpec(image_size=16)
        batch = np.zeros((2, 32, 64, 1), np.uint8)  # wide piano-roll shape
        out = apply_transform(spec, jnp.asarray(batch))
        assert out.shape == (2, 16, 16, 1)  # resized 32→16 (64→32), center-cropped

    def test_random_crop_uses_key(self):
        spec = TransformSpec(image_size=8, random_crop=True)
        rng = np.random.default_rng(0)
        batch = jnp.asarray(rng.integers(0, 256, (4, 8, 16, 1)).astype(np.uint8))
        a = apply_transform(spec, batch, jax.random.PRNGKey(0))
        b = apply_transform(spec, batch, jax.random.PRNGKey(0))
        c = apply_transform(spec, batch, jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_grayscale(self):
        spec = TransformSpec(image_size=8, mean=(0.0,), std=(1.0,), grayscale=True)
        batch = np.zeros((1, 8, 8, 3), np.uint8)
        batch[..., 0] = 255  # pure red
        out = np.asarray(apply_transform(spec, jnp.asarray(batch)))
        assert out.shape == (1, 8, 8, 1)
        np.testing.assert_allclose(out, 0.2989, atol=1e-3)

    def test_denormalize_roundtrip(self):
        spec = TransformSpec(image_size=8, mean=(0.5,), std=(2.0,))
        x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 8, 8, 1)).astype(np.float32))
        normed = (x - 0.5) / 2.0
        np.testing.assert_allclose(np.asarray(denormalize(spec, normed)), np.asarray(x), atol=1e-6)


class TestSplits:
    def test_random_split_ratio_and_disjoint(self):
        tr, te = random_train_test_split(100, 0.8, seed=0)
        assert len(tr) == 80 and len(te) == 20
        assert not set(tr) & set(te)
        assert set(tr) | set(te) == set(range(100))

    def test_kfold_split_deterministic(self):
        """Seed math parity: split_seed=int(id*rate), fold=id%n (datasets.py:334-335)."""
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            tr1, va1 = create_train_val_split(100, split_rate=0.1, split_id=0)
            tr2, va2 = create_train_val_split(100, split_rate=0.1, split_id=0)
        np.testing.assert_array_equal(tr1, tr2)
        np.testing.assert_array_equal(va1, va2)
        assert len(va1) == 10 and len(tr1) == 90

    def test_kfold_successive_ids_nonoverlapping_val(self):
        """Split IDs 0..9 share one seed (int(id*0.1)==0) → disjoint val folds."""
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            vals = [set(create_train_val_split(100, split_rate=0.1, split_id=i)[1]) for i in range(10)]
        for i in range(10):
            for j in range(i + 1, 10):
                assert not vals[i] & vals[j]
        assert set().union(*vals) == set(range(100))

    def test_split_rate_above_two_thirds_clear_error(self):
        """rate > 2/3 rounds to n_splits=1; the boundary rejects it with a
        clear message instead of sklearn's opaque n_splits error."""
        with pytest.raises(ValueError, match="split rate"):
            create_train_val_split(100, split_rate=0.8, split_id=0)

    def test_stratified_when_labels(self):
        labels = np.array([0] * 50 + [1] * 50)
        tr, va = create_train_val_split(100, labels=labels, split_rate=0.1, split_id=0)
        assert (labels[va] == 0).sum() == 5 and (labels[va] == 1).sum() == 5


class TestFetch:
    def test_synthetic_fetch_not_prototyping(self):
        tr, va, te, distinct = fetch_dataset("vae-lines-synthetic")
        assert not distinct
        assert va is te  # val IS test (datasets.py:236-240)
        assert len(tr) + len(te) == 1024
        assert abs(len(tr) - 0.8 * 1024) <= 1

    def test_synthetic_fetch_prototyping(self):
        tr_spec, ev_spec = get_transform("noaug", 28, {"normalization": "vae-lines"})
        tr, va, te, distinct = fetch_dataset(
            "vae-lines-synthetic",
            prototyping=True,
            protoval_split_id=3,
            transform_train=tr_spec,
            transform_eval=ev_spec,
        )
        assert distinct
        assert va.transform == ev_spec  # val uses eval transform (datasets.py:250-257)
        assert tr.transform == tr_spec
        # val carved out of train
        full_train = int(0.8 * 1024)
        assert len(tr) + len(va) == full_train

    def test_image_folder_roundtrip(self, tmp_path):
        images, labels = generate_line_images(20, img_size=(16, 16), seed=0)
        write_image_folder(images[:, :, :, None], labels, str(tmp_path / "ds"))
        ds = load_image_folder(str(tmp_path / "ds"))
        assert len(ds) == 20
        assert ds.images.shape[1:] == (16, 16, 1)
        # class folders sorted: labels are folder indices; line counts 1,2 → classes "1_lines","2_lines"
        assert ds.class_names == sorted(ds.class_names)
        # cache file created and reused
        ds2 = load_image_folder(str(tmp_path / "ds"))
        np.testing.assert_array_equal(ds.images, ds2.images)

    def test_unknown_dataset_raises(self):
        with pytest.raises(ValueError):
            fetch_dataset("bogus")


class TestDeviceLoader:
    def _dataset(self, n=100, size=16):
        rng = np.random.default_rng(0)
        return ArrayDataset(
            images=rng.integers(0, 256, (n, size, size, 1)).astype(np.uint8),
            labels=np.arange(n, dtype=np.int64),
            transform=TransformSpec(image_size=size),
        )

    def test_train_drops_last_and_shuffles(self):
        loader = DeviceLoader(self._dataset(100), 32, train=True, seed=0)
        assert len(loader) == 3
        assert loader.num_samples == 96
        batches = list(loader.epoch(1))
        assert len(batches) == 3
        ys = np.concatenate([np.asarray(b.y) for b in batches])
        assert len(set(ys.tolist())) == 96  # distinct samples
        assert not np.array_equal(ys, np.sort(ys))  # shuffled
        for b in batches:
            assert b.x.shape == (32, 16, 16, 1)
            np.testing.assert_array_equal(np.asarray(b.mask), 1.0)

    def test_epoch_shuffle_reproducible_and_distinct(self):
        loader = DeviceLoader(self._dataset(64), 32, train=True, seed=5)
        e1 = np.concatenate([np.asarray(b.y) for b in loader.epoch(1)])
        e1b = np.concatenate([np.asarray(b.y) for b in loader.epoch(1)])
        e2 = np.concatenate([np.asarray(b.y) for b in loader.epoch(2)])
        np.testing.assert_array_equal(e1, e1b)  # resume-stable (train.py:345-369)
        assert not np.array_equal(e1, e2)  # fresh order each epoch

    def test_eval_pads_last_batch(self):
        loader = DeviceLoader(self._dataset(70), 32, train=False)
        batches = list(loader.epoch(1))
        assert len(batches) == 3
        last = batches[-1]
        assert last.x.shape == (32, 16, 16, 1)
        m = np.asarray(last.mask)
        assert m.sum() == 6  # 70 - 64
        np.testing.assert_array_equal(m[:6], 1.0)
        np.testing.assert_array_equal(m[6:], 0.0)
        # eval order is deterministic/sequential
        ys = np.concatenate([np.asarray(b.y) for b in batches])
        np.testing.assert_array_equal(ys[:70], np.arange(70))

    def test_sharded_loading(self, eight_devices):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(eight_devices), ("data",))
        sharding = NamedSharding(mesh, P("data"))
        loader = DeviceLoader(self._dataset(64), 32, train=True, seed=0, sharding=sharding)
        batch = next(iter(loader.epoch(1)))
        assert batch.x.sharding.is_equivalent_to(NamedSharding(mesh, P("data")), batch.x.ndim)


class TestSVHNDownload:
    """SVHN download parity (reference datasets.py:147-159 via torchvision
    download=True). Network egress is unavailable in CI, so the download
    transport is mocked; the wiring (miss -> fetch -> load) is real."""

    def _fake_mat(self, path, n=12):
        import scipy.io

        rng = np.random.default_rng(0)
        scipy.io.savemat(
            path,
            {
                "X": rng.integers(0, 256, (32, 32, 3, n), dtype=np.uint8),
                "y": rng.integers(1, 11, (n, 1)).astype(np.uint8),
            },
        )

    def test_missing_without_download_raises(self, tmp_path):
        from midi_vae_tpu.data.fetch import fetch_image_dataset

        with pytest.raises(FileNotFoundError):
            fetch_image_dataset("svhn", root=str(tmp_path), download=False)

    def test_download_flag_fetches_and_loads(self, tmp_path, monkeypatch):
        import urllib.request

        from midi_vae_tpu.data.fetch import fetch_image_dataset

        def fake_retrieve(url, dest):
            assert url.startswith("http://ufldl.stanford.edu/housenumbers/")
            self._fake_mat(dest)

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
        train, val, test = fetch_image_dataset("svhn", root=str(tmp_path), download=True)
        assert len(train) == 12 and len(test) == 12
        assert train.images.shape == (12, 32, 32, 3)  # HWCN -> NHWC
        assert set(np.unique(train.labels)) <= set(range(10))  # "10" remapped to 0


class TestDeviceResidentLoader:
    """data/pipeline.py DeviceResidentLoader: batch-for-batch equivalence
    with DeviceLoader (same permutation, crop keys, padding layout)."""

    def _dataset(self, n=37, size=16, spec=None):
        from midi_vae_tpu.data.sources import ArrayDataset

        rng = np.random.default_rng(11)
        images = rng.integers(0, 256, (n, size, size, 1), dtype=np.uint8)
        return ArrayDataset(
            images=images, labels=rng.integers(0, 5, n).astype(np.int64),
            name="t", transform=spec,
        )

    def _compare(self, ds, batch_size, train, epoch=3, seed=5):
        from midi_vae_tpu.data.pipeline import DeviceLoader, DeviceResidentLoader

        host = DeviceLoader(ds, batch_size, train=train, seed=seed)
        dev = DeviceResidentLoader(ds, batch_size, train=train, seed=seed)
        assert len(host) == len(dev) and host.num_samples == dev.num_samples
        hb = list(host.epoch(epoch))
        db = list(dev.epoch(epoch))
        assert len(hb) == len(db)
        for b1, b2 in zip(hb, db):
            np.testing.assert_allclose(np.asarray(b1.x), np.asarray(b2.x), atol=1e-6)
            np.testing.assert_array_equal(np.asarray(b1.y), np.asarray(b2.y))
            np.testing.assert_array_equal(np.asarray(b1.mask), np.asarray(b2.mask))

    def test_train_equivalence_plain(self):
        self._compare(self._dataset(), batch_size=8, train=True)

    def test_train_equivalence_random_crop(self):
        from midi_vae_tpu.data.transforms import TransformSpec

        spec = TransformSpec(image_size=12, random_crop=True)
        self._compare(self._dataset(spec=spec), batch_size=8, train=True)

    def test_eval_equivalence_with_padding(self):
        from midi_vae_tpu.data.transforms import TransformSpec

        spec = TransformSpec(image_size=16, random_crop=False)
        # 37 % 8 != 0 → the final batch is padded+masked on both paths
        self._compare(self._dataset(spec=spec), batch_size=8, train=False)

    def test_make_loader_placement_routing(self, monkeypatch):
        from midi_vae_tpu.data.pipeline import DeviceLoader, DeviceResidentLoader, make_loader

        ds = self._dataset()
        assert isinstance(make_loader(ds, 8, train=True), DeviceLoader)  # default host
        assert isinstance(make_loader(ds, 8, train=True, placement="device"), DeviceResidentLoader)
        assert isinstance(make_loader(ds, 8, train=True, placement="auto"), DeviceResidentLoader)
        # auto respects the budget: force it to 0 MB → host path
        monkeypatch.setenv("MIDI_VAE_DEVICE_DATA_BUDGET_MB", "0")
        assert isinstance(make_loader(ds, 8, train=True, placement="auto"), DeviceLoader)
        with pytest.raises(ValueError, match="placement"):
            make_loader(ds, 8, train=True, placement="gpu")

    def test_auto_budget_is_cumulative_and_released(self, monkeypatch):
        from midi_vae_tpu.data.pipeline import DeviceLoader, DeviceResidentLoader, make_loader

        monkeypatch.setenv("MIDI_VAE_DEVICE_DATA_BUDGET_MB", "1")
        # ~0.63 MiB per corpus: one fits the 1 MiB budget, two do not
        ds1, ds2 = self._dataset(n=160, size=64), self._dataset(n=160, size=64)
        first = make_loader(ds1, 8, train=True, placement="auto")
        assert isinstance(first, DeviceResidentLoader)
        # the second corpus alone would fit, but TOTAL residency is what's budgeted
        assert isinstance(make_loader(ds2, 8, train=False, placement="auto"), DeviceLoader)
        # releasing the first gives its bytes back (loop.py frees the train
        # loader before the final train-under-eval re-upload)
        first.release()
        assert first.corpus_nbytes == 0
        assert isinstance(make_loader(ds2, 8, train=False, placement="auto"), DeviceResidentLoader)
        # forced placement="device" is an explicit override, never budget-gated
        assert isinstance(make_loader(ds1, 8, train=True, placement="device"), DeviceResidentLoader)

    def test_shuffles_differ_across_epochs(self):
        from midi_vae_tpu.data.pipeline import DeviceResidentLoader

        ds = self._dataset(n=32)
        dev = DeviceResidentLoader(ds, 16, train=True, seed=1)
        e1 = np.concatenate([np.asarray(b.y) for b in dev.epoch(1)])
        e2 = np.concatenate([np.asarray(b.y) for b in dev.epoch(2)])
        e1b = np.concatenate([np.asarray(b.y) for b in dev.epoch(1)])
        assert not np.array_equal(e1, e2)
        np.testing.assert_array_equal(e1, e1b)  # resume-stable


class TestStatsCLI:
    """Corpus pre-flight tool (python -m midi_vae_tpu.data.stats)."""

    def test_preflight_reports_fill_rate_and_recipe(self, capsys):
        from midi_vae_tpu.data.stats import cli

        cli(["--dataset", "vae-lines-synthetic", "--max-samples", "256"])
        out = capsys.readouterr().out
        assert "train" in out and "28x28x1" in out
        assert "fill rate p = " in out
        assert "--output-bias-init auto = " in out
        # line images are ~20% fill — no sparse warning on a dense corpus
        assert "SPARSE corpus" not in out

    def test_preflight_warns_on_sparse_corpus(self, capsys, monkeypatch):
        import midi_vae_tpu.data.stats as stats_mod
        from midi_vae_tpu.data.sources import ArrayDataset

        images = np.zeros((64, 16, 16, 1), np.uint8)
        images[:, 3, 3, 0] = 255  # 1/256 fill — deep in attractor territory
        ds = ArrayDataset(images=images, labels=np.zeros(64, np.int64))
        monkeypatch.setattr(
            "midi_vae_tpu.data.fetch.fetch_dataset", lambda *a, **k: (ds, ds, ds, False)
        )
        stats_mod.cli(["--dataset", "whatever"])
        out = capsys.readouterr().out
        assert "SPARSE corpus" in out
        assert "--bce-targets raw" in out
