"""Checkpoint I/O: atomicity, payload parity, config backfill (SURVEY C10)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from midi_vae_tpu.io.checkpoint import (
    copy_best,
    load_checkpoint,
    restore_config,
    save_checkpoint,
)


def _state():
    return {
        "params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "opt": {"mu": np.zeros(3, np.float32)},
        "step": jnp.int32(7),
    }


def test_roundtrip(tmp_path):
    path = str(tmp_path / "checkpoint_latest.msgpack")
    save_checkpoint(
        path,
        _state(),
        config={"epochs": 5, "dataset_name": "mnist"},
        epoch=3,
        total_step=42,
        n_samples_seen=5376,
        encoder_config={"input_size": 32, "n_feature": 10},
        transform_args={"normalization": "mnist"},
        best_epoch=2,
    )
    payload = load_checkpoint(path)
    # payload keys mirror utils.py:344-347 / train.py:445-460
    assert payload["epoch"] == 3
    assert payload["total_step"] == 42
    assert payload["n_samples_seen"] == 5376
    assert payload["best_epoch"] == 2
    assert payload["config"]["dataset_name"] == "mnist"
    assert payload["encoder_config"] == {"input_size": 32, "n_feature": 10}
    np.testing.assert_array_equal(payload["state"]["params"]["w"], _state()["params"]["w"])
    assert int(payload["state"]["step"]) == 7


def test_restore_into_template(tmp_path):
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, _state())
    template = {
        "params": {"w": jnp.zeros((2, 3))},
        "opt": {"mu": jnp.ones(3)},
        "step": jnp.int32(0),
    }
    payload = load_checkpoint(path, state_template=template)
    np.testing.assert_array_equal(np.asarray(payload["state"]["params"]["w"]), _state()["params"]["w"])


def test_atomic_no_partial_file(tmp_path):
    path = str(tmp_path / "c.msgpack")
    save_checkpoint(path, _state())
    # no tmp leftovers (utils.py:342-350 semantics)
    assert os.listdir(tmp_path) == ["c.msgpack"]


def test_overwrite_latest(tmp_path):
    path = str(tmp_path / "c.msgpack")
    save_checkpoint(path, _state(), epoch=1)
    save_checkpoint(path, _state(), epoch=2)
    assert load_checkpoint(path)["epoch"] == 2


def test_copy_best(tmp_path):
    path = str(tmp_path / "checkpoint_latest.msgpack")
    save_checkpoint(path, _state(), epoch=4)
    best = copy_best(path)
    assert os.path.basename(best) == "best_model.msgpack"
    assert load_checkpoint(best)["epoch"] == 4
    # atomic overwrite: a second copy replaces the best in place, and no
    # staging/tmp residue survives (preemption mid-copy must never leave
    # a truncated or missing best file)
    save_checkpoint(path, _state(), epoch=7)
    copy_best(path)
    assert load_checkpoint(best)["epoch"] == 7
    leftovers = [f for f in os.listdir(tmp_path) if ".tmp" in f or ".staging" in f or ".old" in f]
    assert leftovers == []


class TestRestoreConfig:
    def test_backfills_none(self):
        merged = restore_config({"lr": None, "epochs": 5}, {"lr": 0.01, "epochs": 5})
        assert merged["lr"] == 0.01

    def test_warns_on_mismatch_keeps_ours(self):
        with pytest.warns(UserWarning, match="differs from checkpoint"):
            merged = restore_config({"epochs": 10}, {"epochs": 5})
        assert merged["epochs"] == 10  # live value wins (train.py:84-88)

    def test_skips_identity_keys(self):
        merged = restore_config({"global_rank": None}, {"global_rank": 3})
        assert merged["global_rank"] is None


class TestAsyncWriter:
    def _payload(self):
        return {"w": np.arange(10, dtype=np.float32)}

    def test_async_save_roundtrips(self, tmp_path):
        from midi_vae_tpu.io.checkpoint import AsyncCheckpointWriter, load_checkpoint

        writer = AsyncCheckpointWriter()
        path = str(tmp_path / "ck.msgpack")
        writer.save(path, self._payload(), epoch=3, total_step=42)
        writer.wait()
        payload = load_checkpoint(path)
        np.testing.assert_array_equal(payload["state"]["w"], np.arange(10, dtype=np.float32))
        assert payload["epoch"] == 3 and payload["total_step"] == 42

    def test_successive_saves_keep_latest(self, tmp_path):
        from midi_vae_tpu.io.checkpoint import AsyncCheckpointWriter, load_checkpoint

        writer = AsyncCheckpointWriter()
        path = str(tmp_path / "ck.msgpack")
        for epoch in range(5):
            writer.save(path, self._payload(), epoch=epoch)
        writer.wait()
        assert load_checkpoint(path)["epoch"] == 4
        # no stray tmp files: every write completed atomically
        assert [f for f in os.listdir(tmp_path) if f.startswith(".tmp.")] == []

    def test_write_error_surfaces_on_wait(self, tmp_path):
        from midi_vae_tpu.io.checkpoint import AsyncCheckpointWriter

        blocker = tmp_path / "not_a_dir"
        blocker.write_text("a regular file where the checkpoint dir should go")
        writer = AsyncCheckpointWriter()
        writer.save(str(blocker / "ck.msgpack"), self._payload())  # fails in the thread
        with pytest.raises(OSError):
            writer.wait()
        # the writer recovers: a good save afterwards works
        good = str(tmp_path / "ok.msgpack")
        writer.save(good, self._payload())
        writer.wait()
        assert os.path.isfile(good)

    def test_train_run_with_async_checkpoint(self, tmp_path):
        import jax

        from midi_vae_tpu.io.checkpoint import load_checkpoint
        from midi_vae_tpu.train.config import TrainConfig
        from midi_vae_tpu.train.loop import run

        config = TrainConfig(
            dataset_name="vae-lines-synthetic",
            transform_type="noaug",
            image_size=32,
            arch="MLPVAE",
            n_features=8,
            hidden_dims=(64,),
            epochs=2,
            batch_size_per_device=16,
            num_devices=1,
            seed=0,
            models_dir=str(tmp_path / "m"),
            log_images=False,
            async_checkpoint=True,
        )
        results = run(config)
        payload = load_checkpoint(config.checkpoint_path)
        assert payload["epoch"] == 2
        assert payload["total_step"] == results["total_step"]


class TestOrbaxBackend:
    def _state(self):
        return {"w": np.arange(12, dtype=np.float32).reshape(3, 4), "step": np.int32(7)}

    def test_roundtrip(self, tmp_path):
        from midi_vae_tpu.io.checkpoint import load_checkpoint, save_checkpoint
        from midi_vae_tpu.io.orbax_io import is_orbax_checkpoint

        pytest.importorskip("orbax.checkpoint")
        path = str(tmp_path / "ckpt_orbax")
        save_checkpoint(path, self._state(), backend="orbax",
                        config={"epochs": 5, "hidden_dims": (8, 16)}, epoch=2, total_step=99)
        assert is_orbax_checkpoint(path)
        payload = load_checkpoint(path)  # auto-detected backend
        np.testing.assert_array_equal(payload["state"]["w"], self._state()["w"])
        assert payload["epoch"] == 2 and payload["total_step"] == 99
        assert payload["config"]["epochs"] == 5

    def test_template_restore(self, tmp_path):
        from midi_vae_tpu.io.checkpoint import load_checkpoint, save_checkpoint

        pytest.importorskip("orbax.checkpoint")
        path = str(tmp_path / "ckpt_orbax")
        save_checkpoint(path, self._state(), backend="orbax", epoch=1)
        template = {"w": np.zeros((3, 4), np.float32), "step": np.int32(0)}
        payload = load_checkpoint(path, state_template=template)
        np.testing.assert_array_equal(payload["state"]["w"], self._state()["w"])

    def test_swap_window_crash_recovers_from_old(self, tmp_path):
        """A preemption between the two swap renames leaves <path>.old as
        the only complete checkpoint; detection/load must recover it and
        the next save must re-establish <path> (ADVICE r1, medium)."""
        from midi_vae_tpu.io.checkpoint import load_checkpoint, save_checkpoint
        from midi_vae_tpu.io.orbax_io import is_orbax_checkpoint

        pytest.importorskip("orbax.checkpoint")
        path = str(tmp_path / "ckpt_orbax")
        save_checkpoint(path, self._state(), backend="orbax", epoch=2, total_step=10)
        os.rename(path, path + ".old")  # the exact mid-swap crash state
        assert is_orbax_checkpoint(path)  # resume must NOT restart from scratch
        payload = load_checkpoint(path)
        assert payload["epoch"] == 2 and payload["total_step"] == 10
        # the next save swaps a complete new checkpoint in and clears .old
        save_checkpoint(path, self._state(), backend="orbax", epoch=3, total_step=15)
        assert os.path.isdir(path) and not os.path.exists(path + ".old")
        assert load_checkpoint(path)["epoch"] == 3

    def test_sharded_arrays_roundtrip(self, tmp_path, eight_devices):
        """Sharded jax.Array leaves are written by Orbax directly (no host
        gather) and restore to equal values."""
        import jax
        import jax.numpy as jnp

        from midi_vae_tpu.io.checkpoint import load_checkpoint, save_checkpoint
        from midi_vae_tpu.parallel.mesh import batch_sharding, make_mesh

        pytest.importorskip("orbax.checkpoint")
        mesh = make_mesh(8)
        w = jax.device_put(jnp.arange(64, dtype=jnp.float32).reshape(16, 4), batch_sharding(mesh))
        path = str(tmp_path / "ckpt_sharded")
        save_checkpoint(path, {"w": w, "step": jnp.int32(1)}, backend="orbax", epoch=1)
        payload = load_checkpoint(path)
        np.testing.assert_array_equal(np.asarray(payload["state"]["w"]), np.asarray(w))

    def test_msgpack_still_default(self, tmp_path):
        from midi_vae_tpu.io.checkpoint import load_checkpoint, save_checkpoint

        path = str(tmp_path / "ck.msgpack")
        save_checkpoint(path, self._state(), epoch=3)
        assert os.path.isfile(path)  # single file, not a directory
        assert load_checkpoint(path)["epoch"] == 3


class TestOrbaxAsyncWriter:
    """--async-checkpoint --checkpoint-backend orbax: Orbax's AsyncCheckpointer
    with the deferred crash-safe swap (round-2 VERDICT item 7)."""

    def _state(self):
        return {"w": np.arange(12, dtype=np.float32).reshape(3, 4), "step": np.int32(7)}

    def test_save_wait_roundtrip(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from midi_vae_tpu.io.checkpoint import load_checkpoint
        from midi_vae_tpu.io.orbax_io import OrbaxAsyncWriter, is_orbax_checkpoint

        path = str(tmp_path / "ckpt_async")
        w = OrbaxAsyncWriter()
        w.save(path, self._state(), epoch=1, total_step=5, backend="orbax")
        w.wait()
        assert is_orbax_checkpoint(path)
        payload = load_checkpoint(path)
        assert payload["epoch"] == 1 and payload["total_step"] == 5
        assert "backend" not in payload  # routing hint stripped, payload parity
        # second save supersedes, no .old left behind
        w.save(path, self._state(), epoch=2, total_step=10)
        w.close()
        assert load_checkpoint(path)["epoch"] == 2
        assert not os.path.exists(path + ".old") and not os.path.exists(path + ".staging")

    def test_in_flight_save_never_clobbers_previous(self, tmp_path):
        """Crash-window guarantee: while save N+1 is in flight (pre-wait),
        the path still loads as the COMPLETE checkpoint N."""
        pytest.importorskip("orbax.checkpoint")
        from midi_vae_tpu.io.checkpoint import load_checkpoint
        from midi_vae_tpu.io.orbax_io import OrbaxAsyncWriter

        path = str(tmp_path / "ckpt_async2")
        w = OrbaxAsyncWriter()
        w.save(path, self._state(), epoch=1)
        w.wait()
        w.save(path, self._state(), epoch=2)  # in flight; swap deferred
        assert load_checkpoint(path)["epoch"] == 1
        w.close()
        assert load_checkpoint(path)["epoch"] == 2

    def test_swap_window_crash_recovers_from_old(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        from midi_vae_tpu.io.checkpoint import load_checkpoint
        from midi_vae_tpu.io.orbax_io import OrbaxAsyncWriter, is_orbax_checkpoint

        path = str(tmp_path / "ckpt_async3")
        w = OrbaxAsyncWriter()
        w.save(path, self._state(), epoch=4)
        w.close()
        os.rename(path, path + ".old")  # the exact mid-swap crash state
        assert is_orbax_checkpoint(path)
        assert load_checkpoint(path)["epoch"] == 4

    def test_train_loop_async_orbax(self, tmp_path, eight_devices):
        """The full loop trains, saves async orbax on the virtual mesh, and
        resumes (this flag combination used to be rejected)."""
        pytest.importorskip("orbax.checkpoint")
        from midi_vae_tpu.io.checkpoint import load_checkpoint
        from midi_vae_tpu.train.config import TrainConfig
        from midi_vae_tpu.train.loop import run

        config = TrainConfig(
            dataset_name="vae-lines-synthetic",
            transform_type="noaug",
            image_size=32,
            arch="MLPVAE",
            n_features=8,
            hidden_dims=(64,),
            epochs=2,
            batch_size_per_device=4,
            num_devices=8,
            seed=0,
            models_dir=str(tmp_path / "m"),
            log_images=False,
            async_checkpoint=True,
            checkpoint_backend="orbax",
        )
        results = run(config)
        payload = load_checkpoint(config.checkpoint_path)
        assert payload["epoch"] == 2
        assert payload["total_step"] == results["total_step"]
        # resume continues from epoch 3
        config2 = TrainConfig.from_dict({**config.to_dict(), "epochs": 3})
        results2 = run(config2)
        assert load_checkpoint(config.checkpoint_path)["epoch"] == 3
        assert results2["total_step"] > results["total_step"]

    def test_abnormal_exit_still_promotes_staged_save(self, tmp_path, eight_devices, monkeypatch):
        """An exception unwinding out of the epoch loop must still finalize
        the in-flight async orbax save: epoch 1's checkpoint would otherwise
        be stranded in .staging — never loaded by resume, deleted by the
        next run's save()."""
        pytest.importorskip("orbax.checkpoint")
        import midi_vae_tpu.train.loop as loop_mod
        from midi_vae_tpu.io.checkpoint import load_checkpoint
        from midi_vae_tpu.train.config import TrainConfig
        from midi_vae_tpu.train.loop import run

        config = TrainConfig(
            dataset_name="vae-lines-synthetic",
            transform_type="noaug",
            image_size=32,
            arch="MLPVAE",
            n_features=8,
            hidden_dims=(64,),
            epochs=2,
            batch_size_per_device=4,
            num_devices=8,
            seed=0,
            models_dir=str(tmp_path / "m"),
            log_images=False,
            async_checkpoint=True,
            checkpoint_backend="orbax",
        )
        real_evaluate = loop_mod.evaluate
        calls = {"n": 0}

        def failing_evaluate(*args, **kwargs):
            calls["n"] += 1
            if calls["n"] == 2:  # epoch 2's validation: epoch 1's save is in flight
                raise RuntimeError("injected mid-training failure")
            return real_evaluate(*args, **kwargs)

        monkeypatch.setattr(loop_mod, "evaluate", failing_evaluate)
        with pytest.raises(RuntimeError, match="injected"):
            run(config)
        # the epoch-1 checkpoint was promoted out of .staging on the way out
        assert not os.path.exists(config.checkpoint_path + ".staging")
        payload = load_checkpoint(config.checkpoint_path)
        assert payload["epoch"] == 1
        # and a fresh process resumes from it
        monkeypatch.setattr(loop_mod, "evaluate", real_evaluate)
        run(TrainConfig.from_dict(config.to_dict()))
        assert load_checkpoint(config.checkpoint_path)["epoch"] == 2
