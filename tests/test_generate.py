"""Generation CLI + roll→MIDI derasterization tests."""

import os

import jax
import numpy as np
import pytest

from midi_vae_tpu.midi.derasterize import roll_to_notes
from midi_vae_tpu.midi.rasterize import notes_to_windows
from midi_vae_tpu.midi.smf import NoteArrays


class TestDerasterize:
    def test_roundtrip_notes_roll_notes(self):
        notes = NoteArrays(
            onset=np.array([0.0, 1.0, 2.0]),
            duration=np.array([0.5, 0.25, 1.0]),
            pitch=np.array([60, 64, 72], np.int32),
            velocity=np.array([100, 64, 127], np.int32),
        )
        spc = 0.05
        roll = notes_to_windows(notes, steps=64, seconds_per_step=spc)[0]
        back = roll_to_notes(roll, seconds_per_step=spc)
        assert len(back) == 3
        np.testing.assert_array_equal(back.pitch, notes.pitch)
        np.testing.assert_allclose(back.onset, notes.onset, atol=spc)
        np.testing.assert_allclose(back.duration, notes.duration, atol=2 * spc)
        np.testing.assert_allclose(back.velocity, notes.velocity, atol=1)

    def test_empty_roll(self):
        back = roll_to_notes(np.zeros((128, 64)))
        assert len(back) == 0

    def test_adjacent_notes_not_merged(self):
        # same pitch, gap of one silent column between runs
        roll = np.zeros((128, 32))
        roll[50, 2:6] = 0.8
        roll[50, 7:10] = 0.6
        back = roll_to_notes(roll, seconds_per_step=1.0)
        assert len(back) == 2
        np.testing.assert_allclose(back.onset, [2.0, 7.0])
        np.testing.assert_allclose(back.duration, [4.0, 3.0])


@pytest.fixture(scope="module")
def trained_checkpoint(tmp_path_factory):
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    tmp_path = tmp_path_factory.mktemp("gen")
    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
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
        run_name="gentest",
        run_id="gen123",
    )
    run(config)
    return config.checkpoint_path


def test_generate_prefers_ema_weights(tmp_path):
    """A checkpoint trained with --ema-decay generates with the averaged
    weights by default; --no-ema selects the raw ones."""
    import numpy as np

    from midi_vae_tpu.cli.generate import _load_model_and_state
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=32,
        arch="MLPVAE",
        n_features=8,
        hidden_dims=(64,),
        epochs=1,
        batch_size_per_device=16,
        num_devices=1,
        seed=0,
        ema_decay=0.5,
        models_dir=str(tmp_path / "models"),
        log_images=False,
        run_name="ematest",
        run_id="ema123",
    )
    run(config)
    _, params_ema, _, _, _, _, _ = _load_model_and_state(config.checkpoint_path)
    _, params_raw, _, _, _, _, _ = _load_model_and_state(config.checkpoint_path, use_ema=False)
    leaves_ema = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(params_ema)]
    leaves_raw = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(params_raw)]
    assert any(not np.allclose(a, b) for a, b in zip(leaves_ema, leaves_raw)), (
        "EMA and raw params should differ after training"
    )


def test_generate_restores_arch_variants(tmp_path):
    """A checkpoint trained with --stem s2d / --head d2s must rebuild the
    SAME param tree at generation time (config carries the variant)."""
    from midi_vae_tpu.cli.generate import _load_model_and_state, cli
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=32,
        n_features=8,
        hidden_dims=(8, 16),
        stem="s2d",
        head="d2s",
        epochs=1,
        batch_size_per_device=16,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "models"),
        log_images=False,
        run_name="vartest",
        run_id="var123",
    )
    run(config)
    model, params, _, cfg, _, _, _ = _load_model_and_state(config.checkpoint_path)
    assert model.stem == "s2d" and model.head == "d2s"
    assert "S2DStem_0" in params["encoder"]
    out = str(tmp_path / "s.png")
    cli(["--checkpoint", config.checkpoint_path, "--mode", "sample", "-n", "2", "--out", out])
    assert os.path.isfile(out)


def test_generate_restores_norm_variant(tmp_path):
    """A checkpoint trained with --norm group (no batch_stats collection)
    must rebuild the same GroupNorm tree at generation time."""
    from midi_vae_tpu.cli.generate import _load_model_and_state, cli
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=32,
        n_features=8,
        hidden_dims=(8, 16),
        norm="group",
        epochs=1,
        batch_size_per_device=16,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "models"),
        log_images=False,
        run_name="normtest",
        run_id="norm123",
    )
    run(config)
    model, params, batch_stats, cfg, _, _, _ = _load_model_and_state(config.checkpoint_path)
    assert cfg["norm"] == "group"
    assert not batch_stats, "GroupNorm checkpoint must carry no batch_stats"
    flat_keys = {
        jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(params["encoder"])
    }
    assert any("GroupNorm" in k for k in flat_keys)
    out = str(tmp_path / "g.png")
    cli(["--checkpoint", config.checkpoint_path, "--mode", "sample", "-n", "2", "--out", out])
    assert os.path.isfile(out)


class TestGenerateCLI:
    def test_sample_mode(self, trained_checkpoint, tmp_path):
        from midi_vae_tpu.cli.generate import cli

        out = str(tmp_path / "samples.png")
        cli(["--checkpoint", trained_checkpoint, "--mode", "sample", "-n", "4", "--out", out])
        assert os.path.isfile(out)

    def test_reconstruct_mode(self, trained_checkpoint, tmp_path):
        from midi_vae_tpu.cli.generate import cli

        out = str(tmp_path / "recon.png")
        cli(["--checkpoint", trained_checkpoint, "--mode", "reconstruct", "-n", "4", "--out", out])
        assert os.path.isfile(out)

    def test_interpolate_slerp(self, trained_checkpoint, tmp_path):
        from midi_vae_tpu.cli.generate import cli

        out = str(tmp_path / "interp.png")
        cli(["--checkpoint", trained_checkpoint, "--mode", "interpolate", "--steps", "5", "--slerp", "--out", out])
        assert os.path.isfile(out)

    def test_export_midi(self, trained_checkpoint, tmp_path):
        from midi_vae_tpu.cli.generate import cli
        from midi_vae_tpu.midi.parse import parse_midi

        out = str(tmp_path / "s.png")
        mid_dir = str(tmp_path / "mids")
        cli([
            "--checkpoint", trained_checkpoint, "--mode", "sample", "-n", "2",
            "--out", out, "--export-midi", mid_dir,
        ])
        files = sorted(os.listdir(mid_dir))
        assert len(files) == 2
        parse_midi(os.path.join(mid_dir, files[0]))  # parses back cleanly


class TestTraversal:
    def test_traverse_shapes(self, trained_checkpoint):
        import jax

        from midi_vae_tpu.cli.generate import _load_model_and_state
        from midi_vae_tpu.evaluation.inference import traverse

        model, params, batch_stats, cfg, img, ch, _ = _load_model_and_state(trained_checkpoint)
        x = jax.numpy.zeros((1, img, img, ch))
        out = traverse(model, params, batch_stats, x, steps=5)
        assert out.shape == (model.latent_dim, 5, img, img, ch)
        # varying a dim must actually change the decode (non-degenerate span)
        import numpy as np

        assert not np.allclose(np.asarray(out[0, 0]), np.asarray(out[0, -1]))

    def test_traverse_cli(self, trained_checkpoint, tmp_path):
        from midi_vae_tpu.cli.generate import cli

        out = str(tmp_path / "trav.png")
        cli(["--checkpoint", trained_checkpoint, "--mode", "traverse", "--steps", "5", "--out", out])
        assert os.path.isfile(out)


def test_local_reconstruction_grid_without_wandb(tmp_path):
    """log_images without wandb writes PNG grids next to the checkpoint."""
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=32,
        arch="MLPVAE",
        n_features=8,
        hidden_dims=(64,),
        epochs=1,
        batch_size_per_device=16,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "m"),
        log_images=True,
        run_name="grid",
        run_id="grid1",
    )
    run(config)
    out_dir = os.path.dirname(config.checkpoint_path)
    grids = [f for f in os.listdir(out_dir) if f.startswith("reconstruction_step")]
    assert len(grids) == 2  # first two batches of epoch 1


class TestEvaluateCLI:
    def test_evaluate_cli_all_partitions(self, trained_checkpoint, tmp_path):
        """The standalone eval CLI sweeps test+train (val skipped as the
        duplicate of test), writes JSON + latents, and reports the
        reference metric contract."""
        import json

        import numpy as np

        from midi_vae_tpu.cli.evaluate import cli

        json_out = str(tmp_path / "results.json")
        z_out = str(tmp_path / "z.npz")
        cli([
            "--checkpoint", trained_checkpoint,
            "--partition", "all",
            "--json", json_out,
            "--latents-out", z_out,
        ])
        with open(json_out) as f:
            results = json.load(f)
        assert set(results) == {"test", "train"}  # val == test, skipped
        for part, r in results.items():
            assert {"count", "cross-entropy", "mse", "mae", "kl", "active-units"} <= set(r)
            assert r["count"] > 0 and np.isfinite(r["mse"])
        z = np.load(z_out)
        assert z["latents_test"].shape == (results["test"]["count"], 8)
        assert z["latents_train"].shape == (results["train"]["count"], 8)


class TestExportThreshold:
    """--export-threshold: fixed override + auto-calibration (round 4,
    the duration-fragmentation fix from the generation dossier)."""

    def test_fixed_threshold(self, trained_checkpoint, tmp_path):
        from midi_vae_tpu.cli.generate import cli

        mid_dir = str(tmp_path / "mids_fixed")
        cli([
            "--checkpoint", trained_checkpoint, "--mode", "sample", "-n", "2",
            "--out", str(tmp_path / "s.png"), "--export-midi", mid_dir,
            "--export-threshold", "0.25",
        ])
        assert len(os.listdir(mid_dir)) == 2

    def test_auto_calibration(self, trained_checkpoint, tmp_path, capsys):
        from midi_vae_tpu.cli.generate import cli
        from midi_vae_tpu.midi.parse import parse_midi

        mid_dir = str(tmp_path / "mids_auto")
        cli([
            "--checkpoint", trained_checkpoint, "--mode", "sample", "-n", "2",
            "--out", str(tmp_path / "a.png"), "--export-midi", mid_dir,
            "--export-threshold", "auto",
        ])
        out = capsys.readouterr().out
        assert "calibrated export threshold" in out
        files = sorted(os.listdir(mid_dir))
        assert len(files) == 2
        parse_midi(os.path.join(mid_dir, files[0]))  # exports parse back cleanly

    def test_rejects_out_of_range(self, trained_checkpoint, tmp_path):
        import pytest

        from midi_vae_tpu.cli.generate import cli

        with pytest.raises(SystemExit, match="in \\(0, 1\\)"):
            cli([
                "--checkpoint", trained_checkpoint, "--mode", "sample", "-n", "1",
                "--out", str(tmp_path / "x.png"), "--export-midi", str(tmp_path / "m"),
                "--export-threshold", "1.5",
            ])
        with pytest.raises(SystemExit, match="float in \\(0, 1\\) or 'auto'"):
            cli([
                "--checkpoint", trained_checkpoint, "--mode", "sample", "-n", "1",
                "--out", str(tmp_path / "x.png"), "--export-midi", str(tmp_path / "m"),
                "--export-threshold", "bogus",
            ])

    def test_requires_export_midi(self, trained_checkpoint, tmp_path):
        import pytest

        from midi_vae_tpu.cli.generate import cli

        with pytest.raises(SystemExit, match="--export-midi"):
            cli([
                "--checkpoint", trained_checkpoint, "--mode", "sample", "-n", "1",
                "--out", str(tmp_path / "x.png"), "--export-threshold", "auto",
            ])
