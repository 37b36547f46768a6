"""The shipped two-stage generation recipe is reproducible from config
files alone (``configs/vq16_fold8.yaml``): stage 1 loads through the
flat YAML schema, stage 2 reads the same file's ``prior:`` section via
``train_prior --config``, and the documented runbook command sequence
(train VQ → train prior → generate → export MIDI) runs end-to-end.

Reference anchor: the reference's ``configs/vae.yaml`` is dead (never
parsed — SURVEY C14); this repo made stage 1 real in round 1 and stage 2
real here.
"""

import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "configs", "vq16_fold8.yaml")


class TestStage1Config:
    def test_loads_generation_flagship(self):
        from midi_vae_tpu.train.config import from_yaml

        c = from_yaml(CONFIG)
        assert c.arch == "FoldedVQVAE"
        assert c.fold == 8
        assert c.hidden_dims == (64, 128, 256)  # 3 stages -> 16x16 grid at 128px
        assert c.loss_type == "vq"
        assert c.n_features == 16
        assert c.codebook_size == 512
        assert c.kld_weight == 0.25  # commitment beta
        assert c.kl_schedule == "constant"
        assert c.bce_targets == "raw"
        assert c.output_bias_init == "auto"
        assert c.dataset_name == "midi-synthetic"
        assert c.image_size == 128
        assert c.epochs == 60  # the dossier protocol

    def test_prior_section_is_ignored_by_stage1(self):
        # from_dict filters to TrainConfig fields; the `prior:` mapping
        # must not leak into (or break) the stage-1 config
        from midi_vae_tpu.train.config import from_yaml

        c = from_yaml(CONFIG)
        assert not hasattr(c, "prior")


class TestPriorSection:
    def _parse(self, argv):
        from midi_vae_tpu.cli.train_prior import apply_prior_config, get_parser

        parser = get_parser()
        args = parser.parse_args(argv)
        return apply_prior_config(args, parser, argv)

    def test_section_supplies_defaults(self):
        args = self._parse(["--checkpoint", "x.msgpack", "--config", CONFIG])
        assert args.prior_arch == "transformer"
        assert args.features == 128
        assert args.layers == 6
        assert args.heads == 4
        assert args.epochs == 40
        assert args.lr == 3e-4
        assert args.batch_size == 256
        assert args.augment_passes == 10  # the measured quality lever (aug matrix: monotone to 10)
        assert args.seed == 0

    def test_explicit_flag_beats_section(self):
        args = self._parse(["--checkpoint", "x.msgpack", "--config", CONFIG,
                            "--epochs", "7", "--prior-arch", "pixelcnn"])
        assert args.epochs == 7
        assert args.prior_arch == "pixelcnn"
        assert args.features == 128  # untyped keys still come from the section

    def test_typed_flag_equal_to_default_beats_section(self):
        # parser default epochs=20, section says 40; typing --epochs 20 must
        # win (same regression the main trainer pins for its YAML loader)
        from midi_vae_tpu.cli.train_prior import get_parser

        default_epochs = get_parser().parse_args(["--checkpoint", "x"]).epochs
        args = self._parse(["--checkpoint", "x.msgpack", "--config", CONFIG,
                            f"--epochs={default_epochs}"])
        assert args.epochs == default_epochs

    def test_unknown_key_rejected(self, tmp_path):
        bad = tmp_path / "bad.yaml"
        bad.write_text("prior:\n  archh: transformer\n")
        with pytest.raises(SystemExit, match="archh"):
            self._parse(["--checkpoint", "x.msgpack", "--config", str(bad)])

    def test_config_without_prior_section_is_noop(self, tmp_path):
        plain = tmp_path / "plain.yaml"
        plain.write_text("epochs: 60\n")
        args = self._parse(["--checkpoint", "x.msgpack", "--config", str(plain)])
        from midi_vae_tpu.cli.train_prior import get_parser

        assert args.epochs == get_parser().parse_args(["--checkpoint", "x"]).epochs


def test_runbook_two_stage_end_to_end(tmp_path):
    """The OPERATIONS.md §1 runbook, from the shipped config: train the VQ
    stage with --config, train the prior with the same --config (its
    ``prior:`` section drives arch/capacity/augmentation), then generate
    through the prior with auto-calibrated export threshold and write
    playable .mid files. Scaled down by explicit CLI overrides only —
    every recipe value not overridden comes from the config file."""
    from midi_vae_tpu.cli.generate import cli as generate_cli
    from midi_vae_tpu.cli.train import cli as train_cli
    from midi_vae_tpu.cli.train_prior import cli as prior_cli, load_prior

    models_dir = str(tmp_path / "models")
    train_cli([
        "--config", CONFIG,
        # dense corpus + small rolls + short run: CPU-sized overrides
        "--dataset", "midi-synthetic-dense",
        "--image-size", "64",
        "--epochs", "2",
        "--batch-size", "64",
        "--models-dir", models_dir,
        "--run-name", "runbook", "--run-id", "rb1",
    ])
    ckpts = glob.glob(os.path.join(models_dir, "*", "*", "checkpoint_latest.msgpack"))
    assert len(ckpts) == 1, ckpts
    ckpt = ckpts[0]

    prior_path = str(tmp_path / "prior_latest.msgpack")
    prior_cli([
        "--checkpoint", ckpt, "--config", CONFIG, "--out", prior_path,
        # shrink capacity/epochs for CPU; arch + augment_passes stay config-driven
        "--epochs", "2", "--features", "16", "--layers", "2", "--heads", "2",
        "--no-eval",
    ])
    _, _, pcfg = load_prior(prior_path)
    assert pcfg["arch"] == "transformer"  # came from the config's prior section
    assert int(pcfg["augment_passes"]) == 10

    midi_dir = str(tmp_path / "midi")
    generate_cli([
        "--checkpoint", ckpt, "--prior", prior_path,
        "--mode", "sample", "-n", "4",
        "--export-midi", midi_dir, "--export-threshold", "auto",
        "--out", str(tmp_path / "samples.png"),
    ])
    mids = glob.glob(os.path.join(midi_dir, "*.mid"))
    assert len(mids) == 4, mids
