"""MetricLogger tests: JSONL fan-out, namespaces, leader gating, wandb fallback."""

import json
import os

from midi_vae_tpu.io.logging import MetricLogger, generate_id


class TestMetricLogger:
    def test_jsonl_roundtrip(self, tmp_path):
        logger = MetricLogger(str(tmp_path))
        logger.log({"training/stepwise/train/loss": 1.5, "training/stepwise/epoch": 1}, step=10)
        logger.log_namespaced("eval/test", {"mse": 2.0}, step=20)
        logger.close()
        lines = [json.loads(ln) for ln in open(tmp_path / "metrics.jsonl")]
        assert lines[0]["step"] == 10 and lines[0]["training/stepwise/train/loss"] == 1.5
        assert lines[1]["eval/test/mse"] == 2.0

    def test_non_leader_writes_nothing(self, tmp_path):
        logger = MetricLogger(str(tmp_path / "sub"), is_leader=False)
        logger.log({"x": 1}, step=0)
        logger.close()
        assert not os.path.exists(tmp_path / "sub" / "metrics.jsonl")

    def test_wandb_missing_degrades(self, tmp_path, monkeypatch):
        # simulate wandb being uninstalled (a None sys.modules entry makes
        # `import wandb` raise ImportError) — must fall back to JSONL
        import sys

        monkeypatch.setitem(sys.modules, "wandb", None)
        logger = MetricLogger(str(tmp_path), use_wandb=True)
        assert logger.wandb_run is None
        logger.log({"y": 2.0}, step=1)
        logger.close()
        assert os.path.isfile(tmp_path / "metrics.jsonl")

    def test_numpy_values_serialize(self, tmp_path):
        import numpy as np

        logger = MetricLogger(str(tmp_path))
        logger.log({"z": np.float32(3.25), "n": np.int64(7)}, step=0)
        logger.close()
        line = json.loads(open(tmp_path / "metrics.jsonl").readline())
        assert line["z"] == 3.25 and line["n"] == 7


def test_generate_id_format():
    a, b = generate_id(), generate_id()
    assert a != b
    assert len(a) == 8 and a.isalnum()


def test_wandb_config_exclusion_list(tmp_path, monkeypatch):
    """The uploaded config omits EXCLUDED_WANDB_CONFIG_KEYS (reference:
    train.py:254-263) but keeps real hyperparameters."""
    import sys
    import types

    captured = {}

    fake = types.ModuleType("wandb")

    class _Run:
        id = "r1"

        def log(self, *a, **k):
            pass

    def init(**kwargs):
        captured.update(kwargs)
        return _Run()

    fake.init = init
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from midi_vae_tpu.io.logging import MetricLogger

    cfg = {
        "epochs": 5, "lr_relative": 0.01,
        "log_wandb": True, "wandb_entity": "me", "wandb_project": "p",
        "run_name": "n", "run_id": "i", "model_output_dir": "/x",
    }
    logger = MetricLogger(str(tmp_path), use_wandb=True, config=cfg)
    assert logger.wandb_run is not None
    up = captured["config"]
    assert up["epochs"] == 5 and up["lr_relative"] == 0.01
    for noisy in ("log_wandb", "wandb_entity", "wandb_project", "run_name", "run_id", "model_output_dir"):
        assert noisy not in up


def test_wandb_preemption_resume_uses_modern_api(tmp_path, monkeypatch):
    """A persisted run id must resume via id=.../resume='must' — the legacy
    wandb.init(resume=<id>) form silently starts a FRESH run on current
    wandb versions, breaking the preemption-resume contract (utils.py:63-78)."""
    import sys
    import types

    calls = []

    fake = types.ModuleType("wandb")

    class _Run:
        id = "persisted-id"

        def log(self, *a, **k):
            pass

    fake.init = lambda **kw: (calls.append(kw), _Run())[1]
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from midi_vae_tpu.io.logging import MetricLogger

    # first init: writes the run-id file
    MetricLogger(str(tmp_path), use_wandb=True, run_id="persisted-id")
    assert calls[0]["id"] == "persisted-id" and "resume" not in calls[0]
    assert open(f"{tmp_path}/wandb_runid.txt").read().strip() == "persisted-id"
    # preemption restart: same output dir → resume by id, must-exist
    MetricLogger(str(tmp_path), use_wandb=True, run_id="fresh-would-be-wrong")
    assert calls[1]["id"] == "persisted-id"
    assert calls[1]["resume"] == "must"
