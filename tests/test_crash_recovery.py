"""Fault injection: SIGKILL a real training process, resume from its
atomic checkpoint.

The reference's only recovery mechanism is conventions (always pass
--checkpoint, tolerate a missing file, atomic tmp+rename — SURVEY §5
"no heartbeats, no fault injection"). This test injects the actual
fault: a training subprocess is SIGKILLed at an arbitrary moment after
its first checkpoint lands (possibly mid-write — the atomic rename is
exactly what makes that safe), then the same command line restarts and
must resume from a valid checkpoint and finish every epoch.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _train_cmd(models_dir: str, epochs: int, ckpt: str = "") -> list:
    cmd = [
        sys.executable, "-m", "midi_vae_tpu.cli.train",
        "--dataset", "vae-lines-synthetic",
        "--transform", "noaug",
        "--image-size", "32",
        "--model", "MLPVAE",
        "--n_features", "8",
        "--hidden-dims", "64",
        "--epochs", str(epochs),
        "--batch-size", "16",
        "--seed", "0",
        "--models-dir", models_dir,
        "--run-name", "crash",
        "--run-id", "kill1",
        "--cpu",
    ]
    if ckpt:
        cmd += ["--checkpoint", ckpt]
    return cmd


@pytest.mark.slow
def test_sigkill_mid_training_then_resume(tmp_path):
    models_dir = str(tmp_path / "models")
    epochs = 6
    ckpt = os.path.join(models_dir, "vae-lines-synthetic", "crash__kill1", "checkpoint_latest.msgpack")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # plain 1-device CPU run

    proc = subprocess.Popen(
        _train_cmd(models_dir, epochs), env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # wait for the first checkpoint, then kill at an arbitrary later moment
        deadline = time.time() + 300
        while not os.path.exists(ckpt):
            assert proc.poll() is None, f"trainer died early:\n{proc.stdout.read()}"
            assert time.time() < deadline, "no checkpoint appeared within 300s"
            time.sleep(0.2)
        time.sleep(1.0)  # let it run into later epochs / possibly mid-save
    finally:
        if proc.poll() is None:
            proc.send_signal(signal.SIGKILL)
        proc.wait()

    # the surviving checkpoint must be valid and partial
    from midi_vae_tpu.io.checkpoint import load_checkpoint

    payload = load_checkpoint(ckpt)
    killed_at = int(payload["epoch"])
    assert 1 <= killed_at <= epochs

    # restart the SAME command line with --checkpoint: must resume and finish
    out = subprocess.run(
        _train_cmd(models_dir, epochs, ckpt), env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout
    assert "Loading state from checkpoint" in out.stdout or killed_at == epochs, out.stdout

    final = load_checkpoint(ckpt)
    assert int(final["epoch"]) == epochs
    assert int(final["total_step"]) > int(payload["total_step"]) or killed_at == epochs
