"""Driver for the code-augmentation sweep: retrain vq16 (the dossier
protocol, deterministic across hosts — the seeded pipeline reproduces
BCE -4.3711 exactly), then run ``sampling_sweep.py`` over
``--augment-passes`` {0, 3} at the two deployment top-p points.

Produces ``benchmarks/sampling_sweep_vq16_aug.json`` — the artifact the
nucleus-sweep section's augmentation follow-up publishes.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, HERE)

WORKDIR = os.environ.get("AUG_SWEEP_WORKDIR", "/tmp/aug_sweep")


def main():
    ckpt = os.path.join(WORKDIR, "vq16", "midi-synthetic", "vq16__qual",
                        "checkpoint_latest.msgpack")
    if not os.path.isfile(ckpt):
        from quality_check import run_variant

        print("=== retraining vq16 (60-epoch dossier protocol) ===", flush=True)
        row = run_variant("vq16", epochs=60, image_size=128, bf16=True,
                          workdir=WORKDIR, dataset="midi-synthetic")
        print(row, flush=True)
        assert os.path.isfile(ckpt), (
            f"run_variant finished but the expected checkpoint is missing: {ckpt} "
            "(quality_check.run_variant layout drifted?)"
        )

    cmd = [
        sys.executable, os.path.join(HERE, "sampling_sweep.py"),
        "--vq-checkpoint", ckpt,
        "--augment-grid", "0", "3",
        "--top-p-grid", "1.0", "0.95",
        "--thresholds", "0.1", "0.2",
        "--json-out", os.path.join(HERE, "sampling_sweep_vq16_aug.json"),
    ]
    print("=== sweep:", " ".join(cmd), flush=True)
    raise SystemExit(subprocess.call(cmd))


if __name__ == "__main__":
    main()
