"""Device-resident vs host-fed corpus training throughput (round-3 #2).

Round 2 measured host-fed RRD training at 1,811 samples/sec in this
environment — each batch's ``device_put`` pays the remote tunnel's ~1 s
round-trip. ``--data-placement device`` uploads the corpus once and runs
the shuffled gather + transform inside jit, so only a scalar batch index
crosses the link per step. This benchmark builds the same 16k-sample
128px RRD corpus as round 2's measurement, then times steady-state
training through BOTH loader paths with the platform's trustworthy
timing (windows closed by materializing the loss value).

Run on the TPU:

    python benchmarks/device_residency_bench.py [--epochs 3] [--batch 256]

Prints one JSON line per path and writes device_residency.json.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N, SIZE = 16384, 128


def build_corpus(path):
    from midi_vae_tpu.native.rrd import write_rrd

    rng = np.random.default_rng(0)
    # sparse piano-roll-like content (~2% fill), labels = coarse density bin
    images = (rng.random((N, SIZE, SIZE, 1)) < 0.02).astype(np.uint8) * 255
    labels = images.reshape(N, -1).sum(axis=1).astype(np.int64) % 4
    write_rrd(images, labels, path)


def time_training(loader, train_step, state, ekey, epochs, warmup_epochs=1):
    """Steady-state samples/sec over `epochs` timed epochs (after warmup)."""
    import jax

    n = 0
    lo = None
    for e in range(1, warmup_epochs + 1):  # compile + cold caches
        for batch in loader.epoch(e):
            state, lo, _ = train_step(state, batch.x, ekey)
    float(lo.loss)
    t0 = time.perf_counter()
    for e in range(warmup_epochs + 1, warmup_epochs + epochs + 1):
        for batch in loader.epoch(e):
            state, lo, _ = train_step(state, batch.x, ekey)
            n += batch.x.shape[0]
    final = float(lo.loss)  # value materialization closes the window
    dt = time.perf_counter() - t0
    return n / dt, final, state


def time_training_scan(loader, train_step, state, epochs, chunk, warmup_epochs=1):
    """Scan-chunked variant: epoch_scan (N steps per dispatch)."""
    import numpy as np

    n = 0
    m = None
    for e in range(1, warmup_epochs + 1):
        for state, ys in loader.epoch_scan(state, train_step, e, chunk=chunk):
            m = ys
    float(np.asarray(m)[-1, 0])
    t0 = time.perf_counter()
    for e in range(warmup_epochs + 1, warmup_epochs + epochs + 1):
        for state, ys in loader.epoch_scan(state, train_step, e, chunk=chunk):
            m = ys
            n += ys.shape[0] * loader.batch_size
    final = float(np.asarray(m)[-1, 0])  # materialization closes the window
    dt = time.perf_counter() - t0
    return n / dt, final, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--placements", nargs="+", default=["device_scan64", "device", "host"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from midi_vae_tpu.core.rng import epoch_key
    from midi_vae_tpu.data.fetch import fetch_dataset
    from midi_vae_tpu.data.pipeline import make_loader
    from midi_vae_tpu.data.transforms import get_transform
    from midi_vae_tpu.losses.schedules import kl_weight_schedule
    from midi_vae_tpu.models.registry import build_model
    from midi_vae_tpu.models.vae import param_group_label
    from midi_vae_tpu.train.optim import build_optimizer
    from midi_vae_tpu.train.state import create_train_state, make_train_step

    print(f"backend: {jax.devices()[0].platform}", flush=True)
    tmp = tempfile.mkdtemp(prefix="resbench_")
    path = os.path.join(tmp, "corpus.rrd")
    build_corpus(path)
    print(f"corpus: {os.path.getsize(path) / 2**20:.0f} MiB on disk", flush=True)

    transform_train, _ = get_transform("pianoroll", SIZE, {})
    train_ds, _, _, _ = fetch_dataset(
        f"rrd:{path}", transform_train=transform_train, transform_eval=transform_train
    )

    model = build_model(
        "FoldedVAE", in_channels=1, latent_dim=10, input_dim=SIZE,
        hidden_dims=(32, 64, 128, 256), fold=8, dtype=jnp.bfloat16,
    )
    bundle = build_optimizer(
        None, param_group_label, optimizer="AdamW", lr=1e-3, scheduler="OneCycle", total_steps=100000
    )
    results = {}
    for placement in args.placements:
        state = create_train_state(
            model, bundle.tx, jax.random.PRNGKey(0), jnp.zeros((2, SIZE, SIZE, 1), jnp.float32)
        )
        step = make_train_step(model, bundle.tx, kl_weight_schedule("constant", 2.5e-4))
        scan_chunk = None
        load_as = placement
        if placement.startswith("device_scan"):
            scan_chunk = int(placement[len("device_scan"):] or 64)
            load_as = "device"
        loader = make_loader(train_ds, args.batch, train=True, seed=0, placement=load_as)
        if scan_chunk:
            rate, final, _ = time_training_scan(loader, step, state, args.epochs, scan_chunk)
        else:
            rate, final, _ = time_training(loader, step, state, epoch_key(0, 1), args.epochs)
        results[placement] = {"samples_per_sec": round(rate, 1), "final_loss": round(final, 5)}
        print(json.dumps({"placement": placement, **results[placement]}), flush=True)
        if hasattr(loader, "close"):
            loader.close()

    out = {"batch": args.batch, "epochs_timed": args.epochs, "corpus_samples": N, **results}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "device_residency.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote benchmarks/device_residency.json")


if __name__ == "__main__":
    main()
