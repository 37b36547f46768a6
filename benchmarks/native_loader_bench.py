"""Host input-pipeline benchmark: native C++ loader vs pure-Python batching.

Measures the host-side batch-assembly rate (shuffled gather from an RRD
file / in-memory array) that feeds the device pipeline — the component
the reference delegates to DataLoader worker processes
(train.py:168-191). Run: ``python benchmarks/native_loader_bench.py``.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, H, W, C = 20000, 128, 128, 1
BATCH = 256
EPOCHS = 3


def main():
    from midi_vae_tpu.data.pipeline import DeviceLoader  # noqa: F401 (import check)
    from midi_vae_tpu.data.sources import ArrayDataset
    from midi_vae_tpu.native.rrd import NativeDataset, NativeLoader, native_available, write_rrd

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (N, H, W, C)).astype(np.uint8)
    labels = rng.integers(0, 4, N).astype(np.int64)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bench.rrd")
        write_rrd(images, labels, path)

        results = {}

        # pure-python shuffled gather (what DeviceLoader does per batch)
        ds = ArrayDataset(images=images, labels=labels, name="bench")
        t0 = time.perf_counter()
        n_served = 0
        for epoch in range(EPOCHS):
            order = np.random.default_rng(epoch).permutation(N)[: (N // BATCH) * BATCH]
            for i in range(0, len(order), BATCH):
                batch = ds.images[order[i : i + BATCH]]
                n_served += len(batch)
        results["python_samples_per_sec"] = round(n_served / (time.perf_counter() - t0))

        if native_available():
            nds = NativeDataset(path)
            for threads in (1, 2, 4, 8):
                loader = NativeLoader(nds, BATCH, n_threads=threads, prefetch_depth=4)
                t0 = time.perf_counter()
                n_served = 0
                for epoch in range(EPOCHS):
                    for _, _, valid in loader.epoch(seed=epoch):
                        n_served += valid
                results[f"native_{threads}t_samples_per_sec"] = round(
                    n_served / (time.perf_counter() - t0)
                )
                loader.close()
            nds.close()

        print(json.dumps(results))


if __name__ == "__main__":
    main()
