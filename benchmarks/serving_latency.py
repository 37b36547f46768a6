"""Serving-path latency benchmark: micro-batched inference under load.

Measures what a serving operator actually cares about — per-request
latency percentiles (p50/p95/p99) and aggregate throughput — for the
reconstruct path at several concurrency levels. The timed object IS the
server's own `InferenceService.reconstruct` batcher (`serving/server.py`
builds the jitted posterior-mean encode→decode program and the
MicroBatcher in one place), so the benchmark and the live handler
execute one code path. `--http` goes one layer further and fires JSON
requests at a real `ThreadingHTTPServer` endpoint, measuring the full
wire path (JSON encode/decode dominates at 128px — the table shows both).

The reference has no serving story at all (SURVEY §1: "no serving
layer"); this pins the numbers for ours. Run on the TPU:

    python benchmarks/serving_latency.py [--requests 200] [--levels 1 4 16 64] [--http]

Methodology notes (same platform gotchas as bench.py):
- every bucket size is warmed (compiled + executed) before timing, so
  percentiles measure steady state, not compiles;
- each request's latency closes with the materialized numpy result
  (Future.result() returns host arrays — a value cannot lie);
- the batcher's max_wait window (default 2 ms) lower-bounds latency at
  low concurrency by design; the table shows the batching win at high
  concurrency against that cost.
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

IMAGE_SIZE = 128


def build_service(arch="FoldedVAE", bf16=True, max_batch=64, max_wait_ms=2.0):
    """The server's own InferenceService over a randomly-initialized model —
    `service.reconstruct` is the exact MicroBatcher + jitted program the
    HTTP handler dispatches to."""
    import jax
    import jax.numpy as jnp

    from midi_vae_tpu.models.registry import build_model
    from midi_vae_tpu.serving.server import InferenceService

    model = build_model(
        arch,
        in_channels=1,
        latent_dim=10,
        input_dim=IMAGE_SIZE,
        hidden_dims=(32, 64, 128, 256),
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    x0 = jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 1), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, x0)
    service = InferenceService.from_parts(
        model, variables["params"], variables.get("batch_stats", {}),
        IMAGE_SIZE, 1, max_batch=max_batch, max_wait_ms=max_wait_ms,
    )
    return service


def warm_buckets(fn, max_batch):
    """Compile + execute every static bucket size before timing."""
    from midi_vae_tpu.serving.batcher import _BUCKETS

    for b in _BUCKETS:
        if b > max_batch:
            break
        fn(np.zeros((b, IMAGE_SIZE, IMAGE_SIZE, 1), np.float32))


def run_level_http(url: str, concurrency: int, requests_per_thread: int, req_rows: int = 1,
                   wire: str = "json"):
    """Same shape as run_level, but each request is a real HTTP POST to the
    live /reconstruct endpoint. ``wire="json"`` measures the nested-list
    JSON body/response; ``wire="npy"`` the binary production path
    (Content-Type: application/x-npy both ways)."""
    import json as _json
    import urllib.request

    from midi_vae_tpu.serving.server import NPY_CONTENT_TYPE, npy_dumps, npy_loads

    latencies = []
    lock = threading.Lock()
    x = np.random.default_rng(0).random((req_rows, IMAGE_SIZE, IMAGE_SIZE, 1), np.float32)
    if wire == "npy":
        body, headers = npy_dumps(x), {"Content-Type": NPY_CONTENT_TYPE}
    else:
        body, headers = _json.dumps({"images": x.tolist()}).encode(), {"Content-Type": "application/json"}

    def worker():
        local = []
        for _ in range(requests_per_thread):
            t0 = time.perf_counter()
            req = urllib.request.Request(url + "/reconstruct", data=body, headers=headers)
            with urllib.request.urlopen(req, timeout=120) as resp:
                if wire == "npy":
                    out = npy_loads(resp.read())
                    assert out.shape[0] == req_rows
                else:
                    out = _json.loads(resp.read())
                    assert len(out["reconstructions"]) == req_rows
            local.append(time.perf_counter() - t0)
        with lock:
            latencies.extend(local)

    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    lat = np.sort(np.array(latencies)) * 1000.0
    n = len(lat)
    return {
        "concurrency": concurrency,
        "requests": n,
        "p50_ms": round(float(lat[n // 2]), 2),
        "p95_ms": round(float(lat[int(n * 0.95)]), 2),
        "p99_ms": round(float(lat[min(n - 1, int(n * 0.99))]), 2),
        "throughput_req_per_s": round(n / wall, 1),
        "samples_per_s": round(n * req_rows / wall, 1),
    }


def run_level(batcher, concurrency: int, requests_per_thread: int, req_rows: int = 1):
    """Fire `concurrency` threads, each sending sequential requests; collect
    per-request wall latencies (submit → numpy result)."""
    latencies = []
    lock = threading.Lock()
    x = np.random.default_rng(0).random((req_rows, IMAGE_SIZE, IMAGE_SIZE, 1), np.float32)

    def worker():
        local = []
        for _ in range(requests_per_thread):
            t0 = time.perf_counter()
            out = batcher(x)
            assert out.shape[0] == req_rows
            local.append(time.perf_counter() - t0)
        with lock:
            latencies.extend(local)

    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    lat = np.sort(np.array(latencies)) * 1000.0  # ms
    n = len(lat)
    return {
        "concurrency": concurrency,
        "requests": n,
        "p50_ms": round(float(lat[n // 2]), 2),
        "p95_ms": round(float(lat[int(n * 0.95)]), 2),
        "p99_ms": round(float(lat[min(n - 1, int(n * 0.99))]), 2),
        "throughput_req_per_s": round(n / wall, 1),
        "samples_per_s": round(n * req_rows / wall, 1),
    }


def run_sample_latency(service, n: int, reps: int = 30, temperature: float = 1.0) -> dict:
    """/sample latency (no batcher — already batched by n): p50/p95 over
    ``reps`` calls with distinct seeds (same compiled program, fresh draws)."""
    service.sample(n, seed=0, temperature=temperature)  # warm the bucket compile
    lat = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = service.sample(n, seed=i + 1, temperature=temperature)
        assert out.shape[0] == n  # host-materialized: the timer cannot lie
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.sort(np.asarray(lat))
    return {
        "n": n,
        "p50_ms": round(float(np.percentile(lat, 50)), 2),
        "p95_ms": round(float(np.percentile(lat, 95)), 2),
        "samples_per_sec": round(n / (np.median(lat) / 1e3), 1),
    }


def run_sample_level(service, concurrency: int, requests_per_thread: int,
                     rows: int = 1) -> dict:
    """/sample under concurrent load: `concurrency` threads each fire
    sequential sample(rows) calls with distinct seeds. sample() is
    stateless per call (seeded PRNG in, host array out), so threads
    measure real queueing behind the single device."""
    service.sample(rows, seed=0)  # warm the bucket compile
    lat, lock = [], threading.Lock()

    def worker(tid: int):
        for i in range(requests_per_thread):
            t0 = time.perf_counter()
            out = service.sample(rows, seed=tid * 100_000 + i + 1)
            assert out.shape[0] == rows
            dt = (time.perf_counter() - t0) * 1e3
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    arr = np.sort(np.asarray(lat))
    return {
        "concurrency": concurrency,
        "requests": len(arr),
        "rows_per_request": rows,
        "p50_ms": round(float(np.percentile(arr, 50)), 2),
        "p95_ms": round(float(np.percentile(arr, 95)), 2),
        "throughput_req_per_s": round(len(arr) / wall, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=200, help="requests per thread")
    ap.add_argument("--levels", type=int, nargs="+", default=[1, 4, 16, 64])
    ap.add_argument("--rows", type=int, default=1, help="rows (images) per request")
    ap.add_argument("--arch", default="FoldedVAE")
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--max-wait-ms", type=float, default=2.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--http", action="store_true",
                    help="also measure through a live HTTP endpoint (full wire path)")
    ap.add_argument("--wire", nargs="+", default=["json"], choices=["json", "npy"],
                    help="wire format(s) for --http: JSON nested lists and/or the "
                         "binary npy production path")
    ap.add_argument("--sample-checkpoint", default=None, metavar="CKPT",
                    help="ALSO measure /sample latency on this trained VQ checkpoint: "
                         "EMA-marginal sampling, and two-stage prior sampling when "
                         "--sample-prior is given (the round-4 serving surface)")
    ap.add_argument("--sample-prior", default=None, metavar="PATH",
                    help="Trained code prior for the two-stage /sample row")
    ap.add_argument("--sample-artifact", default=None, metavar="DIR",
                    help="ALSO measure /sample on an AOT-exported artifact dir "
                         "(aot_export --prior): the baked StableHLO two-stage "
                         "sampler, the artifact-only deployment path")
    ap.add_argument("--sample-ns", type=int, nargs="+", default=[1, 8, 64])
    ap.add_argument("--sample-concurrency", type=int, nargs="+", default=[1, 16],
                    help="concurrent-caller levels for the /sample rows")
    ap.add_argument("--sample-requests", type=int, default=20,
                    help="requests per thread at each /sample concurrency level")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    print(f"backend: {jax.devices()[0].platform}", flush=True)

    service = build_service(arch=args.arch, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)
    batcher = service.reconstruct  # the handler's own batcher — one code path
    print("warming buckets (compiles)...", flush=True)
    warm_buckets(batcher, args.max_batch)

    results = []
    for level in args.levels:
        r = run_level(batcher, level, args.requests, req_rows=args.rows)
        results.append(r)
        print(json.dumps(r), flush=True)

    http_results = []
    if args.http:
        from http.server import ThreadingHTTPServer

        from midi_vae_tpu.serving.server import make_handler

        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        print(f"live endpoint: {url}", flush=True)
        for wire in args.wire:
            for level in args.levels:
                r = run_level_http(url, level, args.requests, req_rows=args.rows, wire=wire)
                http_results.append({"wire": wire, **r})
                print(json.dumps({"http": True, "wire": wire, **r}), flush=True)
        httpd.shutdown()
    service.close()

    sample_results = []
    if args.sample_checkpoint:
        from midi_vae_tpu.serving.server import InferenceService

        svc = InferenceService(args.sample_checkpoint)
        for n in args.sample_ns:
            r = {"path": "ema-marginal", **run_sample_latency(svc, n)}
            sample_results.append(r)
            print(json.dumps(r), flush=True)
        svc.close()
        if args.sample_prior:
            svc = InferenceService(args.sample_checkpoint, prior_path=args.sample_prior)
            for n in args.sample_ns:
                r = {"path": "two-stage prior", "backend": "checkpoint",
                     **run_sample_latency(svc, n)}
                sample_results.append(r)
                print(json.dumps(r), flush=True)
            for c in args.sample_concurrency:
                r = {"path": "two-stage prior", "backend": "checkpoint",
                     **run_sample_level(svc, c, args.sample_requests)}
                sample_results.append(r)
                print(json.dumps(r), flush=True)
            svc.close()
    if args.sample_artifact:
        from midi_vae_tpu.serving.server import InferenceService

        svc = InferenceService.from_artifact(args.sample_artifact)
        for n in args.sample_ns:
            r = {"path": "two-stage prior", "backend": "artifact",
                 **run_sample_latency(svc, n)}
            sample_results.append(r)
            print(json.dumps(r), flush=True)
        for c in args.sample_concurrency:
            r = {"path": "two-stage prior", "backend": "artifact",
                 **run_sample_level(svc, c, args.sample_requests)}
            sample_results.append(r)
            print(json.dumps(r), flush=True)
        svc.close()

    out = {
        "backend": jax.devices()[0].platform,
        "arch": args.arch,
        "max_batch": args.max_batch,
        "max_wait_ms": args.max_wait_ms,
        "rows_per_request": args.rows,
        "levels": results,
        "http_levels": http_results,
        "sample_levels": sample_results,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "serving_latency.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    if sample_results:
        splice_sample_section(sample_results)


def splice_sample_section(sample_results) -> None:
    """Rewrite the AUTOGEN SERVING SAMPLE block of RESULTS.md (same
    regenerate-in-session rule as every published table)."""
    import re

    results_md = os.path.join(os.path.dirname(os.path.abspath(__file__)), "RESULTS.md")
    begin = "<!-- BEGIN AUTOGEN SERVING SAMPLE -->"
    end = "<!-- END AUTOGEN SERVING SAMPLE -->"
    lines = [begin,
             "| path | backend | load | p50 | p95 | throughput |",
             "|---|---|---|---|---|---|"]
    for r in sample_results:
        if "concurrency" in r:
            load = f"concurrency {r['concurrency']} (1 roll/req)"
            thr = f"{r['throughput_req_per_s']} req/s"
        else:
            load = f"batch n={r['n']} (sequential)"
            thr = f"{r['samples_per_sec']} samples/s"
        lines.append(
            f"| {r.get('path', '/sample')} | {r.get('backend', '—')} | {load} | "
            f"{r['p50_ms']} ms | {r['p95_ms']} ms | {thr} |"
        )
    lines.append("\n(regenerated by `benchmarks/serving_latency.py "
                 "--sample-checkpoint ... --sample-prior ... --sample-artifact ...`)")
    lines.append(end)
    block = "\n".join(lines)
    with open(results_md) as f:
        text = f.read()
    pattern = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.DOTALL)
    if not pattern.search(text):
        print(f"NOTE: RESULTS.md has no {begin} markers; skipping splice")
        return
    with open(results_md, "w") as f:
        f.write(pattern.sub(lambda _: block, text))
    print("rewrote RESULTS.md AUTOGEN SERVING SAMPLE section")


if __name__ == "__main__":
    main()
