"""Serving subsystem tests: micro-batcher semantics and the HTTP server."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from midi_vae_tpu.serving.batcher import MicroBatcher, _bucket


class TestBucket:
    def test_rounds_up_to_bucket(self):
        assert _bucket(1) == 1
        assert _bucket(3) == 4
        assert _bucket(65) == 128
        assert _bucket(300) == 512  # beyond the table: multiples of 256


class TestMicroBatcher:
    def test_result_roundtrip(self):
        batcher = MicroBatcher(lambda x: x * 2.0, max_wait_ms=1.0)
        x = np.arange(6, dtype=np.float32).reshape(3, 2)
        np.testing.assert_array_equal(batcher(x), x * 2)
        batcher.close()

    def test_concurrent_requests_coalesce(self):
        calls = []

        def fn(x):
            calls.append(len(x))
            time.sleep(0.01)
            return x + 1.0

        batcher = MicroBatcher(fn, max_batch=64, max_wait_ms=50.0)
        futs = []
        for i in range(8):
            futs.append(batcher.submit(np.full((2, 3), float(i), np.float32)))
        outs = [f.result(timeout=5) for f in futs]
        for i, out in enumerate(outs):
            np.testing.assert_array_equal(out, np.full((2, 3), float(i) + 1.0))
        # all 8 requests fit the window → far fewer dispatches than requests
        assert batcher.batches_dispatched < 8
        assert batcher.requests_served == 8
        # dispatched batches are padded to static bucket sizes
        assert all(c in (1, 2, 4, 8, 16, 32, 64) for c in calls)
        batcher.close()

    def test_error_propagates(self):
        def fn(x):
            raise ValueError("boom")

        batcher = MicroBatcher(fn, max_wait_ms=1.0)
        with pytest.raises(ValueError, match="boom"):
            batcher(np.zeros((1, 2), np.float32))
        batcher.close()

    def test_shape_mismatch_rejected_at_submit_only_offender(self):
        """A malformed request is rejected at its own submit() — co-batched
        well-formed requests are unaffected and the dispatcher survives."""
        batcher = MicroBatcher(lambda x: x, max_batch=64, max_wait_ms=30.0)
        f1 = batcher.submit(np.zeros((1, 4, 4, 1), np.float32))
        with pytest.raises(ValueError, match="item shape"):
            batcher.submit(np.zeros((1, 8, 8, 1), np.float32))  # mismatched: only IT errors
        out1 = f1.result(timeout=5)  # the innocent co-batched request still serves
        assert out1.shape == (1, 4, 4, 1)
        assert batcher._thread.is_alive()
        out = batcher(np.ones((2, 4, 4, 1), np.float32))
        assert out.shape == (2, 4, 4, 1)
        batcher.close()

    def test_fixed_item_shape_rejects_first_bad_request(self):
        """With item_shape pinned up front (as the server does), even the
        FIRST request is validated instead of setting a wrong contract."""
        batcher = MicroBatcher(lambda x: x, max_wait_ms=5.0, item_shape=(4, 4, 1))
        with pytest.raises(ValueError, match="item shape"):
            batcher.submit(np.zeros((1, 8, 8, 1), np.float32))
        with pytest.raises(ValueError, match="non-empty"):
            batcher.submit(np.zeros((0, 4, 4, 1), np.float32))
        out = batcher(np.ones((3, 4, 4, 1), np.float32))
        assert out.shape == (3, 4, 4, 1)
        batcher.close()

    def test_max_batch_is_a_hard_cap(self):
        """Coalescing must never dispatch more rows than max_batch
        (regression: over-admission + bucket rounding doubled the cap)."""
        calls = []

        def fn(x):
            calls.append(len(x))
            time.sleep(0.005)
            return x

        batcher = MicroBatcher(fn, max_batch=8, max_wait_ms=30.0)
        futs = [batcher.submit(np.zeros((5, 2), np.float32)) for _ in range(4)]
        for f in futs:
            f.result(timeout=5)
        assert all(c <= 8 for c in calls), calls
        batcher.close()

    def test_oversized_submit_chunks_to_cap(self):
        """A single submit larger than max_batch is served in max_batch-sized
        chunks: fn never sees more than max_batch rows (bounded compile
        cache) and the caller still gets the full stitched result."""
        calls = []

        def fn(x):
            calls.append(len(x))
            return x * 2

        batcher = MicroBatcher(fn, max_batch=8, max_wait_ms=1.0)
        x = np.arange(20 * 2, dtype=np.float32).reshape(20, 2)
        out = batcher.submit(x).result(timeout=5)
        np.testing.assert_array_equal(out, x * 2)
        assert all(c <= 8 for c in calls), calls
        # the /healthz occupancy math counts DEVICE batches: one per chunk,
        # not one per dispatch tick (20 rows @ cap 8 → 3 chunks)
        assert batcher.batches_dispatched == len(calls) == 3
        batcher.close()

    def test_close_never_strands_a_carried_request(self):
        """A request parked in the carry slot mid-tick must resolve (with
        'batcher closed') when close() races the tick — the loop's exit
        path resolves it even after close()'s drain already ran."""
        import time

        from midi_vae_tpu.serving.batcher import MicroBatcher

        def slow_double(x):
            time.sleep(0.2)
            return x * 2

        batcher = MicroBatcher(slow_double, max_batch=4, max_wait_ms=500)
        f_a = batcher.submit(np.ones((4, 2), np.float32))  # tick 1 dispatches
        time.sleep(0.05)
        f_b = batcher.submit(np.ones((3, 2), np.float32))  # tick 2 head
        f_c = batcher.submit(np.ones((4, 2), np.float32))  # overflows → carried
        time.sleep(0.25)  # tick 2 is now dispatching f_b with f_c parked
        batcher.close()
        np.testing.assert_array_equal(f_a.result(timeout=5), np.full((4, 2), 2, np.float32))
        np.testing.assert_array_equal(f_b.result(timeout=5), np.full((3, 2), 2, np.float32))
        with pytest.raises(RuntimeError, match="closed"):
            f_c.result(timeout=5)

    def test_closed_batcher_rejects(self):
        batcher = MicroBatcher(lambda x: x, max_wait_ms=1.0)
        batcher.close()
        with pytest.raises(RuntimeError):
            batcher.submit(np.zeros((1, 2)))


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import jax

    from midi_vae_tpu.serving.server import serve
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    tmp_path = tmp_path_factory.mktemp("serve")
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
        log_images=False,
        run_name="srv",
        run_id="srv1",
    )
    run(config)
    httpd = serve(config.checkpoint_path, port=0)  # ephemeral port
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()
    httpd.service.close()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


class TestServer:
    def test_healthz(self, server):
        with urllib.request.urlopen(f"{server}/healthz", timeout=10) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["image_size"] == 32
        assert health["latent_dim"] == 8

    def test_sample(self, server):
        out = _post(f"{server}/sample", {"n": 3, "seed": 1})
        samples = np.asarray(out["samples"])
        assert samples.shape == (3, 32, 32, 1)
        assert (samples >= 0).all() and (samples <= 1).all()

    def test_reconstruct_and_encode(self, server):
        x = np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 1)).astype(np.float32)
        rec = np.asarray(_post(f"{server}/reconstruct", {"images": x.tolist()})["reconstructions"])
        assert rec.shape == x.shape
        enc = _post(f"{server}/encode", {"images": x.tolist()})
        assert np.asarray(enc["mu"]).shape == (2, 8)
        assert np.asarray(enc["log_var"]).shape == (2, 8)

    def test_concurrent_load_batches(self, server):
        """Parallel clients coalesce into shared device batches."""
        x = np.random.default_rng(1).uniform(0, 1, (1, 32, 32, 1)).astype(np.float32).tolist()
        results = [None] * 12
        errors = []

        def worker(i):
            try:
                results[i] = _post(f"{server}/reconstruct", {"images": x})
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert not errors
        assert all(r is not None for r in results)

    def test_reconstruct_is_posterior_mean_deterministic(self, server):
        """/reconstruct decodes the posterior MEAN (the benched path) — no
        per-request noise, so the same input reconstructs identically."""
        x = np.random.default_rng(4).uniform(0, 1, (1, 32, 32, 1)).astype(np.float32).tolist()
        r1 = np.asarray(_post(f"{server}/reconstruct", {"images": x})["reconstructions"])
        r2 = np.asarray(_post(f"{server}/reconstruct", {"images": x})["reconstructions"])
        np.testing.assert_array_equal(r1, r2)

    def test_oversized_sample_request_rejected(self, server):
        req = urllib.request.Request(
            f"{server}/sample", data=json.dumps({"n": 10**6}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=10)
        assert exc_info.value.code == 400

    def test_bad_request_is_400(self, server):
        req = urllib.request.Request(
            f"{server}/reconstruct", data=b'{"wrong": 1}', headers={"Content-Type": "application/json"}
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=10)
        assert exc_info.value.code == 400

    def test_oversized_reconstruct_request_rejected(self, server):
        """/reconstruct caps the per-request image count like /sample caps n —
        one request must not allocate an unbounded device batch."""
        x = np.zeros((1025, 4, 4, 1), np.float32)  # count is checked before shape
        req = urllib.request.Request(
            f"{server}/reconstruct", data=json.dumps({"images": x.tolist()}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 400
        assert "at most" in json.loads(exc_info.value.read())["error"]

    def test_healthz_reports_encode_counters(self, server):
        x = np.random.default_rng(7).uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
        _post(f"{server}/encode", {"images": x.tolist()})
        with urllib.request.urlopen(f"{server}/healthz", timeout=10) as resp:
            health = json.loads(resp.read())
        assert health["encode_requests_served"] >= 1
        assert health["encode_batches_dispatched"] >= 1


class TestInterpolateEndpoint:
    def test_interpolate(self, server):
        rng = np.random.default_rng(2)
        a = rng.uniform(0, 1, (32, 32, 1)).astype(np.float32)
        b = rng.uniform(0, 1, (32, 32, 1)).astype(np.float32)
        out = _post(f"{server}/interpolate", {"a": a.tolist(), "b": b.tolist(), "steps": 5})
        path = np.asarray(out["path"])
        assert path.shape == (5, 32, 32, 1)
        assert (path >= 0).all() and (path <= 1).all()
        # consecutive frames differ: it's a path, not a constant
        assert np.abs(path[0] - path[-1]).max() > 1e-4

    def test_interpolate_steps_clamped(self, server):
        """A huge steps value must be a 400, not an unbounded allocation."""
        a = np.zeros((32, 32, 1), np.float32).tolist()
        req = urllib.request.Request(
            f"{server}/interpolate",
            data=json.dumps({"a": a, "b": a, "steps": 100000}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=10)
        assert exc_info.value.code == 400

    def test_interpolate_wrong_shape_rejected(self, server):
        a = np.zeros((8, 8, 1), np.float32).tolist()  # wrong size for a 32px model
        req = urllib.request.Request(
            f"{server}/interpolate",
            data=json.dumps({"a": a, "b": a, "steps": 4}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=10)
        assert exc_info.value.code == 400

    def test_interpolate_slerp(self, server):
        rng = np.random.default_rng(3)
        a = rng.uniform(0, 1, (32, 32, 1)).astype(np.float32)
        b = rng.uniform(0, 1, (32, 32, 1)).astype(np.float32)
        out = _post(f"{server}/interpolate",
                    {"a": a.tolist(), "b": b.tolist(), "steps": 4, "slerp": True})
        assert np.asarray(out["path"]).shape == (4, 32, 32, 1)


class TestServingClient:
    """In-tree client (serving/client.py): both wires, value-equal results,
    typed errors. The client module must not import jax (usable from a
    lightweight client process)."""

    def test_client_module_is_jax_free(self):
        import ast
        import midi_vae_tpu.serving.client as client_mod
        import midi_vae_tpu.serving.wire as wire_mod

        for mod in (client_mod, wire_mod):
            tree = ast.parse(open(mod.__file__).read())
            for node in ast.walk(tree):
                if isinstance(node, ast.Import):
                    assert not any(a.name.split(".")[0] == "jax" for a in node.names)
                elif isinstance(node, ast.ImportFrom):
                    root = (node.module or "").split(".")
                    assert root[0] != "jax"
                    # in-package imports must stay within the jax-free set
                    if root[0] == "midi_vae_tpu":
                        assert root[-1] in ("wire",), f"{mod.__name__} imports {node.module}"

    def test_reconstruct_both_wires_match(self, server):
        from midi_vae_tpu.serving.client import ServingClient

        x = np.random.default_rng(21).uniform(0, 1, (2, 32, 32, 1)).astype(np.float32)
        r_npy = ServingClient(server, wire="npy").reconstruct(x)
        r_json = ServingClient(server, wire="json").reconstruct(x)
        assert r_npy.shape == x.shape
        np.testing.assert_allclose(r_npy, r_json, atol=1e-6)

    def test_encode_sample_interpolate(self, server):
        from midi_vae_tpu.serving.client import ServingClient

        c = ServingClient(server)  # npy wire default
        x = np.random.default_rng(22).uniform(0, 1, (3, 32, 32, 1)).astype(np.float32)
        mu, log_var = c.encode(x)
        assert mu.shape == (3, 8) and log_var.shape == (3, 8)
        s = c.sample(4, seed=1)
        assert s.shape == (4, 32, 32, 1)
        path = c.interpolate(x[0], x[1], steps=5, slerp=True)
        assert path.shape == (5, 32, 32, 1)
        assert c.healthz()["status"] == "ok"

    def test_server_error_raises_typed(self, server):
        from midi_vae_tpu.serving.client import ServingClient, ServingError

        with pytest.raises(ServingError) as exc_info:
            ServingClient(server).sample(10**6)
        assert exc_info.value.status == 400
        assert "n must be" in exc_info.value.message

    def test_continue_both_wires_match(self, two_stage):
        """client.continue_rolls: npy wire (tensor body + query-string
        scalars) == JSON wire, deterministic given the seed; sampling
        params flow through (c.sample(top_p=...) reaches the prior)."""
        from midi_vae_tpu.serving.client import ServingClient, ServingError

        url = two_stage["url"]
        x = np.random.default_rng(24).uniform(0, 1, (3, 32, 32, 1)).astype(np.float32)
        c_npy = ServingClient(url, wire="npy")
        c_json = ServingClient(url, wire="json")
        r_npy = c_npy.continue_rolls(x, keep_cols=1, seed=9)
        r_json = c_json.continue_rolls(x, keep_cols=1, seed=9)
        assert r_npy.shape == x.shape
        np.testing.assert_allclose(r_npy, r_json, atol=1e-6)
        # top_p rides both wires too (changes the draws vs unrestricted)
        t_npy = c_npy.continue_rolls(x, keep_cols=1, seed=9, top_p=0.5)
        t_json = c_json.continue_rolls(x, keep_cols=1, seed=9, top_p=0.5)
        np.testing.assert_allclose(t_npy, t_json, atol=1e-6)
        s1 = c_npy.sample(2, seed=4, top_p=0.5)
        s2 = c_json.sample(2, seed=4, top_p=0.5)
        np.testing.assert_allclose(s1, s2, atol=1e-6)
        with pytest.raises(ServingError) as exc_info:
            c_npy.continue_rolls(x, keep_cols=0)
        assert exc_info.value.status == 400

    def test_interpolate_binary_wire_carries_params(self, server):
        """The npy-wire interpolate posts a [2,H,W,C] binary body with
        steps/slerp on the query string — and matches the JSON wire."""
        from midi_vae_tpu.serving.client import ServingClient

        rng = np.random.default_rng(23)
        a = rng.uniform(0, 1, (32, 32, 1)).astype(np.float32)
        b = rng.uniform(0, 1, (32, 32, 1)).astype(np.float32)
        p_npy = ServingClient(server, wire="npy").interpolate(a, b, steps=5, slerp=True)
        p_json = ServingClient(server, wire="json").interpolate(a, b, steps=5, slerp=True)
        assert p_npy.shape == (5, 32, 32, 1)
        np.testing.assert_allclose(p_npy, p_json, atol=1e-6)


class TestWireValidation:
    """npy_loads validates the untrusted header before materializing."""

    def test_declared_size_must_match_payload(self):
        from midi_vae_tpu.serving.wire import npy_dumps, npy_loads

        body = npy_dumps(np.zeros((4, 4), np.float32))
        with pytest.raises(ValueError, match="declares"):
            npy_loads(body[:-8])  # short payload
        with pytest.raises(ValueError, match="declares"):
            npy_loads(body + b"\x00" * 8)  # trailing junk
        np.testing.assert_array_equal(npy_loads(body), np.zeros((4, 4), np.float32))

    def test_malformed_header_is_value_error(self):
        from midi_vae_tpu.serving.wire import npy_loads

        with pytest.raises(ValueError, match="malformed npy"):
            npy_loads(b"\x93NUMPY\x01\x00garbage-after-magic")

    def test_fuzz_never_escapes_value_error(self):
        """Untrusted-body contract: ANY byte string either parses to an
        ndarray or raises ValueError — never a different exception, never
        a large allocation. Deterministic fuzz: random bytes, random bytes
        behind a valid magic, and random mutations of a valid body."""
        from midi_vae_tpu.serving.wire import npy_dumps, npy_loads

        rng = np.random.default_rng(1234)
        valid = npy_dumps(rng.uniform(size=(8, 8)).astype(np.float32))
        bodies = [b"", b"\x93NUMPY", valid[: len(valid) // 2]]
        for _ in range(200):
            n = int(rng.integers(0, 256))
            bodies.append(rng.bytes(n))
            bodies.append(b"\x93NUMPY" + rng.bytes(n))
            mutated = bytearray(valid)
            for pos in rng.integers(0, len(valid), size=4):
                mutated[int(pos)] = int(rng.integers(0, 256))
            bodies.append(bytes(mutated))
        parsed = 0
        for body in bodies:
            try:
                out = npy_loads(body)
            except ValueError:
                continue
            assert isinstance(out, np.ndarray)
            parsed += 1
        # some 4-byte mutations leave the header/data intact — that's fine;
        # the point is nothing ever escaped as a non-ValueError
        assert parsed < len(bodies)


def _post_npy(url, arr, timeout=30):
    from midi_vae_tpu.serving.server import NPY_CONTENT_TYPE, npy_dumps, npy_loads

    req = urllib.request.Request(url, data=npy_dumps(arr), headers={"Content-Type": NPY_CONTENT_TYPE})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        assert resp.headers.get("Content-Type") == NPY_CONTENT_TYPE
        return npy_loads(resp.read())


class TestBinaryWireFormat:
    """The npy production wire path: binary in → binary out, value-equal
    to the JSON path (one handler, one batcher, two serializations)."""

    def test_reconstruct_npy_matches_json(self, server):
        x = np.random.default_rng(11).uniform(0, 1, (2, 32, 32, 1)).astype(np.float32)
        rec_npy = _post_npy(f"{server}/reconstruct", x)
        rec_json = np.asarray(
            _post(f"{server}/reconstruct", {"images": x.tolist()})["reconstructions"],
            np.float32,
        )
        assert rec_npy.dtype == np.float32 and rec_npy.shape == x.shape
        # JSON round-trips through repr(float) — allow that quantization only
        np.testing.assert_allclose(rec_npy, rec_json, rtol=0, atol=1e-6)

    def test_encode_npy_is_mu_logvar_halves(self, server):
        x = np.random.default_rng(12).uniform(0, 1, (3, 32, 32, 1)).astype(np.float32)
        out = _post_npy(f"{server}/encode", x)
        assert out.shape == (3, 16)  # [N, 2*latent_dim]
        enc = _post(f"{server}/encode", {"images": x.tolist()})
        np.testing.assert_allclose(out[:, :8], np.asarray(enc["mu"], np.float32), atol=1e-6)
        np.testing.assert_allclose(out[:, 8:], np.asarray(enc["log_var"], np.float32), atol=1e-6)

    def test_json_client_opts_into_npy_response_via_accept(self, server):
        from midi_vae_tpu.serving.server import NPY_CONTENT_TYPE, npy_loads

        req = urllib.request.Request(
            f"{server}/sample",
            data=json.dumps({"n": 2, "seed": 5}).encode(),
            headers={"Content-Type": "application/json", "Accept": NPY_CONTENT_TYPE},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.headers.get("Content-Type") == NPY_CONTENT_TYPE
            out = npy_loads(resp.read())
        assert out.shape == (2, 32, 32, 1)

    def test_interpolate_npy_endpoints(self, server):
        rng = np.random.default_rng(13)
        ends = rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32)
        out = _post_npy(f"{server}/interpolate", ends)
        assert out.shape == (8, 32, 32, 1)  # default steps

    def test_single_image_rank3_npy_accepted(self, server):
        x = np.random.default_rng(14).uniform(0, 1, (32, 32, 1)).astype(np.float32)
        out = _post_npy(f"{server}/reconstruct", x)
        assert out.shape == (1, 32, 32, 1)

    def test_truncated_npy_body_is_400(self, server):
        from midi_vae_tpu.serving.server import NPY_CONTENT_TYPE, npy_dumps

        x = np.zeros((1, 32, 32, 1), np.float32)
        body = npy_dumps(x)[:-64]  # cut the tail: valid header, short data
        req = urllib.request.Request(
            f"{server}/reconstruct", data=body, headers={"Content-Type": NPY_CONTENT_TYPE}
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=10)
        assert exc_info.value.code == 400

    def test_garbage_npy_body_is_400(self, server):
        from midi_vae_tpu.serving.server import NPY_CONTENT_TYPE

        req = urllib.request.Request(
            f"{server}/reconstruct", data=b"not an npy file at all",
            headers={"Content-Type": NPY_CONTENT_TYPE},
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=10)
        assert exc_info.value.code == 400

    def test_binary_sample_body_rejected(self, server):
        """/sample takes JSON params; a tensor body is a clear 400."""
        from midi_vae_tpu.serving.server import NPY_CONTENT_TYPE, npy_dumps

        req = urllib.request.Request(
            f"{server}/sample", data=npy_dumps(np.zeros((1,), np.float32)),
            headers={"Content-Type": NPY_CONTENT_TYPE},
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=10)
        assert exc_info.value.code == 400

    def test_huge_header_npy_rejected_before_allocation(self, server):
        """A tiny body whose npy header claims a multi-gigabyte shape must
        be rejected from the HEADER (400), never materialized: read_array
        allocates the header's self-declared size up front, so without
        validation a 128-byte request could OOM the serving process."""
        import io

        from midi_vae_tpu.serving.server import NPY_CONTENT_TYPE

        buf = io.BytesIO()
        np.lib.format.write_array_header_1_0(
            buf, {"descr": "<f4", "fortran_order": False, "shape": (200000, 128, 128, 1)}
        )
        body = buf.getvalue() + b"\x00" * 16  # 12.5 GB declared, ~16 bytes carried
        req = urllib.request.Request(
            f"{server}/reconstruct", data=body, headers={"Content-Type": NPY_CONTENT_TYPE}
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=10)
        assert exc_info.value.code == 400
        assert "declares" in json.loads(exc_info.value.read())["error"]

    def test_errors_stay_json_for_binary_requests(self, server):
        """Error bodies are always JSON, even on the binary path."""
        from midi_vae_tpu.serving.server import NPY_CONTENT_TYPE, npy_dumps

        x = np.zeros((1025, 4, 4, 1), np.float32)
        req = urllib.request.Request(
            f"{server}/reconstruct", data=npy_dumps(x), headers={"Content-Type": NPY_CONTENT_TYPE}
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 400
        err = json.loads(exc_info.value.read())
        assert "at most" in err["error"]


# -- two-stage VQ sampling through the server (round 4) ---------------------
# /sample with an attached code prior (--prior) must serve the SAME
# computation as `generate --prior` (ancestral lax.scan draws →
# decode_indices), and artifacts exported with --prior must answer
# /sample instead of refusing.


@pytest.fixture(scope="module")
def two_stage(tmp_path_factory):
    """Tiny VQ-VAE + trained code prior + a server with --prior attached."""
    import os

    from midi_vae_tpu.cli.train_prior import cli as prior_cli
    from midi_vae_tpu.serving.server import serve
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    tmp_path = tmp_path_factory.mktemp("two_stage")
    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=32,
        arch="VQVAE",
        n_features=8,
        hidden_dims=(8, 16, 32, 32),
        codebook_size=16,
        kld_weight=0.25,
        epochs=1,
        batch_size_per_device=32,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "m"),
        run_name="ts", run_id="t1",
        log_images=False,
    )
    run(config)
    ckpt = config.checkpoint_path
    prior_path = str(tmp_path / "prior.msgpack")
    prior_cli(["--checkpoint", ckpt, "--epochs", "2", "--batch-size", "64",
               "--features", "16", "--layers", "2", "--kernel-size", "3",
               "--out", prior_path, "--no-eval"])
    httpd = serve(ckpt, port=0, prior=prior_path)
    yield {
        "url": f"http://127.0.0.1:{httpd.server_address[1]}",
        "ckpt": ckpt,
        "prior": prior_path,
        "tmp": str(tmp_path),
    }
    httpd.shutdown()
    httpd.service.close()


class TestTwoStageSampling:
    def test_healthz_reports_prior(self, two_stage):
        with urllib.request.urlopen(f"{two_stage['url']}/healthz", timeout=30) as resp:
            h = json.loads(resp.read())
        assert h["prior"]["arch"] == "pixelcnn"
        assert h["prior"]["num_classes"] == 0

    def test_sample_matches_generate_prior_path(self, two_stage):
        """HTTP /sample == the generate-CLI two-stage computation: same key
        convention (PRNGKey(seed)), same ancestral sampler, same decode."""
        import jax

        from midi_vae_tpu.cli.generate import _load_model_and_state
        from midi_vae_tpu.cli.train_prior import load_prior
        from midi_vae_tpu.models.prior import sample_codes_autoregressive
        from midi_vae_tpu.models.vq import VQVAE

        out = _post(f"{two_stage['url']}/sample", {"n": 8, "seed": 3})
        served = np.asarray(out["samples"], np.float32)

        model, params, batch_stats, *_ = _load_model_and_state(two_stage["ckpt"])
        prior, pparams, _ = load_prior(two_stage["prior"])
        idx = sample_codes_autoregressive(
            prior, pparams, jax.random.PRNGKey(3), 8, model.last_conv_size
        )
        direct = np.asarray(model.apply(
            {"params": params, "batch_stats": batch_stats}, idx, method=VQVAE.decode_indices
        ))
        np.testing.assert_allclose(served, direct, atol=1e-6)

    def test_cold_temperature_changes_draws(self, two_stage):
        """temperature → 0 turns ancestral sampling greedy — the draws (and
        decodes) must move. (Heating can't be asserted on a near-uniform
        toy prior: the Gumbel gaps dominate the scaled logits.)"""
        base = np.asarray(_post(f"{two_stage['url']}/sample", {"n": 8, "seed": 3})["samples"])
        cold = np.asarray(_post(
            f"{two_stage['url']}/sample", {"n": 8, "seed": 3, "temperature": 0.01}
        )["samples"])
        assert np.abs(cold - base).max() > 1e-4

    def test_temperature_rejected_without_prior(self, server):
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(f"{server}/sample", {"n": 2, "seed": 0, "temperature": 0.5})
        assert exc_info.value.code == 400
        assert "no code prior" in json.loads(exc_info.value.read())["error"]

    def test_temperature_zero_rejected(self, two_stage):
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(f"{two_stage['url']}/sample", {"n": 2, "temperature": 0.0})
        assert exc_info.value.code == 400

    def test_top_p_http_parity_and_guards(self, two_stage, server):
        """top_p flows HTTP → sampler (nucleus draws == direct call with the
        same key); out-of-range and prior-less deployments reject."""
        import jax

        from midi_vae_tpu.cli.generate import _load_model_and_state
        from midi_vae_tpu.cli.train_prior import load_prior
        from midi_vae_tpu.models.prior import sample_codes_autoregressive
        from midi_vae_tpu.models.vq import VQVAE

        out = _post(f"{two_stage['url']}/sample", {"n": 4, "seed": 5, "top_p": 0.5})
        served = np.asarray(out["samples"], np.float32)
        model, params, batch_stats, *_ = _load_model_and_state(two_stage["ckpt"])
        prior, pparams, _ = load_prior(two_stage["prior"])
        idx = sample_codes_autoregressive(
            prior, pparams, jax.random.PRNGKey(5), 4, model.last_conv_size, top_p=0.5
        )
        direct = np.asarray(model.apply(
            {"params": params, "batch_stats": batch_stats}, idx, method=VQVAE.decode_indices
        ))
        np.testing.assert_allclose(served, direct, atol=1e-6)

        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(f"{two_stage['url']}/sample", {"n": 2, "top_p": 1.5})
        assert exc_info.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(f"{server}/sample", {"n": 2, "top_p": 0.9})
        assert exc_info.value.code == 400
        assert "prior" in json.loads(exc_info.value.read())["error"]

    def test_continue_http_parity_and_guards(self, two_stage, server):
        """/continue == direct encode → forced-sample → decode with the same
        key convention; the kept code columns survive into the drawn grids;
        bad keep_cols and prior-less deployments reject with 400."""
        import jax
        import jax.numpy as jnp

        from midi_vae_tpu.cli.generate import _load_model_and_state
        from midi_vae_tpu.cli.train_prior import load_prior
        from midi_vae_tpu.models.prior import sample_codes_autoregressive
        from midi_vae_tpu.models.vq import VQVAE

        rng = np.random.default_rng(0)
        x = rng.random((4, 32, 32, 1)).astype(np.float32)
        out = _post(f"{two_stage['url']}/continue",
                    {"images": x.tolist(), "keep_cols": 1, "seed": 7})
        served = np.asarray(out["continuations"], np.float32)

        model, params, batch_stats, *_ = _load_model_and_state(two_stage["ckpt"])
        prior, pparams, _ = load_prior(two_stage["prior"])
        s = model.last_conv_size
        codes = model.apply(
            {"params": params, "batch_stats": batch_stats}, jnp.asarray(x),
            method=VQVAE.encode_indices,
        )
        mask = np.zeros((s, s), bool)
        mask[:, :1] = True
        idx = sample_codes_autoregressive(
            prior, pparams, jax.random.PRNGKey(7), 4, s,
            known=codes, known_mask=jnp.asarray(mask),
        )
        # the kept time column is the input's own codes, verbatim
        np.testing.assert_array_equal(np.asarray(idx)[:, :, 0], np.asarray(codes)[:, :, 0])
        direct = np.asarray(model.apply(
            {"params": params, "batch_stats": batch_stats}, idx, method=VQVAE.decode_indices
        ))
        np.testing.assert_allclose(served, direct, atol=1e-6)

        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(f"{two_stage['url']}/continue", {"images": x.tolist(), "keep_cols": 99})
        assert exc_info.value.code == 400
        assert "keep_cols must be in" in json.loads(exc_info.value.read())["error"]
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(f"{server}/continue", {"images": x.tolist(), "keep_cols": 1})
        assert exc_info.value.code == 400
        assert "code prior" in json.loads(exc_info.value.read())["error"]
        # omitted keep_cols names the missing field (not "got 0")
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            _post(f"{two_stage['url']}/continue", {"images": x.tolist()})
        assert exc_info.value.code == 400
        assert "'keep_cols' is required" in json.loads(exc_info.value.read())["error"]
        # an empty batch is rejected instead of padded to bucket size 1
        # (npy wire — JSON's tolist() of an empty array loses the shape)
        from midi_vae_tpu.serving.client import ServingClient, ServingError

        with pytest.raises(ServingError) as exc_info:
            ServingClient(two_stage["url"], wire="npy").continue_rolls(
                np.zeros((0, 32, 32, 1), np.float32), keep_cols=1
            )
        assert exc_info.value.status == 400
        assert "at least one image" in exc_info.value.message

    def test_attach_prior_guards(self, two_stage, tmp_path):
        """Gaussian checkpoints and geometry-mismatched priors fail at
        ATTACH time (startup), not on the first request."""
        from midi_vae_tpu.serving.server import InferenceService, serve
        from midi_vae_tpu.train.config import TrainConfig
        from midi_vae_tpu.train.loop import run

        config = TrainConfig(
            dataset_name="vae-lines-synthetic", transform_type="noaug", image_size=32,
            arch="MLPVAE", n_features=4, hidden_dims=(32,), epochs=1,
            batch_size_per_device=16, num_devices=1, seed=0,
            models_dir=str(tmp_path / "g"), run_name="g", run_id="g1", log_images=False,
        )
        run(config)
        with pytest.raises(ValueError, match="VQ-VAE checkpoint"):
            InferenceService(config.checkpoint_path, prior_path=two_stage["prior"])
        with pytest.raises(ValueError, match="exactly one of|artifacts carry"):
            serve(artifact="whatever", prior=two_stage["prior"])


class TestTwoStageArtifact:
    def test_aot_sampler_parity_and_plain_refusal(self, two_stage, tmp_path):
        """aot_export --prior bakes the two-stage sampler into the artifact:
        artifact-served /sample equals checkpoint-served /sample; a plain
        VQ artifact still refuses with guidance."""
        from midi_vae_tpu.interop.aot_export import main as export_main
        from midi_vae_tpu.serving.server import serve

        live = np.asarray(
            _post(f"{two_stage['url']}/sample", {"n": 8, "seed": 5})["samples"], np.float32
        )

        art = str(tmp_path / "art_prior")
        export_main(["--checkpoint", two_stage["ckpt"], "--out", art,
                     "--prior", two_stage["prior"]])
        httpd = serve(artifact=art, port=0)
        try:
            url = f"http://127.0.0.1:{httpd.server_address[1]}"
            with urllib.request.urlopen(f"{url}/healthz", timeout=30) as resp:
                assert json.loads(resp.read())["prior"]["arch"] == "pixelcnn"
            aot = np.asarray(_post(f"{url}/sample", {"n": 8, "seed": 5})["samples"], np.float32)
            np.testing.assert_allclose(aot, live, atol=1e-5)
        finally:
            httpd.shutdown()
            httpd.service.close()

        plain = str(tmp_path / "art_plain")
        export_main(["--checkpoint", two_stage["ckpt"], "--out", plain])
        httpd = serve(artifact=plain, port=0)
        try:
            url = f"http://127.0.0.1:{httpd.server_address[1]}"
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                _post(f"{url}/sample", {"n": 2})
            assert exc_info.value.code == 400
            assert "--prior" in json.loads(exc_info.value.read())["error"]
        finally:
            httpd.shutdown()
            httpd.service.close()

    def test_aot_baked_top_p(self, two_stage, tmp_path):
        """aot_export --prior --top-p bakes the nucleus rule: with a tiny
        top_p the sampler is greedy, so draws are SEED-INDEPENDENT — a
        signature impossible for the unrestricted program. The manifest
        records the baked value; --top-p without --prior refuses."""
        import os

        from midi_vae_tpu.interop.aot_export import main as export_main
        from midi_vae_tpu.serving.server import serve

        art = str(tmp_path / "art_tp")
        export_main(["--checkpoint", two_stage["ckpt"], "--out", art,
                     "--prior", two_stage["prior"], "--top-p", "1e-9"])
        with open(os.path.join(art, "manifest.json")) as f:
            assert json.load(f)["prior"]["top_p"] == 1e-9
        httpd = serve(artifact=art, port=0)
        try:
            url = f"http://127.0.0.1:{httpd.server_address[1]}"
            a = np.asarray(_post(f"{url}/sample", {"n": 4, "seed": 1})["samples"])
            b = np.asarray(_post(f"{url}/sample", {"n": 4, "seed": 2})["samples"])
            np.testing.assert_array_equal(a, b)
        finally:
            httpd.shutdown()
            httpd.service.close()

        with pytest.raises(SystemExit, match="needs --prior"):
            export_main(["--checkpoint", two_stage["ckpt"], "--out", str(tmp_path / "x"),
                         "--top-p", "0.9"])
