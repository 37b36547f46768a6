"""Conditional VAE (CVAE) tests: q(z|x,y), p(x|z,y) over class labels.

Capability extension — the reference parses class counts
(``midi_autoencoder/datasets.py:17-62``) but never conditions on labels;
``--conditional`` makes them load-bearing (models/vae.py ``num_classes``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midi_vae_tpu.models import MLPVAE, VanillaVAE, build_model
from midi_vae_tpu.models.folded import FoldedVAE


def _init_conditional(cls=VanillaVAE, num_classes=10, input_dim=32, latent_dim=8, **kw):
    model = cls(in_channels=1, latent_dim=latent_dim, input_dim=input_dim,
                num_classes=num_classes, **kw)
    x = jnp.zeros((4, input_dim, input_dim, 1), jnp.float32)
    y = jnp.zeros((4,), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)},
        x, train=True, y=y,
    )
    return model, variables


@pytest.mark.parametrize("cls", [VanillaVAE, MLPVAE, FoldedVAE])
def test_conditional_forward_shapes(cls):
    model, variables = _init_conditional(cls=cls)
    x = jnp.ones((4, 32, 32, 1), jnp.float32) * 0.5
    y = jnp.array([0, 3, 7, 9], jnp.int32)
    out, _ = model.apply(
        variables, x, train=True, y=y,
        rngs={"reparam": jax.random.PRNGKey(2)},
        mutable=["batch_stats"],
    )
    assert out.output.shape == (4, 32, 32, 1)
    assert out.latents.shape == (4, 8)


@pytest.mark.parametrize("cls", [VanillaVAE, MLPVAE])
def test_conditional_requires_labels(cls):
    model, variables = _init_conditional(cls=cls)
    x = jnp.ones((4, 32, 32, 1), jnp.float32)
    with pytest.raises(ValueError, match="conditional"):
        model.apply(variables, x, train=False, rngs={"reparam": jax.random.PRNGKey(2)})


def test_label_conditions_decoder_and_encoder():
    """The label must be load-bearing: the same z decodes differently under
    different labels, and the same x encodes to different posteriors."""
    model, variables = _init_conditional()
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 8), jnp.float32)
    dec = lambda y: model.apply(  # noqa: E731
        variables, z, train=False, y=y, method=VanillaVAE.decode
    )
    d0 = dec(jnp.zeros((2,), jnp.int32))
    d1 = dec(jnp.full((2,), 5, jnp.int32))
    assert not np.allclose(np.asarray(d0), np.asarray(d1))

    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 32, 32, 1))
    enc = lambda y: model.apply(  # noqa: E731
        variables, x, train=False, y=y, method=VanillaVAE.encode
    )
    e0, e1 = enc(jnp.zeros((2,), jnp.int32)), enc(jnp.full((2,), 5, jnp.int32))
    assert not np.allclose(np.asarray(e0.mu), np.asarray(e1.mu))


def test_unconditional_model_ignores_labels():
    """num_classes=0 models accept y=... and ignore it, so callers may pass
    labels uniformly."""
    model = VanillaVAE(in_channels=1, latent_dim=8, input_dim=32)
    x = jnp.ones((2, 32, 32, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, x, train=True
    )
    out_with = model.apply(variables, x, train=False, y=jnp.zeros((2,), jnp.int32),
                           rngs={"reparam": jax.random.PRNGKey(2)})
    out_without = model.apply(variables, x, train=False,
                              rngs={"reparam": jax.random.PRNGKey(2)})
    np.testing.assert_array_equal(np.asarray(out_with.output), np.asarray(out_without.output))


def test_registry_rejects_unlabeled_class_count():
    with pytest.raises(ValueError, match="num_classes=-1"):
        build_model("VanillaVAE", in_channels=1, latent_dim=8, input_dim=32, num_classes=-1)


def test_torch_compat_rejects_conditional():
    from midi_vae_tpu.train.state import create_train_state

    import optax

    model = VanillaVAE(in_channels=1, latent_dim=8, input_dim=32,
                       torch_compat=True, num_classes=10)
    with pytest.raises(ValueError, match="torch_compat"):
        create_train_state(model, optax.sgd(1e-3), jax.random.PRNGKey(0),
                           jnp.zeros((2, 32, 32, 1), jnp.float32))


def test_inference_paths_thread_labels():
    """sample_prior / reconstruct / interpolate / traverse all accept y."""
    from midi_vae_tpu.evaluation.inference import (
        interpolate,
        reconstruct,
        sample_prior,
        traverse,
    )

    model, variables = _init_conditional(cls=MLPVAE, num_classes=4)
    params, bs = variables["params"], variables.get("batch_stats", {})
    key = jax.random.PRNGKey(5)
    y = jnp.array([0, 1, 2, 3], jnp.int32)

    s = sample_prior(model, params, bs, key, 4, y=y)
    assert s.shape == (4, 32, 32, 1)
    # different labels decode the same prior draw differently
    s_same = sample_prior(model, params, bs, key, 4, y=jnp.zeros((4,), jnp.int32))
    assert not np.allclose(np.asarray(s[1:]), np.asarray(s_same[1:]))

    x = jax.random.uniform(jax.random.PRNGKey(6), (4, 32, 32, 1))
    r = reconstruct(model, params, bs, x, key, y=y)
    assert r.shape == x.shape

    path = interpolate(model, params, bs, x[:1], x[1:2], steps=5, y=y[:1])
    assert path.shape == (5, 1, 32, 32, 1)

    grid = traverse(model, params, bs, x, steps=3, y=y)
    assert grid.shape == (8, 3, 32, 32, 1)


class TestConditionalTraining:
    def _config(self, tmp_path, tag, **kw):
        from midi_vae_tpu.train.config import TrainConfig

        base = dict(
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
            models_dir=str(tmp_path / tag),
            log_images=False,
            run_name=tag,
            run_id=tag,
            conditional=True,
        )
        base.update(kw)
        return TrainConfig(**base)

    def test_end_to_end_and_checkpoint_roundtrip(self, tmp_path):
        """--conditional resolves the class count from the fetched labels
        (vae-lines is an unlabeled-registry dataset, n_class == -1), trains,
        evaluates, and the checkpoint rebuilds the conditional model."""
        from midi_vae_tpu.cli.generate import _load_model_and_state
        from midi_vae_tpu.evaluation.inference import sample_prior
        from midi_vae_tpu.train.loop import run

        config = self._config(tmp_path, "cond")
        r = run(config)
        assert r["total_step"] > 0
        assert config.num_classes > 1  # derived from the line-count labels
        assert np.isfinite(r["train"]["loss"])

        model, params, bs, cfg, image_size, channels, _ = _load_model_and_state(
            config.checkpoint_path
        )
        assert model.num_classes == config.num_classes
        out = sample_prior(model, params, bs, jax.random.PRNGKey(0), 2,
                           y=jnp.array([1, 2], jnp.int32))
        assert out.shape == (2, image_size, image_size, channels)

        # the generate CLI validates --label range (out-of-range one_hots
        # to all-zeros = silent out-of-distribution conditioning)
        from midi_vae_tpu.cli.generate import cli as generate_cli

        with pytest.raises(SystemExit, match="--label must be in"):
            generate_cli(["--checkpoint", config.checkpoint_path, "--mode", "sample",
                          "-n", "2", "--label", str(config.num_classes), "--cpu",
                          "--out", str(tmp_path / "x.png")])

    def test_generate_label_rejected_for_unconditional(self, tmp_path):
        from midi_vae_tpu.cli.generate import cli as generate_cli
        from midi_vae_tpu.train.loop import run

        config = self._config(tmp_path, "uncond", conditional=False)
        run(config)
        with pytest.raises(SystemExit, match="unconditional"):
            generate_cli(["--checkpoint", config.checkpoint_path, "--mode", "sample",
                          "-n", "2", "--label", "0", "--cpu",
                          "--out", str(tmp_path / "x.png")])

    def test_device_resident_scan_threads_labels(self, tmp_path):
        """The scan-chunked device-resident epoch must feed the gathered
        labels into the conditional step (pipeline.py run_chunk)."""
        from midi_vae_tpu.train.loop import run

        r = run(self._config(tmp_path, "cond_scan", data_placement="device",
                             scan_steps=4, epochs=2))
        assert r["total_step"] > 0
        assert np.isfinite(r["train"]["loss"])

    def test_matches_across_dispatch_paths(self, tmp_path):
        """Per-batch and scan-chunked conditional training agree (same data
        order, same keys, labels threaded identically)."""
        from midi_vae_tpu.train.loop import run

        r_base = run(self._config(tmp_path, "cb", data_placement="device"))
        r_scan = run(self._config(tmp_path, "cs", data_placement="device", scan_steps=8))
        assert abs(r_scan["train"]["loss"] - r_base["train"]["loss"]) < 1e-4

    def test_unlabeled_stream_raises(self, tmp_path, monkeypatch):
        """--conditional on a corpus with no label table fails loudly."""
        from midi_vae_tpu.train.loop import run

        config = self._config(tmp_path, "nolab")

        # strip labels from the fetched datasets to simulate a label-less corpus
        import midi_vae_tpu.train.loop as loop_mod

        real_fetch = loop_mod.fetch_dataset

        def fetch_no_labels(*a, **kw):
            out = real_fetch(*a, **kw)
            for ds in out[:3]:
                if ds is not None and getattr(ds, "labels", None) is not None:
                    ds.labels = None
            return out

        monkeypatch.setattr(loop_mod, "fetch_dataset", fetch_no_labels)
        with pytest.raises(ValueError, match="labels"):
            run(config)


def test_label_steers_density_on_midi_corpus(tmp_path):
    """Target-domain validation: a CVAE trained on the by-folder MIDI
    corpus (classes = note-density buckets, midi/factory.py) generates
    MONOTONICALLY denser rolls as the requested class rises — the label
    is semantically load-bearing, not just architecturally present."""
    from midi_vae_tpu.cli.generate import _load_model_and_state
    from midi_vae_tpu.evaluation.inference import sample_prior
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    config = TrainConfig(
        dataset_name="midi-synthetic-dense",  # ~8.5% fill: collapse-safe
        transform_type="midi",
        image_size=32,
        arch="MLPVAE",
        n_features=8,
        hidden_dims=(128,),
        epochs=6,
        batch_size_per_device=64,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "m"),
        log_images=False,
        run_name="dens",
        run_id="dens1",
        conditional=True,
        bce_targets="raw",
    )
    run(config)
    assert config.num_classes == 4  # the factory's density buckets

    model, params, bs, _, _, _, _ = _load_model_and_state(config.checkpoint_path)
    key = jax.random.PRNGKey(0)  # same prior draws for every class
    mean_prob = []
    for c in range(config.num_classes):
        out = sample_prior(model, params, bs, key, 64, y=jnp.full((64,), c, jnp.int32))
        mean_prob.append(float(np.asarray(out).mean()))
    # strictly increasing expected density across the 4 buckets
    # (measured 0.039 / 0.046 / 0.059 / 0.072 at this seed)
    assert all(b > a for a, b in zip(mean_prob, mean_prob[1:])), mean_prob
    assert mean_prob[-1] > 1.4 * mean_prob[0], mean_prob


@pytest.fixture(scope="module")
def cond_server(tmp_path_factory):
    """A live HTTP server over a conditional checkpoint."""
    from midi_vae_tpu.serving.server import serve
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    tmp_path = tmp_path_factory.mktemp("cond_serve")
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
        run_name="csrv",
        run_id="csrv1",
        conditional=True,
    )
    run(config)
    httpd = serve(config.checkpoint_path, port=0)
    yield f"http://127.0.0.1:{httpd.server_address[1]}", config.num_classes
    httpd.shutdown()
    httpd.service.close()


def _post_json(url, payload, timeout=30):
    import json
    import urllib.request

    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


class TestConditionalServing:
    def test_healthz_reports_conditional(self, cond_server):
        import json
        import urllib.request

        url, num_classes = cond_server
        with urllib.request.urlopen(f"{url}/healthz", timeout=10) as resp:
            health = json.loads(resp.read())
        assert health["conditional"] is True
        assert health["num_classes"] == num_classes

    def test_sample_with_label(self, cond_server):
        url, _ = cond_server
        out = _post_json(f"{url}/sample", {"n": 2, "label": 1})
        assert np.asarray(out["samples"]).shape == (2, 32, 32, 1)

    def test_reconstruct_with_per_image_labels(self, cond_server):
        url, _ = cond_server
        x = np.zeros((2, 32, 32, 1), np.float32).tolist()
        out = _post_json(f"{url}/reconstruct", {"images": x, "labels": [0, 1]})
        assert np.asarray(out["reconstructions"]).shape == (2, 32, 32, 1)
        # the label conditions the decode: different labels, different output
        out0 = _post_json(f"{url}/reconstruct", {"images": x, "labels": [0, 0]})
        a, b = np.asarray(out["reconstructions"]), np.asarray(out0["reconstructions"])
        assert not np.allclose(a[1], b[1])

    def test_missing_label_is_400(self, cond_server):
        import urllib.error

        url, _ = cond_server
        x = np.zeros((1, 32, 32, 1), np.float32).tolist()
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_json(f"{url}/reconstruct", {"images": x})
        assert e.value.code == 400

    def test_out_of_range_label_is_400(self, cond_server):
        import urllib.error

        url, num_classes = cond_server
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_json(f"{url}/sample", {"n": 1, "label": num_classes})
        assert e.value.code == 400

    def test_serving_client_threads_labels_on_both_wires(self, cond_server):
        """The in-tree client can drive every endpoint of a conditional
        checkpoint (labels= on reconstruct/encode/sample/interpolate)."""
        from midi_vae_tpu.serving.client import ServingClient, ServingError

        url, num_classes = cond_server
        x = np.zeros((2, 32, 32, 1), np.float32)
        for wire in ("npy", "json"):
            c = ServingClient(url, wire=wire)
            r = c.reconstruct(x, labels=[0, 1])
            assert r.shape == (2, 32, 32, 1)
            mu, log_var = c.encode(x, labels=1)  # scalar broadcasts
            assert mu.shape == log_var.shape == (2, 8)
            s = c.sample(2, seed=0, labels=[0, 1])
            assert s.shape == (2, 32, 32, 1)
            path = c.interpolate(x[0], x[1], steps=3, labels=0)
            assert path.shape == (3, 32, 32, 1)
            with pytest.raises(ServingError) as e:
                c.reconstruct(x)  # labels required
            assert e.value.status == 400

    def test_binary_wire_labels_ride_the_query_string(self, cond_server):
        """The npy wire has no JSON body; ?labels=csv carries the condition."""
        import urllib.request

        from midi_vae_tpu.serving.wire import npy_dumps, npy_loads

        url, _ = cond_server
        x = np.zeros((2, 32, 32, 1), np.float32)
        req = urllib.request.Request(
            f"{url}/reconstruct?labels=0,1",
            data=npy_dumps(x),
            headers={"Content-Type": "application/x-npy"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = npy_loads(resp.read())
        assert out.shape == (2, 32, 32, 1)


class TestLabeledBatcher:
    def _echo_batcher(self, labeled=True, **kw):
        from midi_vae_tpu.serving.batcher import MicroBatcher

        if labeled:
            fn = lambda rows, labels: rows + labels.reshape(-1, 1)  # noqa: E731
        else:
            fn = lambda rows: rows  # noqa: E731
        return MicroBatcher(fn, max_batch=8, max_wait_ms=1.0, item_shape=(2,), labeled=labeled, **kw)

    def test_labels_ride_with_rows(self):
        b = self._echo_batcher()
        try:
            x = np.zeros((3, 2), np.float32)
            y = np.array([1, 2, 3], np.int32)
            out = b(x, y)
            np.testing.assert_array_equal(out, y.reshape(-1, 1) + np.zeros((3, 2)))
        finally:
            b.close()

    def test_mixed_class_requests_coalesce(self):
        b = self._echo_batcher()
        try:
            f1 = b.submit(np.zeros((2, 2), np.float32), np.array([1, 1], np.int32))
            f2 = b.submit(np.zeros((1, 2), np.float32), np.array([4], np.int32))
            r1, r2 = f1.result(timeout=5), f2.result(timeout=5)
            np.testing.assert_array_equal(r1[:, 0], [1, 1])
            np.testing.assert_array_equal(r2[:, 0], [4])
        finally:
            b.close()

    def test_labeled_submit_requires_labels(self):
        b = self._echo_batcher()
        try:
            with pytest.raises(ValueError, match="needs labels"):
                b.submit(np.zeros((2, 2), np.float32))
            with pytest.raises(ValueError, match="labels must be int"):
                b.submit(np.zeros((2, 2), np.float32), np.array([1], np.int32))
        finally:
            b.close()

    def test_unlabeled_batcher_rejects_labels(self):
        b = self._echo_batcher(labeled=False)
        try:
            with pytest.raises(ValueError, match="unconditional"):
                b.submit(np.zeros((2, 2), np.float32), np.array([0, 0], np.int32))
        finally:
            b.close()
