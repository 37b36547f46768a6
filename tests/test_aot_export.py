"""AOT serving-artifact export (interop/aot_export.py): StableHLO
round-trips that match the live model, symbolic batch dims, conditional
label threading, and the CLI surface.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midi_vae_tpu.interop.aot_export import (
    AOTServingBundle,
    export_serving_programs,
)
from midi_vae_tpu.models import MLPVAE, VanillaVAE


def _tiny_model(num_classes=0):
    model = MLPVAE(in_channels=1, latent_dim=6, input_dim=16, hidden_dims=(32,),
                   num_classes=num_classes)
    x = jnp.zeros((2, 16, 16, 1), jnp.float32)
    kwargs = {"y": jnp.zeros((2,), jnp.int32)} if num_classes else {}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, x, **kwargs
    )
    return model, variables["params"], variables.get("batch_stats", {})


class TestExportRoundtrip:
    def test_matches_live_model_and_symbolic_batch(self, tmp_path):
        model, params, bs = _tiny_model()
        out = str(tmp_path / "art")
        manifest = export_serving_programs(
            model, params, bs, out, image_size=16, channels=1
        )
        assert set(manifest["programs"]) == {"reconstruct", "encode", "decode"}
        bundle = AOTServingBundle(out)

        variables = {"params": params, "batch_stats": bs}
        for n in (1, 3, 8):  # one artifact, several batch sizes (symbolic b)
            x = jax.random.uniform(jax.random.PRNGKey(n), (n, 16, 16, 1))
            enc = model.apply(variables, x, train=False, method=MLPVAE.encode)
            want_rec = model.apply(variables, enc.mu, train=False, method=MLPVAE.decode)
            np.testing.assert_allclose(
                np.asarray(bundle.reconstruct(x)), np.asarray(want_rec), rtol=1e-5, atol=1e-6
            )
            got_enc = np.asarray(bundle.encode(x))
            np.testing.assert_allclose(got_enc[:, :6], np.asarray(enc.mu), rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(got_enc[:, 6:], np.asarray(enc.log_var), rtol=1e-5, atol=1e-6)

        z = jax.random.normal(jax.random.PRNGKey(9), (4, 6))
        want_dec = model.apply(variables, z, train=False, method=MLPVAE.decode)
        np.testing.assert_allclose(
            np.asarray(bundle.decode(z)), np.asarray(want_dec), rtol=1e-5, atol=1e-6
        )

    def test_loader_needs_no_model_code(self, tmp_path):
        """The bundle reconstructs from the manifest + artifact bytes alone —
        no checkpoint, params, or model object."""
        model, params, bs = _tiny_model()
        out = str(tmp_path / "art")
        export_serving_programs(model, params, bs, out, image_size=16, channels=1)
        files = sorted(os.listdir(out))
        assert files == ["decode.jaxexp", "encode.jaxexp", "manifest.json", "reconstruct.jaxexp"]
        bundle = AOTServingBundle(out)
        assert bundle.conditional is False
        r = bundle.reconstruct(np.zeros((2, 16, 16, 1), np.float32))
        assert np.asarray(r).shape == (2, 16, 16, 1)

    def test_conditional_programs_take_labels(self, tmp_path):
        model, params, bs = _tiny_model(num_classes=4)
        out = str(tmp_path / "cond")
        manifest = export_serving_programs(
            model, params, bs, out, image_size=16, channels=1
        )
        assert manifest["conditional"] is True
        bundle = AOTServingBundle(out)
        assert bundle.num_classes == 4

        z = jax.random.normal(jax.random.PRNGKey(2), (3, 6))
        d0 = np.asarray(bundle.decode(z, np.zeros(3, np.int32)))
        d1 = np.asarray(bundle.decode(z, np.full(3, 2, np.int32)))
        assert d0.shape == (3, 16, 16, 1)
        assert not np.allclose(d0, d1)  # the label is load-bearing in the artifact

        variables = {"params": params, "batch_stats": bs}
        y = jnp.array([0, 1, 2], jnp.int32)
        want = model.apply(variables, z, train=False, y=y, method=MLPVAE.decode)
        np.testing.assert_allclose(
            np.asarray(bundle.decode(z, y)), np.asarray(want), rtol=1e-5, atol=1e-6
        )

    def test_conv_model_exports(self, tmp_path):
        model = VanillaVAE(in_channels=1, latent_dim=4, input_dim=32, hidden_dims=(8, 16))
        x = jnp.zeros((2, 32, 32, 1), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, x, train=True
        )
        out = str(tmp_path / "conv")
        export_serving_programs(
            model, variables["params"], variables.get("batch_stats", {}), out,
            image_size=32, channels=1,
        )
        bundle = AOTServingBundle(out)
        r = bundle.reconstruct(np.random.default_rng(0).random((5, 32, 32, 1), np.float32))
        assert np.asarray(r).shape == (5, 32, 32, 1)


@pytest.fixture(scope="module")
def trained_checkpoint(tmp_path_factory):
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    tmp_path = tmp_path_factory.mktemp("aot_ckpt")
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
        run_name="aotf",
        run_id="aotf1",
    )
    run(config)
    return config.checkpoint_path


class TestArtifactServing:
    """midi-vae-serve --artifact DIR: the HTTP server runs from the AOT
    bundle alone and answers exactly like the checkpoint-backed server."""

    @pytest.fixture(scope="class")
    def servers(self, trained_checkpoint, tmp_path_factory):
        from midi_vae_tpu.interop.aot_export import main as export_main
        from midi_vae_tpu.serving.server import serve

        art = str(tmp_path_factory.mktemp("aot_art") / "bundle")
        export_main(["--checkpoint", trained_checkpoint, "--out", art])
        ckpt_httpd = serve(trained_checkpoint, port=0)
        art_httpd = serve(artifact=art, port=0)
        yield (
            f"http://127.0.0.1:{ckpt_httpd.server_address[1]}",
            f"http://127.0.0.1:{art_httpd.server_address[1]}",
        )
        for h in (ckpt_httpd, art_httpd):
            h.shutdown()
            h.service.close()

    @staticmethod
    def _post(url, payload):
        import urllib.request

        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            return json.loads(resp.read())

    def test_healthz_identifies_artifact(self, servers):
        import urllib.request

        _, art = servers
        with urllib.request.urlopen(f"{art}/healthz", timeout=10) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert "AOT artifact" in health["model"]
        assert health["latent_dim"] == 8

    def test_reconstruct_matches_checkpoint_server(self, servers):
        ckpt, art = servers
        x = np.random.default_rng(0).random((2, 32, 32, 1)).astype(np.float32).tolist()
        a = np.asarray(self._post(f"{ckpt}/reconstruct", {"images": x})["reconstructions"])
        b = np.asarray(self._post(f"{art}/reconstruct", {"images": x})["reconstructions"])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_encode_matches_checkpoint_server(self, servers):
        ckpt, art = servers
        x = np.random.default_rng(1).random((3, 32, 32, 1)).astype(np.float32).tolist()
        a = self._post(f"{ckpt}/encode", {"images": x})
        b = self._post(f"{art}/encode", {"images": x})
        np.testing.assert_allclose(np.asarray(a["mu"]), np.asarray(b["mu"]), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(a["log_var"]), np.asarray(b["log_var"]), rtol=1e-5, atol=1e-6
        )

    def test_sample_matches_checkpoint_server(self, servers):
        """Same seed → same prior draw → same decode on both backends."""
        ckpt, art = servers
        a = np.asarray(self._post(f"{ckpt}/sample", {"n": 3, "seed": 7})["samples"])
        b = np.asarray(self._post(f"{art}/sample", {"n": 3, "seed": 7})["samples"])
        assert a.shape == b.shape == (3, 32, 32, 1)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_interpolate_matches_checkpoint_server(self, servers):
        ckpt, art = servers
        rng = np.random.default_rng(2)
        a_img = rng.random((32, 32, 1)).astype(np.float32).tolist()
        b_img = rng.random((32, 32, 1)).astype(np.float32).tolist()
        for extra in ({}, {"slerp": True}):
            pa = self._post(f"{ckpt}/interpolate", {"a": a_img, "b": b_img, "steps": 4, **extra})
            pb = self._post(f"{art}/interpolate", {"a": a_img, "b": b_img, "steps": 4, **extra})
            np.testing.assert_allclose(
                np.asarray(pa["path"]), np.asarray(pb["path"]), rtol=1e-4, atol=1e-5
            )


class TestManifestValidation:
    def test_platform_mismatch_fails_at_load(self, tmp_path):
        """A tpu-only artifact must refuse to LOAD on a cpu backend (not
        500 on the first request)."""
        model, params, bs = _tiny_model()
        out = str(tmp_path / "art")
        export_serving_programs(model, params, bs, out, image_size=16, channels=1)
        mpath = os.path.join(out, "manifest.json")
        with open(mpath) as f:
            manifest = json.load(f)
        manifest["platforms"] = ["tpu"]  # simulate a tpu-only export
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        with pytest.raises(ValueError, match="exported for platforms"):
            AOTServingBundle(out)

    def test_future_calling_convention_fails_at_load(self, tmp_path):
        model, params, bs = _tiny_model()
        out = str(tmp_path / "art")
        export_serving_programs(model, params, bs, out, image_size=16, channels=1)
        mpath = os.path.join(out, "manifest.json")
        with open(mpath) as f:
            manifest = json.load(f)
        assert manifest["calling_convention_version"] >= 1  # the real version
        manifest["calling_convention_version"] = 10_000
        with open(mpath, "w") as f:
            json.dump(manifest, f)
        with pytest.raises(ValueError, match="calling convention"):
            AOTServingBundle(out)


class TestCLI:
    def test_cli_exports_from_checkpoint(self, tmp_path):
        from midi_vae_tpu.interop.aot_export import main
        from midi_vae_tpu.train.config import TrainConfig
        from midi_vae_tpu.train.loop import run

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
            run_name="aot",
            run_id="aot1",
        )
        run(config)
        out = str(tmp_path / "artifacts")
        main(["--checkpoint", config.checkpoint_path, "--out", out, "--cpu"])
        with open(os.path.join(out, "manifest.json")) as f:
            manifest = json.load(f)
        assert manifest["image_size"] == 32
        bundle = AOTServingBundle(out)
        r = bundle.reconstruct(np.zeros((2, 32, 32, 1), np.float32))
        assert np.asarray(r).shape == (2, 32, 32, 1)

    def test_cross_platform_export_lists_platforms(self, tmp_path):
        """Multi-platform export (cpu+tpu) lowers without a TPU attached."""
        model, params, bs = _tiny_model()
        out = str(tmp_path / "multi")
        try:
            manifest = export_serving_programs(
                model, params, bs, out, image_size=16, channels=1,
                platforms=("cpu", "tpu"),
            )
        except Exception as e:  # pragma: no cover - platform-dependent
            pytest.skip(f"cross-platform lowering unavailable here: {e}")
        assert manifest["platforms"] == ["cpu", "tpu"]
        bundle = AOTServingBundle(out)  # runs on the cpu side of the artifact
        r = bundle.reconstruct(np.zeros((1, 16, 16, 1), np.float32))
        assert np.asarray(r).shape == (1, 16, 16, 1)
