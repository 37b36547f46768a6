"""Bit-level parity between the reference (torch) VanillaVAE and ours.

Weights are initialized in torch, imported via
``interop/torch_import.py`` into the flax model built with
``torch_compat=True``, and the two stacks are compared on the SAME
inputs and the SAME reparameterization noise:

- eval-mode forward (running BN stats): reconstruction parity,
- train-mode forward (batch BN stats): parity of mu/log_var/recon,
- ELBO values: our ``elbo_loss`` against the reference formula
  (models.py:208-216) computed in torch.

This is the foundation of the ELBO-parity artifact
(``benchmarks/elbo_parity.py``): if single-step math matches at float32
noise, curve agreement over hundreds of steps follows up to
reduction-order drift, which that harness quantifies.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from midi_vae_tpu.interop.torch_import import import_reference_state_dict  # noqa: E402
from midi_vae_tpu.losses.elbo import elbo_loss  # noqa: E402
from midi_vae_tpu.models.vae import VanillaVAE  # noqa: E402

IMG = 32
HID = (32, 64, 128, 256)


@pytest.fixture(scope="module")
def pair():
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
    from torch_cpu_baseline import TorchRefVAE

    torch.manual_seed(0)
    tmodel = TorchRefVAE(in_ch=1, latent=10, input_dim=IMG, hidden=HID)
    tmodel.eval()
    variables = import_reference_state_dict(tmodel.state_dict(), input_dim=IMG, hidden_dims=HID)
    jmodel = VanillaVAE(in_channels=1, latent_dim=10, input_dim=IMG, hidden_dims=HID, torch_compat=True)
    x = np.random.default_rng(0).uniform(0, 1, (4, 1, IMG, IMG)).astype(np.float32)
    return tmodel, jmodel, variables, x


def _jax_forward(jmodel, variables, x_nhwc, eps, train):
    """Manual forward with injected noise (mirrors models.py:185-188)."""

    def fwd(mdl):
        enc = mdl.encode(jnp.asarray(x_nhwc), train=train)
        z = enc.mu + jnp.asarray(eps) * jnp.exp(0.5 * enc.log_var)
        logits = mdl.decode_logits(z, train=train)
        return enc.mu, enc.log_var, jax.nn.sigmoid(logits), logits

    if train:
        (out, _) = jmodel.apply(variables, method=fwd, mutable=["batch_stats"])
        return out
    return jmodel.apply(variables, method=fwd)


@pytest.mark.parametrize("train", [False, True])
def test_forward_parity(pair, train):
    tmodel, jmodel, variables, x = pair
    eps = np.random.default_rng(1).standard_normal((4, 10)).astype(np.float32)

    tmodel.train(train)
    with torch.no_grad():
        recon_t, mu_t, lv_t = tmodel(torch.from_numpy(x), eps=torch.from_numpy(eps))
    tmodel.eval()

    mu_j, lv_j, recon_j, _ = _jax_forward(jmodel, variables, x.transpose(0, 2, 3, 1), eps, train)

    np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(recon_j).transpose(0, 3, 1, 2), recon_t.numpy(), atol=1e-4, rtol=1e-3
    )


def test_elbo_value_parity(pair):
    """Our elbo_loss on the imported model == the reference loss formula
    (models.py:208-216) evaluated in torch, on identical forwards."""
    tmodel, jmodel, variables, x = pair
    eps = np.random.default_rng(2).standard_normal((4, 10)).astype(np.float32)
    kld_weight = 2.5e-4

    with torch.no_grad():
        recon_t, mu_t, lv_t = tmodel(torch.from_numpy(x), eps=torch.from_numpy(eps))
        bce_t = torch.nn.functional.binary_cross_entropy(recon_t, torch.from_numpy(x))
        kld_t = -0.5 * torch.mean(torch.sum(1 + lv_t - mu_t**2 - torch.exp(lv_t), dim=-1))
        loss_t = float(bce_t + kld_weight * kld_t)

    mu_j, lv_j, recon_j, logits_j = _jax_forward(jmodel, variables, x.transpose(0, 2, 3, 1), eps, False)
    from midi_vae_tpu.core.types import EncoderOutput, ModelOutput

    out = ModelOutput(
        output=recon_j,
        logits=logits_j,
        input=jnp.asarray(x.transpose(0, 2, 3, 1)),
        encoded=EncoderOutput(mu=mu_j, log_var=lv_j, pre_latents=mu_j),
        latents=mu_j,
    )
    lo = elbo_loss(out, kld_weight=kld_weight)
    np.testing.assert_allclose(float(lo.loss), loss_t, rtol=2e-4)
    np.testing.assert_allclose(float(lo.reconstruction_loss), float(bce_t), rtol=2e-4)
    np.testing.assert_allclose(float(lo.kl), float(kld_t), rtol=2e-3, atol=1e-5)


class TestTorchExport:
    """Reverse interop: flax → reference state_dict (interop/torch_export)."""

    def test_roundtrip_bitwise(self, pair):
        from midi_vae_tpu.interop.torch_export import export_reference_state_dict

        tmodel, _, variables, _ = pair
        sd_orig = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
        sd_back = export_reference_state_dict(
            variables["params"], variables["batch_stats"], input_dim=IMG, hidden_dims=HID
        )
        assert set(sd_back) == set(sd_orig)
        for k in sd_orig:
            if k.endswith("num_batches_tracked"):
                continue
            np.testing.assert_array_equal(sd_back[k], sd_orig[k], err_msg=k)

    def test_exported_state_dict_loads_and_matches_forward(self, pair):
        """A fresh torch reference model loaded from the export produces the
        same deterministic forward as the flax model (eval mode, z = mu)."""
        from midi_vae_tpu.interop.torch_export import export_reference_state_dict

        _, jmodel, variables, x = pair
        sd = export_reference_state_dict(
            variables["params"], variables["batch_stats"], input_dim=IMG, hidden_dims=HID
        )
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
        from torch_cpu_baseline import TorchRefVAE

        fresh = TorchRefVAE(in_ch=1, latent=10, input_dim=IMG, hidden=HID)
        fresh.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
        fresh.eval()

        eps = np.zeros((4, 10), np.float32)  # z == mu
        mu_j, lv_j, recon_j, _ = _jax_forward(jmodel, variables, x.transpose(0, 2, 3, 1), eps, train=False)
        with torch.no_grad():
            recon_t, mu_t, _ = fresh(torch.tensor(x), eps=torch.tensor(eps))
        np.testing.assert_allclose(np.asarray(mu_j), mu_t.numpy(), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(recon_j), recon_t.numpy().transpose(0, 2, 3, 1), atol=2e-5
        )


def test_train_compat_then_export_cli(tmp_path):
    """Full CLI round trip: train --torch-compat, export with the
    interop CLI, load the exported state_dict into the torch reference
    model (strict) — migration works in BOTH directions."""
    from midi_vae_tpu.interop.torch_export import main as export_main
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    config = TrainConfig(
        dataset_name="vae-lines-synthetic",
        transform_type="noaug",
        image_size=32,
        torch_compat=True,
        n_features=8,
        hidden_dims=(8, 16, 32, 64),
        epochs=1,
        batch_size_per_device=16,
        num_devices=1,
        seed=0,
        models_dir=str(tmp_path / "m"),
        log_images=False,
        run_name="compat",
        run_id="cmp1",
    )
    run(config)

    out = str(tmp_path / "exported.pt")
    export_main(["--checkpoint", config.checkpoint_path, "--out", out])

    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
    from torch_cpu_baseline import TorchRefVAE

    tmodel = TorchRefVAE(in_ch=1, latent=8, input_dim=32, hidden=(8, 16, 32, 64))
    tmodel.load_state_dict(torch.load(out, weights_only=True))  # strict: every key maps
    tmodel.eval()
    with torch.no_grad():
        recon, mu, lv = tmodel(torch.zeros(2, 1, 32, 32), eps=torch.zeros(2, 8))
    assert recon.shape == (2, 1, 32, 32)
    assert torch.isfinite(recon).all() and torch.isfinite(mu).all()
