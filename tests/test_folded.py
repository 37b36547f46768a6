"""FoldedVAE: the fully folded TPU-native-layout variant (models/folded.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midi_vae_tpu.models.folded import FoldedVAE
from midi_vae_tpu.models.registry import build_model


def _init(model, x):
    return model.init({"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, x, train=True)


@pytest.mark.parametrize("input_dim", [28, 32, 128])
def test_shape_contract(input_dim):
    """Same I/O contract as VanillaVAE at every supported size, including
    the center-crop rule for non-power-of-two inputs."""
    model = FoldedVAE(in_channels=1, latent_dim=10, input_dim=input_dim, hidden_dims=(32, 64, 128, 256))
    x = jnp.ones((2, input_dim, input_dim, 1), jnp.float32) * 0.5
    variables = _init(model, x)
    out, _ = model.apply(
        variables, x, train=True, rngs={"reparam": jax.random.PRNGKey(2)}, mutable=["batch_stats"]
    )
    assert out.output.shape == (2, input_dim, input_dim, 1)
    assert out.latents.shape == (2, 10)
    assert float(out.output.min()) >= 0.0 and float(out.output.max()) <= 1.0


def test_latent_head_shapes_match_vanilla():
    """flattened_size parity: fc_mu/fc_var/decoder_input have the same
    shapes as VanillaVAE's, so checkpoints stay structurally comparable."""
    from midi_vae_tpu.models.vae import VanillaVAE

    kw = dict(in_channels=1, latent_dim=10, input_dim=32, hidden_dims=(32, 64, 128, 256))
    folded = FoldedVAE(**kw)
    vanilla = VanillaVAE(**kw)
    x = jnp.zeros((2, 32, 32, 1))
    vf, vv = _init(folded, x)["params"], _init(vanilla, x)["params"]
    for headname in ("fc_mu", "fc_var", "decoder_input"):
        assert vf[headname]["kernel"].shape == vv[headname]["kernel"].shape


def test_all_convs_run_at_folded_resolution():
    """No intermediate tensor exceeds input/fold spatial size: verified by
    tracing shapes through a capturing interceptor."""
    seen = []

    def capture(next_fn, args, kwargs, context):
        out = next_fn(*args, **kwargs)
        if hasattr(out, "shape") and getattr(out, "ndim", 0) == 4:
            seen.append(tuple(out.shape))
        return out

    model = FoldedVAE(in_channels=1, latent_dim=4, input_dim=128, hidden_dims=(8, 16, 32, 64))
    x = jnp.zeros((1, 128, 128, 1))
    import flax.linen as nn

    with nn.intercept_methods(capture):
        variables = _init(model, x)
        model.apply(variables, x, train=False, rngs={"reparam": jax.random.PRNGKey(2)})
    conv_outputs = [s for s in seen if s[1] > 1]
    # the only full-resolution 4-D tensors are the input/logits (1 channel)
    assert all(s[1] <= 32 or s[3] <= 1 for s in conv_outputs), conv_outputs


def test_trains_end_to_end(tmp_path):
    from midi_vae_tpu.train.config import TrainConfig
    from midi_vae_tpu.train.loop import run

    c = TrainConfig(
        dataset_name="vae-lines-synthetic",
        epochs=1,
        batch_size_per_device=16,
        num_devices=1,
        models_dir=str(tmp_path),
        seed=0,
        arch="FoldedVAE",
        hidden_dims=(8, 16, 32, 64),
        n_features=8,
        log_images=False,
    )
    r = run(c)
    assert np.isfinite(r["train"]["loss"])
    assert r["final_train"]["cross-entropy"] < 1.0  # learned something


def test_registry_and_validation():
    m = build_model("FoldedVAE", in_channels=1, latent_dim=4, input_dim=32, hidden_dims=(8, 16))
    assert isinstance(m, FoldedVAE)
    bad = FoldedVAE(in_channels=1, latent_dim=4, input_dim=30, hidden_dims=(8, 16))  # 30 % 4 != 0
    with pytest.raises(ValueError, match="divisible by fold"):
        _init(bad, jnp.zeros((1, 30, 30, 1)))
    bad2 = FoldedVAE(in_channels=1, latent_dim=4, input_dim=32, hidden_dims=(8, 16), head="d2s")
    with pytest.raises(ValueError, match="its own layout"):
        _init(bad2, jnp.zeros((1, 32, 32, 1)))
    bad3 = FoldedVAE(in_channels=1, latent_dim=4, input_dim=32, hidden_dims=(8,), fold=4)
    with pytest.raises(ValueError, match="exceeds"):
        _init(bad3, jnp.zeros((1, 32, 32, 1)))
    # fold=1 would leave the decoder one upsample short of decoded_size
    # (the head's depth-to-space provides the final xfold) — clear error
    bad4 = FoldedVAE(in_channels=1, latent_dim=4, input_dim=32, hidden_dims=(8, 16), fold=1)
    with pytest.raises(ValueError, match="fold >= 2"):
        _init(bad4, jnp.zeros((1, 32, 32, 1)))
