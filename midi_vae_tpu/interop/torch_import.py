"""Import reference (torch) VanillaVAE weights into the flax model.

The reference's module tree (``/root/reference/midi_autoencoder/models.py:40-83``)
serializes as::

    encoder.{i}.0.{weight,bias}                    Conv2d       (O, I, kH, kW)
    encoder.{i}.1.{weight,bias,running_mean,running_var}  BatchNorm2d
    fc_mu.{weight,bias}  fc_var.{weight,bias}      Linear       (out, in)
    decoder_input.{weight,bias}                    Linear
    decoder.{i}.0.{weight,bias}                    ConvTranspose2d (I, O, kH, kW)
    decoder.{i}.1.*                                BatchNorm2d
    final_layer.0.* / final_layer.1.* / final_layer.3.*  ConvT / BN / Conv

Layout conversions to our NHWC flax model (``torch_compat=True``):

- Conv kernels: OIHW → HWIO (``transpose(2, 3, 1, 0)``).
- ConvTranspose kernels: IOHW → HWIO unflipped (``transpose(2, 3, 0, 1)``)
  — :class:`~midi_vae_tpu.models.vae.TorchConvTranspose` flips at apply.
- Dense layers touching the flattened feature map: torch flattens
  (C, H, W) row-major, we flatten (H, W, C); rows/columns are permuted
  accordingly so ``fc(flatten(x))`` matches bit for bit.

Works on the raw ``state_dict`` mapping (torch tensors or numpy arrays),
so loading does not require torch at call time if the dict was already
converted to numpy.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from midi_vae_tpu.models.vae import conv_output_size


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def flatten_permutation(spatial: int, channels: int) -> np.ndarray:
    """``perm`` with ``jax_flat[f] = torch_flat[perm[f]]`` for a
    (C, H, W)-row-major ↔ (H, W, C)-row-major flatten change."""
    torch_indices = np.arange(spatial * spatial * channels).reshape(channels, spatial, spatial)
    return torch_indices.transpose(1, 2, 0).reshape(-1)


def _bn(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]), "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def import_reference_state_dict(
    sd: Dict,
    *,
    input_dim: int = 32,
    hidden_dims: Sequence[int] = (32, 64, 128, 256),
) -> Dict[str, Dict]:
    """Reference ``state_dict`` → ``{"params": ..., "batch_stats": ...}``
    for ``VanillaVAE(..., torch_compat=True)``.

    The reference checkpoint stores the model under separate ``encoder``/
    ``decoder`` state dicts (utils.py:344-345); pass their union, or a
    whole-model ``state_dict()`` — the key layout is identical.
    """
    s = conv_output_size(input_dim, len(hidden_dims))
    perm = flatten_permutation(s, hidden_dims[-1])

    params: Dict = {}
    stats: Dict = {}

    enc_p, enc_s = {}, {}
    for i in range(len(hidden_dims)):
        bn_p, bn_s = _bn(sd, f"encoder.{i}.1")
        enc_p[f"ConvBlock_{i}"] = {
            "Conv_0": {
                "kernel": _np(sd[f"encoder.{i}.0.weight"]).transpose(2, 3, 1, 0),
                "bias": _np(sd[f"encoder.{i}.0.bias"]),
            },
            "BatchNorm_0": bn_p,
        }
        enc_s[f"ConvBlock_{i}"] = {"BatchNorm_0": bn_s}
    params["encoder"], stats["encoder"] = enc_p, enc_s

    for head in ("fc_mu", "fc_var"):
        w = _np(sd[f"{head}.weight"])  # (latent, flat_torch)
        params[head] = {"kernel": w.T[perm], "bias": _np(sd[f"{head}.bias"])}
    w = _np(sd["decoder_input.weight"])  # (flat_torch, latent)
    params["decoder_input"] = {"kernel": w.T[:, perm], "bias": _np(sd["decoder_input.bias"])[perm]}

    rev = list(reversed(list(hidden_dims)))
    dec_p, dec_s = {}, {}
    for i in range(len(rev) - 1):
        bn_p, bn_s = _bn(sd, f"decoder.{i}.1")
        dec_p[f"DeconvBlock_{i}"] = {
            "ConvTranspose_0": {
                "kernel": _np(sd[f"decoder.{i}.0.weight"]).transpose(2, 3, 0, 1),
                "bias": _np(sd[f"decoder.{i}.0.bias"]),
            },
            "BatchNorm_0": bn_p,
        }
        dec_s[f"DeconvBlock_{i}"] = {"BatchNorm_0": bn_s}
    params["decoder"], stats["decoder"] = dec_p, dec_s

    bn_p, bn_s = _bn(sd, "final_layer.1")
    params["final_layer"] = {
        "DeconvBlock_0": {
            "ConvTranspose_0": {
                "kernel": _np(sd["final_layer.0.weight"]).transpose(2, 3, 0, 1),
                "bias": _np(sd["final_layer.0.bias"]),
            },
            "BatchNorm_0": bn_p,
        },
        "Conv_0": {
            "kernel": _np(sd["final_layer.3.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd["final_layer.3.bias"]),
        },
    }
    stats["final_layer"] = {"DeconvBlock_0": {"BatchNorm_0": bn_s}}

    return {"params": params, "batch_stats": stats}
