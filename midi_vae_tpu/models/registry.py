"""Model registry — makes the reference's ``--model`` flag real.

The reference CLI accepts ``--model`` (train.py:855-864) but hardcodes
``VanillaVAE`` at train.py:110. Here the flag selects from a registry,
and new model families register with a one-liner.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

from midi_vae_tpu.models.folded import FoldedVAE
from midi_vae_tpu.models.mlp import MLPVAE
from midi_vae_tpu.models.vae import VanillaVAE
from midi_vae_tpu.models.vq import VQVAE, FoldedVQVAE

MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {
    "vanillavae": VanillaVAE,
    "mlpvae": MLPVAE,
    "foldedvae": FoldedVAE,
    "vqvae": VQVAE,
    "foldedvqvae": FoldedVQVAE,
}

VQ_ARCHS = ("vqvae", "foldedvqvae")


def register_model(name: str, ctor: Callable[..., Any]) -> None:
    MODEL_REGISTRY[name.lower()] = ctor


def build_model(
    arch: str,
    *,
    in_channels: int,
    latent_dim: int,
    input_dim: int,
    hidden_dims=None,
    dtype=None,
    bn_axis_name=None,
    fused_reparam: bool = False,
    torch_compat: bool = False,
    stem: str = "conv",
    head: str = "deconv",
    fold: int = 4,
    verbose: bool = False,
    remat: bool = False,
    output_logit_bias=None,
    norm: str = "batch",
    num_classes: int = 0,
    codebook_size: int = 512,
    vq_decay: float = 0.99,
):
    """Construct a model by architecture name (case-insensitive).

    Mirrors the constructor call at train.py:110
    (``VanillaVAE(img_channels, config.n_features, input_dim=raw_img_size)``)
    but honors the requested architecture.
    """
    key = arch.lower()
    if key not in MODEL_REGISTRY:
        raise ValueError(f"Unrecognised architecture: {arch}. Known: {sorted(MODEL_REGISTRY)}")
    ctor = MODEL_REGISTRY[key]
    if key in VQ_ARCHS:
        if torch_compat:
            raise ValueError("torch_compat is reference-parity mode; the reference has no VQ-VAE")
        if fused_reparam:
            raise ValueError("VQVAE has no reparameterization; drop --fused")
        if num_classes:
            raise ValueError("VQVAE has no conditional variant; use --model VanillaVAE for --conditional")
    kwargs = dict(in_channels=in_channels, latent_dim=latent_dim, input_dim=input_dim)
    if key in VQ_ARCHS:
        kwargs["codebook_size"] = int(codebook_size)
        kwargs["vq_decay"] = float(vq_decay)
    if hidden_dims is not None:
        kwargs["hidden_dims"] = tuple(hidden_dims)
    if dtype is not None:
        kwargs["dtype"] = dtype
    if bn_axis_name is not None:
        kwargs["bn_axis_name"] = bn_axis_name
    if fused_reparam:
        kwargs["fused_reparam"] = True
    if torch_compat:
        kwargs["torch_compat"] = True
    if stem != "conv":
        kwargs["stem"] = stem
    if head != "deconv":
        kwargs["head"] = head
    if key in ("foldedvae", "foldedvqvae") and fold != 4:
        kwargs["fold"] = fold
    if verbose:
        kwargs["verbose"] = True
    if remat:
        kwargs["remat"] = True
    if output_logit_bias is not None:
        kwargs["output_logit_bias"] = float(output_logit_bias)
    if num_classes:
        # conditional VAE over that many classes (see models/vae.py)
        if num_classes < 0:
            raise ValueError(
                "conditional training needs a labeled dataset with a known class "
                f"count; got num_classes={num_classes} (unlabeled/by-folder)"
            )
        kwargs["num_classes"] = int(num_classes)
    if norm != "batch":
        if key == "mlpvae":
            raise ValueError("--norm applies to conv architectures; MLPVAE has no norm layers")
        if torch_compat:
            raise ValueError("torch_compat requires norm='batch' (reference BatchNorm2d parity)")
        kwargs["norm"] = norm
    return ctor(**kwargs)
