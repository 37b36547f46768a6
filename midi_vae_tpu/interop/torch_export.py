"""Export flax VanillaVAE weights to a reference (torch) ``state_dict``.

The exact inverse of :mod:`midi_vae_tpu.interop.torch_import` — layout
conversions reversed (HWIO → OIHW convs, HWIO → IOHW transposed convs,
(H, W, C) → (C, H, W) flatten permutations on the dense layers touching
the feature map), producing the reference module tree's key layout
(``/root/reference/midi_autoencoder/models.py:40-83``):

    encoder.{i}.0.*  encoder.{i}.1.*  fc_mu.*  fc_var.*
    decoder_input.*  decoder.{i}.0.*  decoder.{i}.1.*
    final_layer.{0,1,3}.*

so a checkpoint trained here can be loaded into the reference's
``VanillaVAE`` (or any torch reimplementation of it) with
``load_state_dict`` and serve/fine-tune in torch. Round-trips bitwise
through :func:`~midi_vae_tpu.interop.torch_import.import_reference_state_dict`
(tested). Only the ``torch_compat=True`` architecture exports — it is
the one with a reference twin.

Returns plain numpy arrays; call sites can wrap in ``torch.tensor``.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from midi_vae_tpu.interop.torch_import import flatten_permutation
from midi_vae_tpu.models.vae import conv_output_size


def _np(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def _bn_out(sd: Dict, prefix: str, params: Dict, stats: Dict, num_batches: int = 0) -> None:
    sd[f"{prefix}.weight"] = _np(params["scale"])
    sd[f"{prefix}.bias"] = _np(params["bias"])
    sd[f"{prefix}.running_mean"] = _np(stats["mean"])
    sd[f"{prefix}.running_var"] = _np(stats["var"])
    # Representative training-step count. torch only consults this counter
    # when fine-tuning with BatchNorm momentum=None (cumulative-average
    # mode); flax BN has no such counter, so the checkpoint's total_step is
    # the honest stand-in (every BN layer saw every step).
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(num_batches, dtype=np.int64)


def export_reference_state_dict(
    params: Dict,
    batch_stats: Dict,
    *,
    input_dim: int = 32,
    hidden_dims: Sequence[int] = (32, 64, 128, 256),
    num_batches_tracked: int = 0,
) -> Dict[str, np.ndarray]:
    """``{"params", "batch_stats"}`` of ``VanillaVAE(torch_compat=True)``
    → reference-layout ``state_dict`` of numpy arrays.

    ``num_batches_tracked`` stamps every BN layer's counter (pass the
    checkpoint's ``total_step``; see ``_bn_out``)."""
    s = conv_output_size(input_dim, len(hidden_dims))
    perm = flatten_permutation(s, hidden_dims[-1])
    inv_perm = np.empty_like(perm)
    inv_perm[perm] = np.arange(perm.size)

    sd: Dict[str, np.ndarray] = {}

    for i in range(len(hidden_dims)):
        blk = params["encoder"][f"ConvBlock_{i}"]
        sd[f"encoder.{i}.0.weight"] = _np(blk["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)  # HWIO→OIHW
        sd[f"encoder.{i}.0.bias"] = _np(blk["Conv_0"]["bias"])
        _bn_out(
            sd, f"encoder.{i}.1", blk["BatchNorm_0"],
            batch_stats["encoder"][f"ConvBlock_{i}"]["BatchNorm_0"],
            num_batches_tracked,
        )

    for head in ("fc_mu", "fc_var"):
        k = _np(params[head]["kernel"])  # (flat_jax, latent)
        sd[f"{head}.weight"] = k.T[:, inv_perm]  # (latent, flat_torch)
        sd[f"{head}.bias"] = _np(params[head]["bias"])
    k = _np(params["decoder_input"]["kernel"])  # (latent, flat_jax)
    sd["decoder_input.weight"] = k[:, inv_perm].T  # (flat_torch, latent)
    sd["decoder_input.bias"] = _np(params["decoder_input"]["bias"])[inv_perm]

    rev = list(reversed(list(hidden_dims)))
    for i in range(len(rev) - 1):
        blk = params["decoder"][f"DeconvBlock_{i}"]
        # HWIO (unflipped) → IOHW: transpose(2, 3, 0, 1) is its own inverse
        sd[f"decoder.{i}.0.weight"] = _np(blk["ConvTranspose_0"]["kernel"]).transpose(2, 3, 0, 1)
        sd[f"decoder.{i}.0.bias"] = _np(blk["ConvTranspose_0"]["bias"])
        _bn_out(
            sd, f"decoder.{i}.1", blk["BatchNorm_0"],
            batch_stats["decoder"][f"DeconvBlock_{i}"]["BatchNorm_0"],
            num_batches_tracked,
        )

    fl = params["final_layer"]
    sd["final_layer.0.weight"] = _np(fl["DeconvBlock_0"]["ConvTranspose_0"]["kernel"]).transpose(2, 3, 0, 1)
    sd["final_layer.0.bias"] = _np(fl["DeconvBlock_0"]["ConvTranspose_0"]["bias"])
    _bn_out(
        sd, "final_layer.1", fl["DeconvBlock_0"]["BatchNorm_0"],
        batch_stats["final_layer"]["DeconvBlock_0"]["BatchNorm_0"],
        num_batches_tracked,
    )
    sd["final_layer.3.weight"] = _np(fl["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)
    sd["final_layer.3.bias"] = _np(fl["Conv_0"]["bias"])

    return sd


def main(argv=None) -> None:
    """CLI: export a trained checkpoint to a reference-format state_dict.

    Usage::

        python -m midi_vae_tpu.interop.torch_export --checkpoint CKPT --out ref.pt

    Writes ``torch.save``-format when torch is importable, ``.npz``
    otherwise (torch loads the npz via ``{k: torch.tensor(v)}``).
    """
    import argparse

    ap = argparse.ArgumentParser(description="Export a checkpoint to a torch-reference state_dict")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True, help=".pt (torch.save) or .npz output path")
    args = ap.parse_args(argv)

    from midi_vae_tpu.cli.generate import _load_model_and_state
    from midi_vae_tpu.io.checkpoint import load_checkpoint

    payload = load_checkpoint(args.checkpoint)  # one read serves model + counters
    model, params, batch_stats, cfg, image_size, _, _ = _load_model_and_state(
        args.checkpoint, use_ema=True, payload=payload
    )
    if type(model).__name__ != "VanillaVAE" or not getattr(model, "torch_compat", False):
        raise SystemExit(
            "only VanillaVAE(torch_compat=True) checkpoints have a reference twin to export to "
            f"(got {type(model).__name__}, torch_compat={getattr(model, 'torch_compat', False)}); "
            "train with --torch-compat for a torch-exportable run"
        )
    if getattr(model, "num_classes", 0) > 0:
        raise SystemExit(
            "conditional (--conditional) checkpoints widen the latent-head/decoder-input "
            "layers with the label one-hot; the torch reference has no conditional twin"
        )
    total_step = int(payload.get("total_step", 0))
    sd = export_reference_state_dict(
        params, batch_stats, input_dim=image_size, hidden_dims=tuple(model.hidden_dims),
        num_batches_tracked=total_step,
    )
    if args.out.endswith(".npz"):
        np.savez(args.out, **sd)
    else:
        try:
            import torch
        except ImportError as e:
            raise SystemExit(f"torch unavailable ({e}); use an .npz output path") from e
        torch.save({k: torch.tensor(v) for k, v in sd.items()}, args.out)
    print(f"wrote {len(sd)} tensors to {args.out}")


if __name__ == "__main__":
    main()
