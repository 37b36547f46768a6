"""Train an autoregressive prior over a VQ-VAE checkpoint's code grids.

The second stage of the VQ-VAE pipeline (van den Oord et al. 2017 §3.3):
with the VQ-VAE frozen, encode the training corpus to ``[s, s]`` index
grids and fit a PixelCNN (``models/prior.py:CodePrior``) by maximum
likelihood. The resulting ``prior_latest.msgpack`` plugs into the
generate CLI (``--prior``) for structured sampling: prior code draws →
``VQVAE.decode_indices``.

Usage::

    python -m midi_vae_tpu.cli.train_prior --checkpoint CKPT [--epochs 20]

No reference equivalent (the reference has no discrete models).
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

PRIOR_LATEST = "prior_latest.msgpack"


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint", required=True, help="Trained VQ-VAE checkpoint (msgpack)")
    p.add_argument("--out", default=None,
                   help=f"Output path. Default: {PRIOR_LATEST} next to the checkpoint")
    p.add_argument("--dataset", default=None, help="Override the checkpoint's dataset")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--prior-arch", choices=("pixelcnn", "transformer"), default="pixelcnn",
                   help="Prior architecture: masked-conv PixelCNN (local texture, "
                        "van den Oord 2016) or a decoder-only transformer over the "
                        "raster-ordered codes (global structure, ImageGPT-style). "
                        "Both share the training/sampling machinery.")
    p.add_argument("--features", type=int, default=128,
                   help="Prior width (conv features / transformer d_model)")
    p.add_argument("--layers", type=int, default=6,
                   help="Masked-conv layers / transformer blocks")
    p.add_argument("--kernel-size", type=int, default=5, help="PixelCNN only")
    p.add_argument("--heads", type=int, default=4, help="Transformer attention heads")
    p.add_argument("--conditional", action="store_true",
                   help="Fit a class-conditional prior p(codes | y) from the dataset's labels "
                        "(van den Oord 2017 §5.1: the VQ-VAE stays unconditional; class "
                        "control lives in the prior). Sampling then takes --label.")
    p.add_argument("--no-eval", action="store_true",
                   help="Skip the held-out test-partition NLL after training "
                        "(reported in nats/position and bits/code, stored in the "
                        "checkpoint as test_nll — the standard prior-quality metric).")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="Force the CPU backend")
    return p


def held_out_nll(prior, params, grids: np.ndarray, labels: np.ndarray | None,
                 bs: int) -> float:
    """Mean NLL (nats/position) of a code-grid corpus under a trained prior.

    Ragged tail included: batches are per-grid means weighted by batch
    size, so every held-out grid counts exactly once.
    """
    @jax.jit
    def batch_nll(idx, y=None):
        return -prior.apply({"params": params}, idx, y, method=type(prior).log_likelihood)

    total, count = 0.0, 0
    for i in range(0, len(grids), bs):
        idx = jnp.asarray(grids[i:i + bs])
        y = jnp.asarray(labels[i:i + bs], jnp.int32) if labels is not None else None
        total += float(batch_nll(idx, y)) * idx.shape[0]
        count += int(idx.shape[0])
    positions = grids.shape[1] * grids.shape[2]
    return total / max(count, 1) / positions


def encode_corpus(model, params, batch_stats, loader, with_labels: bool = False):
    """Run the frozen VQ encoder over a loader → [N, s, s] int32 grids.

    ``with_labels=True`` returns ``(grids, labels-or-None)`` — the
    evaluate CLI's ``--codes-out`` tokenized-corpus export rides this
    same path, so the prior's training encoding and the exported codes
    cannot drift.
    """
    from midi_vae_tpu.models.vq import VQVAE

    @jax.jit
    def enc(x):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, x, method=VQVAE.encode_indices
        )

    grids, labels = [], []
    for batch in loader.epoch(1):
        idx = np.asarray(jax.device_get(enc(batch.x)))
        valid = np.asarray(batch.mask) > 0
        grids.append(idx[valid])
        if with_labels and getattr(batch, "y", None) is not None:
            labels.append(np.asarray(batch.y)[valid])
    grids = np.concatenate(grids, axis=0)
    if not with_labels:
        return grids
    return grids, (np.concatenate(labels, axis=0) if labels else None)


def cli(argv=None) -> None:
    args = get_parser().parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import optax

    from midi_vae_tpu.cli.generate import _load_model_and_state
    from midi_vae_tpu.data.fetch import fetch_dataset
    from midi_vae_tpu.data.pipeline import make_loader
    from midi_vae_tpu.data.transforms import VALID_TRANSFORMS, get_transform
    from midi_vae_tpu.io.checkpoint import save_checkpoint
    from midi_vae_tpu.models.prior import make_prior_train_step

    model, params, batch_stats, cfg, image_size, channels, ckpt_dataset = _load_model_and_state(
        args.checkpoint
    )
    if getattr(model, "latent_kind", "gaussian") != "vq":
        raise SystemExit(
            "the autoregressive prior models DISCRETE code grids; "
            f"this checkpoint is a {type(model).__name__} (Gaussian latent — its prior "
            "is already N(0, I), sample with the generate CLI directly)"
        )
    grid = model.last_conv_size
    num_codes = int(model.codebook_size)

    # Encode the train partition under eval-condition transforms (the
    # frozen encoder sees clean rolls, like the evaluate CLI's sweeps).
    dataset = args.dataset or ckpt_dataset
    data_dir = args.data_dir or cfg.get("data_dir")
    targs = {"normalization": dataset} if dataset in VALID_TRANSFORMS else {}
    _, transform_eval = get_transform(cfg.get("transform_type", "digits"), image_size, targs)
    train, _, test, _ = fetch_dataset(
        dataset, root=data_dir, prototyping=bool(cfg.get("prototyping", False)),
        transform_train=transform_eval, transform_eval=transform_eval,
        protoval_split_id=int(cfg.get("protoval_split_id") or 0),
    )
    loader = make_loader(train, min(args.batch_size, len(train)), train=False)
    t0 = time.time()
    grids, labels = encode_corpus(model, params, batch_stats, loader, with_labels=True)
    if hasattr(loader, "release"):
        loader.release()
    print(f"encoded {len(grids)} [{grid}x{grid}] code grids in {time.time() - t0:.1f}s "
          f"({len(np.unique(grids))} distinct codes in use)")
    test_grids = test_labels = None
    if not args.no_eval and test is not None and len(test) > 0:
        tloader = make_loader(test, min(args.batch_size, len(test)), train=False)
        test_grids, test_labels = encode_corpus(
            model, params, batch_stats, tloader, with_labels=True
        )
        if hasattr(tloader, "release"):
            tloader.release()

    num_classes = 0
    if args.conditional:
        if labels is None:
            raise SystemExit(
                f"--conditional needs labels, but dataset '{dataset}' exposes none"
            )
        from midi_vae_tpu.data.registry import image_dataset_sizes

        n_class = image_dataset_sizes(dataset)[0]
        num_classes = int(n_class) if n_class and n_class > 0 else int(labels.max()) + 1
        print(f"conditional prior over {num_classes} classes")

    prior = build_prior(
        args.prior_arch, num_codes=num_codes, features=args.features,
        layers=args.layers, kernel_size=args.kernel_size, heads=args.heads,
        num_classes=num_classes,
    )
    key = jax.random.PRNGKey(args.seed)
    y0 = jnp.zeros((1,), jnp.int32) if num_classes else None
    pparams = prior.init(key, jnp.zeros((1, grid, grid), jnp.int32), y0)["params"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(pparams)
    step = make_prior_train_step(prior, tx)

    n = len(grids)
    bs = min(args.batch_size, n)
    rng = np.random.default_rng(args.seed)
    nll = float("nan")
    for epoch in range(1, args.epochs + 1):
        order = rng.permutation(n)
        tot, batches = 0.0, 0
        for i in range(0, n - bs + 1, bs):  # drop ragged tail; reshuffled every epoch
            sel = order[i:i + bs]
            idx = jnp.asarray(grids[sel])
            y = jnp.asarray(labels[sel], jnp.int32) if num_classes else None
            pparams, opt_state, nll = step(pparams, opt_state, idx, y)
            tot += float(nll)
            batches += 1
        print(f"epoch {epoch}/{args.epochs}: nll {tot / max(batches, 1):.4f} nats/position")

    test_nll = None
    if test_grids is not None and num_classes and test_labels is None:
        print("skipping held-out NLL: conditional prior but the test partition has no labels")
        test_grids = None
    if test_grids is not None:
        test_nll = held_out_nll(
            prior, pparams, test_grids,
            test_labels if num_classes else None, bs=min(args.batch_size, len(test_grids)),
        )
        print(f"held-out test nll: {test_nll:.4f} nats/position "
              f"({test_nll / np.log(2.0):.4f} bits/code, {len(test_grids)} grids; "
              f"uniform = {np.log(num_codes):.4f} nats)")

    out = args.out or os.path.join(os.path.dirname(os.path.abspath(args.checkpoint)), PRIOR_LATEST)
    save_checkpoint(
        out,
        {"params": pparams},
        config={
            "kind": "vq-code-prior",
            "arch": args.prior_arch,
            "num_codes": num_codes,
            "grid": grid,
            "features": args.features,
            "layers": args.layers,
            "kernel_size": args.kernel_size,
            "heads": args.heads,
            "num_classes": num_classes,
            "vq_checkpoint": os.path.abspath(args.checkpoint),
            "final_nll": float(nll),
            "test_nll": test_nll,
        },
    )
    print(f"saved prior to {out}")


def build_prior(arch: str, *, num_codes: int, features: int, layers: int,
                kernel_size: int = 5, heads: int = 4, num_classes: int = 0):
    """Construct a code-prior module by architecture name.

    One constructor serves the train CLI and ``load_prior`` so a saved
    checkpoint always rebuilds the exact module that trained it.
    """
    from midi_vae_tpu.models.prior import CodePrior, TransformerCodePrior

    if arch == "pixelcnn":
        return CodePrior(
            num_codes=num_codes, features=features, num_layers=layers,
            kernel_size=kernel_size, num_classes=num_classes,
        )
    if arch == "transformer":
        return TransformerCodePrior(
            num_codes=num_codes, features=features, num_layers=layers,
            num_heads=heads, num_classes=num_classes,
        )
    raise ValueError(f"unknown prior architecture {arch!r}")


def load_prior(path: str):
    """Load a trained code prior → (module, params, config).

    Dispatches on the checkpoint's ``arch`` field (absent in pre-round-3
    checkpoints → pixelcnn, the original architecture).
    """
    from flax import serialization

    from midi_vae_tpu.io.checkpoint import load_checkpoint

    payload = load_checkpoint(path)
    pcfg = payload.get("config", {})
    if pcfg.get("kind") != "vq-code-prior":
        raise ValueError(f"{path} is not a VQ code-prior checkpoint (kind={pcfg.get('kind')!r})")
    num_classes = int(pcfg.get("num_classes") or 0)
    prior = build_prior(
        str(pcfg.get("arch") or "pixelcnn"),
        num_codes=int(pcfg["num_codes"]), features=int(pcfg["features"]),
        layers=int(pcfg["layers"]), kernel_size=int(pcfg.get("kernel_size") or 5),
        heads=int(pcfg.get("heads") or 4), num_classes=num_classes,
    )
    template = prior.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, int(pcfg["grid"]), int(pcfg["grid"])), jnp.int32),
        jnp.zeros((1,), jnp.int32) if num_classes else None,
    )["params"]
    params = serialization.from_state_dict(template, payload["state"]["params"])
    return prior, params, pcfg


if __name__ == "__main__":
    cli()
