"""Generation / inference CLI: prior samples, reconstructions, latent
interpolations from a trained checkpoint.

The reference defines ``sample``/``generate`` methods but ships no
script that calls them (SURVEY §3.4: "No script in the repo calls these
— they are the public inference API surface"); this CLI makes that
surface usable and adds the two capabilities BASELINE.json config #4
asks for beyond the reference: latent interpolation and MIDI export of
generated piano-rolls (``midi/derasterize.py``).

Usage::

    python -m midi_vae_tpu.cli.generate --checkpoint CKPT --mode sample -n 16 --out samples.png
    python -m midi_vae_tpu.cli.generate --checkpoint CKPT --mode reconstruct --dataset mnist
    python -m midi_vae_tpu.cli.generate --checkpoint CKPT --mode interpolate --steps 8 --slerp
    python -m midi_vae_tpu.cli.generate --checkpoint CKPT --mode sample --export-midi out_dir/
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Sample / reconstruct / interpolate from a trained VAE")
    parser.add_argument("--checkpoint", type=str, required=True, help="Checkpoint to load: a .msgpack file or an Orbax directory (auto-detected)")
    parser.add_argument("--mode", choices=("sample", "reconstruct", "interpolate", "traverse", "continue"), default="sample")
    parser.add_argument("-n", "--num-samples", type=int, default=16)
    parser.add_argument("--steps", type=int, default=8, help="Interpolation steps")
    parser.add_argument("--slerp", action="store_true", help="Spherical instead of linear interpolation")
    parser.add_argument("--dataset", type=str, default=None,
                        help="Dataset for reconstruct/interpolate inputs (default: from checkpoint config)")
    parser.add_argument("--data-dir", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default=None, help="Output PNG path (default: <mode>.png)")
    parser.add_argument("--export-midi", type=str, default=None,
                        help="Directory to also write each generated roll as a .mid file")
    parser.add_argument("--export-threshold", type=str, default=None, metavar="T|auto",
                        help="Binarization threshold for --export-midi note extraction "
                             "(default 0.1). 'auto' calibrates it on the checkpoint's own "
                             "reconstructions of the eval partition — picks the threshold "
                             "whose note-event statistics (duration/density/polyphony/"
                             "pitch-class histograms) sit closest to the real corpus's "
                             "(midi/calibrate.py; fixes the measured mid-note probability "
                             "sag that fragments long notes at a fixed threshold)")
    parser.add_argument("--no-ema", action="store_true",
                        help="Use the raw (non-averaged) parameters even when the checkpoint "
                             "carries EMA weights (runs trained with --ema-decay). Default: "
                             "EMA weights are preferred when present.")
    parser.add_argument("--label", type=int, default=None,
                        help="Conditional checkpoints (--conditional runs) or class-conditional "
                             "code priors (train_prior --conditional): generate this class. "
                             "Default for --mode sample: cycle through all classes (one column "
                             "per class in the grid); other modes use the fetched batch labels.")
    parser.add_argument("--cpu", action="store_true",
                        help="Force the CPU backend (backend symmetry with the other CLIs)")
    parser.add_argument("--prior", type=str, default=None,
                        help="VQ-VAE checkpoints, --mode sample: a trained code prior "
                             "(cli/train_prior.py) for structured ancestral sampling instead "
                             "of the i.i.d. EMA-marginal draw")
    parser.add_argument("--temperature", type=float, default=1.0,
                        help="Sampling temperature for --prior draws. Default: %(default)s")
    parser.add_argument("--top-p", type=float, default=None,
                        help="Nucleus sampling for --prior draws: each code is drawn from "
                             "the smallest set of codes covering this probability mass "
                             "(Holtzman 2020). Truncates the junk tail without the "
                             "mode-collapse of low temperature. Default: off")
    parser.add_argument("--keep-cols", type=int, default=None,
                        help="--mode continue: how many code-grid TIME columns of each "
                             "input roll to keep before the prior writes the rest "
                             "(default: half the grid). One code column spans "
                             "image_size/grid pixel columns of the roll.")
    return parser


def _load_model_and_state(checkpoint_path: str, use_ema: bool = True, payload=None):
    from flax import serialization

    from midi_vae_tpu.io.checkpoint import load_checkpoint
    from midi_vae_tpu.models.registry import build_model

    # callers that already deserialized the checkpoint pass it through
    # instead of paying a second full read
    if payload is None:
        payload = load_checkpoint(checkpoint_path)
    cfg = payload.get("config", {})
    enc = payload.get("encoder_config", {})
    image_size = int(enc.get("input_size") or cfg.get("image_size") or 32)
    from midi_vae_tpu.data.registry import image_dataset_sizes

    dataset = cfg.get("dataset_name", "mnist")
    _, _, channels = image_dataset_sizes(dataset)
    num_classes = int(cfg.get("num_classes") or 0) if cfg.get("conditional") else 0
    model = build_model(
        cfg.get("arch", "VanillaVAE"),
        in_channels=channels,
        latent_dim=int(cfg.get("n_features", 10)),
        input_dim=image_size,
        hidden_dims=tuple(cfg.get("hidden_dims") or (32, 64, 128, 256)),
        # architecture variants must match the trained param tree
        stem=cfg.get("stem", "conv"),
        head=cfg.get("head", "deconv"),
        fold=int(cfg.get("fold", 4)),
        torch_compat=bool(cfg.get("torch_compat", False)),
        norm=cfg.get("norm") or "batch",
        num_classes=num_classes,
        codebook_size=int(cfg.get("codebook_size") or 512),
        vq_decay=float(cfg.get("vq_decay") or 0.99),
    )
    sample = jnp.zeros((2, image_size, image_size, channels), jnp.float32)
    init_kwargs = {"y": jnp.zeros((2,), jnp.int32)} if num_classes else {}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "reparam": jax.random.PRNGKey(1)}, sample, **init_kwargs
    )
    template = {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})}
    state_dict = payload["state"]
    # EMA-trained checkpoints (--ema-decay) generate with the averaged
    # weights unless --no-ema asks for the raw ones
    params_src = state_dict["params"]
    if use_ema and state_dict.get("ema_params"):
        params_src = state_dict["ema_params"]
        print("Using EMA-averaged weights from the checkpoint (--no-ema for raw)")
    restored = serialization.from_state_dict(
        template, {"params": params_src, "batch_stats": state_dict.get("batch_stats", {})}
    )
    return model, restored["params"], restored["batch_stats"], cfg, image_size, channels, dataset


def _fetch_eval_batch(dataset: str, data_dir: Optional[str], image_size: int, n: int, cfg: dict):
    from midi_vae_tpu.data.fetch import fetch_dataset
    from midi_vae_tpu.data.pipeline import make_loader
    from midi_vae_tpu.data.transforms import VALID_TRANSFORMS, get_transform

    args = {"normalization": dataset} if dataset in VALID_TRANSFORMS else {}
    _, transform_eval = get_transform(cfg.get("transform_type", "digits"), image_size, args)
    _, _, test, _ = fetch_dataset(
        dataset, root=data_dir, transform_train=transform_eval, transform_eval=transform_eval
    )
    # make_loader (not DeviceLoader) so rrd: stream datasets route natively
    loader = make_loader(test, min(n, len(test)), train=False)
    # the spec rides along so display paths denormalize with the ACTUAL
    # normalization the batch got, not a default TransformSpec
    batch = next(iter(loader.epoch(1)))
    return batch.x, batch.y, transform_eval


def _to_grid(images: np.ndarray, cols: int = 8) -> np.ndarray:
    """Tile [N, H, W, C] into one [H', W', C] uint8 image."""
    images = np.clip(np.asarray(images, np.float32), 0.0, 1.0)
    n, h, w, c = images.shape
    cols = min(cols, n)
    rows = -(-n // cols)
    pad = rows * cols - n
    if pad:
        images = np.concatenate([images, np.zeros((pad, h, w, c), images.dtype)])
    grid = images.reshape(rows, cols, h, w, c).transpose(0, 2, 1, 3, 4).reshape(rows * h, cols * w, c)
    return (grid * 255).astype(np.uint8)


def _save_png(grid: np.ndarray, path: str) -> None:
    from PIL import Image

    arr = grid[..., 0] if grid.shape[-1] == 1 else grid
    Image.fromarray(arr).save(path)
    print(f"wrote {path}")


def _export_midi(rolls: np.ndarray, out_dir: str, threshold: float = 0.1) -> None:
    from midi_vae_tpu.midi.derasterize import roll_to_notes
    from midi_vae_tpu.midi.smf import write_smf

    os.makedirs(out_dir, exist_ok=True)
    for i, roll in enumerate(np.asarray(rolls)):
        notes = roll_to_notes(np.clip(roll, 0.0, 1.0), threshold=threshold)
        path = os.path.join(out_dir, f"generated_{i:03d}.mid")
        write_smf(notes, path)
    print(f"wrote {len(rolls)} .mid files to {out_dir} (threshold {threshold:g})")


def _resolve_export_threshold(args, model, params, batch_stats, cfg, dataset,
                              data_dir, image_size, key, labels_for) -> float:
    """--export-threshold: fixed float, or 'auto' = calibrate on the
    checkpoint's own reconstructions of the eval partition (midi/calibrate.py)."""
    if args.export_threshold is None:
        return 0.1  # midi/derasterize.py:roll_to_notes default
    spec_str = args.export_threshold.strip().lower()
    if spec_str != "auto":
        t = float(args.export_threshold)
        if not (0.0 < t < 1.0):
            raise SystemExit(f"--export-threshold must be in (0, 1), got {t}")
        return t

    from midi_vae_tpu.data.transforms import denormalize
    from midi_vae_tpu.evaluation.inference import reconstruct
    from midi_vae_tpu.midi.calibrate import calibrate_export_threshold

    n_cal = 256  # enough rolls for stable duration/density histograms
    x, yb, spec = _fetch_eval_batch(dataset, data_dir, image_size, n_cal, cfg)
    recon = reconstruct(model, params, batch_stats, x, key, y=labels_for(yb, x.shape[0]))
    targets = np.asarray(jax.device_get(denormalize(spec, x)))[..., 0]
    probs = np.asarray(jax.device_get(recon))[..., 0]
    best, rows = calibrate_export_threshold(probs, targets)
    fixed = next(r for r in rows if abs(r["threshold"] - 0.1) < 1e-9)
    chosen = next(r for r in rows if r["threshold"] == best)
    print(
        f"calibrated export threshold: {best:g} (JS mean {chosen['js_mean']:.4f}, "
        f"mean note duration {chosen['mean_duration']:.1f} cols) vs fixed 0.1 "
        f"(JS mean {fixed['js_mean']:.4f}, {fixed['mean_duration']:.1f} cols) "
        f"over {len(probs)} reconstructions of '{dataset}'"
    )
    return best


def cli(argv=None) -> None:
    args = get_parser().parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # validate the export-threshold spec BEFORE paying for generation
    if args.export_threshold is not None:
        if args.export_midi is None:
            raise SystemExit("--export-threshold applies to --export-midi runs only")
        if args.export_threshold.strip().lower() != "auto":
            try:
                t = float(args.export_threshold)
            except ValueError:
                raise SystemExit(
                    f"--export-threshold must be a float in (0, 1) or 'auto', "
                    f"got {args.export_threshold!r}"
                )
            if not (0.0 < t < 1.0):
                raise SystemExit(f"--export-threshold must be in (0, 1), got {t}")

    from midi_vae_tpu.evaluation.inference import interpolate, reconstruct, sample_prior

    model, params, batch_stats, cfg, image_size, channels, ckpt_dataset = _load_model_and_state(
        args.checkpoint, use_ema=not args.no_ema
    )
    dataset = args.dataset or ckpt_dataset
    data_dir = args.data_dir or cfg.get("data_dir")  # checkpoint remembers its corpus root
    key = jax.random.PRNGKey(args.seed)
    out_path = args.out or f"{args.mode}.png"

    conditional = getattr(model, "num_classes", 0) > 0
    if args.label is not None and not (
        args.prior is not None and args.mode in ("sample", "continue")
    ):
        # With --prior, conditioning may live in the PRIOR instead (class-
        # conditional code prior over an unconditional VQ-VAE) — validated
        # against the prior's class count once it is loaded below.
        if not conditional:
            raise SystemExit(
                "--label needs a conditional checkpoint (--conditional run); this one is "
                "unconditional, so the label would be silently ignored"
            )
        if not (0 <= args.label < model.num_classes):
            # out-of-range labels would one_hot to all-zeros — out-of-
            # distribution conditioning that decodes garbage with no error
            raise SystemExit(
                f"--label must be in [0, {model.num_classes - 1}] "
                f"(checkpoint has {model.num_classes} classes), got {args.label}"
            )

    def labels_for(y_batch, n):
        """Labels for conditional models: --label wins, else batch labels."""
        if not conditional:
            return None
        if args.label is not None:
            return jnp.full((n,), int(args.label), jnp.int32)
        return y_batch[:n]

    if args.prior is not None and not (
        args.mode in ("sample", "continue")
        and getattr(model, "latent_kind", "gaussian") == "vq"
    ):
        raise SystemExit("--prior applies to --mode sample/continue on VQVAE checkpoints only")
    if args.mode == "continue" and args.prior is None:
        raise SystemExit(
            "--mode continue needs --prior: a trained code prior writes the "
            "continuation (the EMA marginal has no spatial structure to continue with)"
        )
    if args.keep_cols is not None and args.mode != "continue":
        raise SystemExit("--keep-cols applies to --mode continue only")

    def load_matching_prior():
        """Load --prior, check geometry, resolve conditional labels."""
        from midi_vae_tpu.cli.train_prior import load_prior

        prior, pparams, pcfg = load_prior(args.prior)
        if int(pcfg["num_codes"]) != int(model.codebook_size) or int(pcfg["grid"]) != model.last_conv_size:
            raise SystemExit(
                f"prior geometry (K={pcfg['num_codes']}, grid={pcfg['grid']}) does not match "
                f"the checkpoint (K={model.codebook_size}, grid={model.last_conv_size})"
            )
        prior_classes = int(pcfg.get("num_classes") or 0)
        if prior_classes > 0 and args.label is not None and not (0 <= args.label < prior_classes):
            raise SystemExit(
                f"--label must be in [0, {prior_classes - 1}] "
                f"(prior has {prior_classes} classes), got {args.label}"
            )
        if prior_classes == 0 and args.label is not None:
            raise SystemExit(
                "--label needs a class-conditional prior (train_prior --conditional); "
                "this prior is unconditional, so the label would be silently ignored"
            )
        return prior, pparams, prior_classes

    if args.mode == "sample" and args.prior is not None:
        # two-stage VQ sampling: PixelCNN code draws → decode_indices
        from midi_vae_tpu.models.prior import sample_codes_autoregressive
        from midi_vae_tpu.models.vq import VQVAE

        prior, pparams, prior_classes = load_matching_prior()
        y = None
        if prior_classes > 0:
            # class control lives in the prior (train_prior --conditional):
            # --label K = all samples class K; default = one class per
            # grid column, same sweep convention as CVAE sampling
            y = (
                jnp.full((args.num_samples,), int(args.label), jnp.int32)
                if args.label is not None
                else jnp.arange(args.num_samples, dtype=jnp.int32) % prior_classes
            )
            print(f"conditional prior sampling: labels {np.asarray(y).tolist()}")
        idx = sample_codes_autoregressive(
            prior, pparams, key, args.num_samples, model.last_conv_size,
            temperature=args.temperature, y=y, top_p=args.top_p,
        )
        images = model.apply(
            {"params": params, "batch_stats": batch_stats}, idx, method=VQVAE.decode_indices
        )
    elif args.mode == "continue":
        # two-stage continuation: encode real rolls to code grids, keep the
        # first keep_cols TIME columns, let the prior write the rest, decode.
        # The output grid interleaves input | continuation pairs so the seam
        # is inspectable. A time-column prefix interleaves with the prior's
        # pitch-major raster order, so this is forced decoding (see
        # models/prior.py:sample_codes_autoregressive docstring).
        from midi_vae_tpu.data.transforms import denormalize
        from midi_vae_tpu.models.prior import sample_codes_autoregressive
        from midi_vae_tpu.models.vq import VQVAE

        prior, pparams, prior_classes = load_matching_prior()
        s = model.last_conv_size
        keep = s // 2 if args.keep_cols is None else args.keep_cols
        if not (0 < keep < s):
            raise SystemExit(
                f"--keep-cols must be in [1, {s - 1}] (grid is {s}x{s}; keeping every "
                f"column would be reconstruction, keeping none would be sampling), got {keep}"
            )
        x, yb, spec = _fetch_eval_batch(dataset, data_dir, image_size, args.num_samples, cfg)
        n = int(x.shape[0])
        codes = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, method=VQVAE.encode_indices
        )
        mask = np.zeros((s, s), bool)
        mask[:, :keep] = True  # grid axis j = time (rolls are [pitch, time])
        y = None
        if prior_classes > 0:
            if args.label is None:
                # dataset labels condition the prior directly; an out-of-range
                # value would be silently clipped by the on-device gather
                # instead of erroring, so validate like --label is validated
                yb_np = np.asarray(yb[:n])
                if yb_np.size and not ((yb_np >= 0) & (yb_np < prior_classes)).all():
                    raise SystemExit(
                        f"dataset labels {sorted(set(yb_np.tolist()) - set(range(prior_classes)))} "
                        f"are outside this prior's class range [0, {prior_classes - 1}]; "
                        "pass --label to condition on a fixed class instead"
                    )
            y = (
                jnp.full((n,), int(args.label), jnp.int32)
                if args.label is not None
                else yb[:n].astype(jnp.int32)
            )
        idx = sample_codes_autoregressive(
            prior, pparams, key, n, s,
            temperature=args.temperature, y=y, top_p=args.top_p,
            known=codes, known_mask=jnp.asarray(mask),
        )
        cont = model.apply(
            {"params": params, "batch_stats": batch_stats}, idx, method=VQVAE.decode_indices
        )
        kept_px = keep * image_size // s
        print(f"kept {keep}/{s} code columns = first {kept_px}/{image_size} roll columns")
        x01 = denormalize(spec, x)
        images = jnp.stack([x01, cont], axis=1).reshape(-1, *cont.shape[1:])
    elif args.mode == "sample":
        y = None
        if conditional:
            # --label K = all samples class K; default = cycle the classes so
            # the grid shows one class per column (class-conditional sweep)
            y = (
                jnp.full((args.num_samples,), int(args.label), jnp.int32)
                if args.label is not None
                else jnp.arange(args.num_samples, dtype=jnp.int32) % model.num_classes
            )
            print(f"conditional sampling: labels {np.asarray(y).tolist()}")
        images = sample_prior(model, params, batch_stats, key, args.num_samples, y=y)
    elif args.mode == "reconstruct":
        x, yb, spec = _fetch_eval_batch(dataset, data_dir, image_size, args.num_samples, cfg)
        recon = reconstruct(model, params, batch_stats, x, key, y=labels_for(yb, x.shape[0]))
        # interleave input | reconstruction pairs, like the wandb grids
        from midi_vae_tpu.data.transforms import denormalize

        x01 = denormalize(spec, x)
        images = jnp.stack([x01, recon], axis=1).reshape(-1, *recon.shape[1:])
    elif args.mode == "interpolate":
        x, yb, _ = _fetch_eval_batch(dataset, data_dir, image_size, 2, cfg)
        path = interpolate(
            model, params, batch_stats, x[:1], x[1:2],
            steps=args.steps, mode="slerp" if args.slerp else "lerp",
            y=labels_for(yb, 1),
        )
        images = path[:, 0]
    else:  # traverse: one row per latent dimension, varied across ±2.5σ
        from midi_vae_tpu.evaluation.inference import traverse

        if getattr(model, "latent_kind", "gaussian") == "vq":
            # the VQ latent is a [s, s, D] grid (hundreds of dims with no
            # posterior σ) — per-dimension traversal is meaningless and the
            # [dims × steps] output grid would be enormous
            raise SystemExit(
                "--mode traverse applies to Gaussian-latent models; for a VQVAE "
                "checkpoint use sample/reconstruct/interpolate"
            )
        x, yb, _ = _fetch_eval_batch(dataset, data_dir, image_size, 1, cfg)
        grid_rows = traverse(model, params, batch_stats, x, steps=args.steps, y=labels_for(yb, 1))
        images = grid_rows.reshape(-1, *grid_rows.shape[2:])

    images = np.asarray(jax.device_get(images))
    # traverse: one grid row per latent dimension (steps columns)
    cols = args.steps if args.mode == "traverse" else 8
    _save_png(_to_grid(images, cols=cols), out_path)
    if args.export_midi:
        threshold = _resolve_export_threshold(
            args, model, params, batch_stats, cfg, dataset, data_dir, image_size,
            jax.random.PRNGKey(args.seed + 1), labels_for,
        )
        _export_midi(images, args.export_midi, threshold=threshold)


if __name__ == "__main__":
    cli()
