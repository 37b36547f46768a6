"""Train an autoregressive prior over a VQ-VAE checkpoint's code grids.

The second stage of the VQ-VAE pipeline (van den Oord et al. 2017 §3.3):
with the VQ-VAE frozen, encode the training corpus to ``[s, s]`` index
grids and fit a PixelCNN or transformer (``models/prior.py``) by maximum
likelihood. The resulting ``prior_latest.msgpack`` plugs into the
generate CLI (``--prior``) and the serving stack for structured
sampling: prior code draws → ``VQVAE.decode_indices``.

Framework-grade training (same contracts as the main trainer):

- **preemption resume**: the prior checkpoint is written every
  ``--save-every`` epochs with optimizer state and counters; rerunning
  with the same ``--out`` continues the NLL curve exactly where it
  stopped (reference resume semantics, ``train.py:320-329``) and a
  resumed run reproduces an uninterrupted one (epoch-keyed host RNG,
  ``core/rng.py``);
- **device-resident corpus + scan chunking**: the encoded code grids
  live on device once; ``--scan-steps`` train steps fuse into one
  compiled ``lax.scan`` program (the ``data/pipeline.py:322`` pattern),
  so epochs run with near-zero host dispatch;
- **data parallelism**: ``--num-devices`` shards the batch over a
  ``jax.sharding.Mesh`` data axis (XLA inserts the gradient psum);
- **observability**: ``metrics.jsonl`` + optional wandb under the
  reference's ``training/{stepwise,epochwise}`` namespaces, written to a
  ``prior/`` subdirectory next to the VQ checkpoint;
- ``--bf16`` compute (loss math stays f32, as the main trainer).

Usage::

    python -m midi_vae_tpu.cli.train_prior --checkpoint CKPT [--epochs 20]

No reference equivalent (the reference has no discrete models).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np

PRIOR_LATEST = "prior_latest.msgpack"

# Architecture/config fields that must come from the checkpoint on
# resume: training continues the SAME model, so the checkpoint wins and
# differing CLI values only warn (reference restore semantics flipped
# for identity fields — a changed width would make the params unloadable).
RESUME_ARCH_KEYS = ("arch", "features", "layers", "kernel_size", "heads", "num_classes")


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint", required=True, help="Trained VQ-VAE checkpoint (msgpack)")
    p.add_argument("--config", default=None, metavar="YAML",
                   help="Stage-1 config YAML whose `prior:` section supplies defaults for "
                        "this trainer (arch/features/layers/heads/epochs/lr/batch_size/"
                        "augment_passes/...). Explicit CLI flags win. The same file drives "
                        "both stages: `cli.train --config F` then `train_prior --config F` "
                        "(configs/vq16_fold8.yaml is the shipped two-stage recipe).")
    p.add_argument("--out", default=None,
                   help=f"Prior checkpoint path (resumed if it already exists). "
                        f"Default: {PRIOR_LATEST} next to the VQ checkpoint")
    p.add_argument("--dataset", default=None, help="Override the checkpoint's dataset")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--epochs", type=int, default=20,
                   help="TOTAL epochs (a resumed run trains only the remainder)")
    p.add_argument("--batch-size", type=int, default=256,
                   help="Global batch (rounded down to a multiple of --num-devices)")
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
    p.add_argument("--augment-passes", type=int, default=0, metavar="N",
                   help="Extra encode passes of the train partition under the TRAIN-time "
                        "augmentation transforms (pitch/time shift for the pianoroll "
                        "protocol), each pass with fresh shift draws — multiplies the "
                        "code-grid corpus (N+1)x. The clean pass and the held-out NLL "
                        "corpus stay eval-condition encoded. Datasets whose protocol "
                        "has no train-time augmentation gain nothing (the passes "
                        "re-encode identical rolls).")
    p.add_argument("--no-eval", action="store_true",
                   help="Skip the held-out test-partition NLL after training "
                        "(reported in nats/position and bits/code, stored in the "
                        "checkpoint as test_nll — the standard prior-quality metric).")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (f32 params and f32 loss math, like the "
                        "main trainer's --dtype bfloat16)")
    p.add_argument("--num-devices", type=int, default=None,
                   help="Data-parallel mesh size (default: 1). Batches shard over the "
                        "data axis; XLA inserts the gradient reduction.")
    p.add_argument("--scan-steps", type=int, default=16,
                   help="Train steps fused per compiled scan chunk (device-resident "
                        "corpus dispatch, data/pipeline.py pattern). 1 = step-per-call.")
    p.add_argument("--save-every", type=int, default=1, metavar="N",
                   help="Checkpoint the prior (params + optimizer state + counters) "
                        "every N epochs for preemption resume. Default: 1")
    p.add_argument("--log-interval", type=int, default=10,
                   help="Stepwise metric cadence (training/stepwise/* every N steps)")
    p.add_argument("--log-wandb", action="store_true")
    p.add_argument("--wandb-entity", default=None)
    p.add_argument("--wandb-project", default="midi_vae_tpu")
    p.add_argument("--run-name", default=None, help="wandb run name (default: prior-<arch>)")
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


def validate_labels(grids: np.ndarray, labels: np.ndarray | None, num_classes: int,
                    partition: str):
    """Drop grids whose labels fall outside ``[0, num_classes)``.

    An out-of-range label one-hots to an all-zero conditioning row — the
    grid would silently evaluate as if *unconditional*, skewing the NLL.
    Returns the filtered ``(grids, labels)`` and prints what was dropped.
    """
    if labels is None or num_classes <= 0:
        return grids, labels
    ok = (labels >= 0) & (labels < num_classes)
    if not bool(ok.all()):
        dropped = int((~ok).sum())
        print(f"dropping {dropped}/{len(labels)} {partition} grids with labels outside "
              f"[0, {num_classes}) — an out-of-range label would one-hot to a zero row "
              f"and evaluate as unconditional")
        return grids[ok], labels[ok]
    return grids, labels


def encode_corpus(model, params, batch_stats, loader, with_labels: bool = False,
                  epoch: int = 1):
    """Run the frozen VQ encoder over a loader → [N, s, s] int32 grids.

    ``with_labels=True`` returns ``(grids, labels-or-None)`` — the
    evaluate CLI's ``--codes-out`` tokenized-corpus export rides this
    same path, so the prior's training encoding and the exported codes
    cannot drift. ``epoch`` seeds the loader's per-batch transform keys,
    so augmentation passes (``--augment-passes``) draw distinct
    pitch/time shifts per pass.
    """
    from midi_vae_tpu.models.vq import VQVAE

    @jax.jit
    def enc(x):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, x, method=VQVAE.encode_indices
        )

    grids, labels = [], []
    for batch in loader.epoch(epoch):
        idx = np.asarray(jax.device_get(enc(batch.x)))
        valid = np.asarray(batch.mask) > 0
        grids.append(idx[valid])
        if with_labels and getattr(batch, "y", None) is not None:
            labels.append(np.asarray(batch.y)[valid])
    grids = np.concatenate(grids, axis=0)
    if not with_labels:
        return grids
    return grids, (np.concatenate(labels, axis=0) if labels else None)


def make_chunk_step(prior, tx, x_sharding, conditional: bool):
    """Compiled scan chunk: ``scan_steps`` maximum-likelihood updates over
    a device-resident corpus.

    ``(params, opt_state, grids, labels, sel)`` → ``(params, opt_state,
    nll[steps])`` where ``sel`` is ``[steps, bs]`` int32 indices into the
    resident ``grids`` (and ``labels``). The gather + forward + backward
    + update for the whole chunk is ONE XLA program — zero host dispatch
    between steps (the ``data/pipeline.py`` scan-chunking pattern).
    Batches are sharded over the mesh data axis; params stay replicated
    and XLA inserts the gradient reduction.
    """
    import optax

    def body_factory(grids, labels):
        def body(carry, sel):
            params, opt_state = carry
            idx = jax.lax.with_sharding_constraint(jnp.take(grids, sel, axis=0), x_sharding)
            y = None
            if conditional:
                y = jax.lax.with_sharding_constraint(jnp.take(labels, sel, axis=0), x_sharding)

            def loss_fn(p):
                logits = prior.apply({"params": p}, idx, y)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                picked = jnp.take_along_axis(
                    logp, idx[..., None].astype(jnp.int32), axis=-1
                )[..., 0]
                return -jnp.mean(picked)  # mean nats per position

            nll, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), nll

        return body

    @jax.jit
    def run_chunk(params, opt_state, grids, labels, sel):
        (params, opt_state), nlls = jax.lax.scan(
            body_factory(grids, labels), (params, opt_state), sel
        )
        return params, opt_state, nlls

    return run_chunk


def apply_prior_config(args, parser: argparse.ArgumentParser, argv=None):
    """Fold a YAML `prior:` section into parsed args as soft defaults.

    Explicit CLI flags always win — detected by scanning the raw argv
    tokens (the main trainer's mechanism, ``cli/train.py:args_to_config``),
    so a typed flag beats the YAML even when its value equals the argparse
    default. YAML key `arch` maps to ``--prior-arch``; every other key
    must name a parser dest verbatim.
    """
    import yaml

    with open(args.config) as f:
        section = (yaml.safe_load(f) or {}).get("prior") or {}
    if argv is None:
        argv = sys.argv[1:]
    opt_to_dest = {
        opt: action.dest for action in parser._get_optional_actions() for opt in action.option_strings
    }
    explicitly_set = set()
    for tok in argv:
        if tok.startswith("--"):
            opt = tok.split("=", 1)[0]
            dest = opt_to_dest.get(opt)
            if dest is None and len(opt) > 2:
                # mirror argparse prefix-abbreviation resolution
                matches = {d for o, d in opt_to_dest.items() if o.startswith(opt)}
                if len(matches) == 1:
                    dest = matches.pop()
            if dest:
                explicitly_set.add(dest)
    for key, value in section.items():
        dest = "prior_arch" if key == "arch" else key
        if not hasattr(args, dest):
            raise SystemExit(f"unknown key in {args.config} prior section: {key!r}")
        if dest not in explicitly_set:
            setattr(args, dest, value)
    return args


def cli(argv=None) -> None:
    parser = get_parser()
    args = parser.parse_args(argv)
    if args.config:
        args = apply_prior_config(args, parser, argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.prior_arch == "transformer" and args.features % args.heads:
        raise SystemExit(
            f"--features ({args.features}) must be divisible by --heads ({args.heads}) "
            "for the transformer prior (qkv_features = features)"
        )

    import optax
    from flax import serialization

    from midi_vae_tpu.cli.generate import _load_model_and_state
    from midi_vae_tpu.data.fetch import fetch_dataset
    from midi_vae_tpu.data.pipeline import make_loader
    from midi_vae_tpu.data.transforms import VALID_TRANSFORMS, get_transform
    from midi_vae_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from midi_vae_tpu.io.logging import MetricLogger, generate_id
    from midi_vae_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

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
    out = args.out or os.path.join(os.path.dirname(os.path.abspath(args.checkpoint)), PRIOR_LATEST)

    # -- preemption resume (reference train.py:67-71,320-329 semantics) ---
    resume = None
    if os.path.isfile(out):
        payload = load_checkpoint(out)
        if payload.get("config", {}).get("kind") == "vq-code-prior":
            resume = payload
            rcfg = resume["config"]
            for key in RESUME_ARCH_KEYS:
                live = {"arch": args.prior_arch, "num_classes": None}.get(
                    key, getattr(args, key, None)
                )
                ckpt_val = rcfg.get(key)
                if key == "num_classes":
                    continue  # re-derived below; the checkpoint's value wins there
                if live is not None and ckpt_val is not None and live != ckpt_val:
                    warnings.warn(
                        f"prior {key} differs from the resumed checkpoint: {live} (CLI) "
                        f"vs {ckpt_val} (checkpoint) — the checkpoint wins (same model "
                        "must continue training)",
                        UserWarning, stacklevel=2,
                    )
            args.prior_arch = str(rcfg.get("arch") or "pixelcnn")
            args.features = int(rcfg["features"])
            args.layers = int(rcfg["layers"])
            args.kernel_size = int(rcfg.get("kernel_size") or 5)
            args.heads = int(rcfg.get("heads") or 4)
            if int(rcfg.get("num_classes") or 0) > 0:
                args.conditional = True
            print(f"Resuming prior training from {out} "
                  f"(epoch {int(resume.get('epoch', 0))}, step {int(resume.get('total_step', 0))})")
        else:
            raise SystemExit(f"{out} exists but is not a VQ code-prior checkpoint")
    else:
        print(f"No prior checkpoint at {out} yet; starting fresh")

    # Encode the train partition under eval-condition transforms (the
    # frozen encoder sees clean rolls, like the evaluate CLI's sweeps).
    dataset = args.dataset or ckpt_dataset
    data_dir = args.data_dir or cfg.get("data_dir")
    targs = {"normalization": dataset} if dataset in VALID_TRANSFORMS else {}
    transform_train, transform_eval = get_transform(
        cfg.get("transform_type", "digits"), image_size, targs
    )
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
    if args.augment_passes > 0:
        # Multiply the corpus with train-transform encodes: the frozen
        # encoder maps each pitch/time-shifted roll to a DIFFERENT code
        # grid, giving the prior (N+1)x the code sequences to learn
        # run-continuation statistics from (code-space augmentation — the
        # roll augments themselves are the trainer's, transforms.py:58-93).
        aug_train, _, _, _ = fetch_dataset(
            dataset, root=data_dir, prototyping=bool(cfg.get("prototyping", False)),
            transform_train=transform_train, transform_eval=transform_eval,
            protoval_split_id=int(cfg.get("protoval_split_id") or 0),
        )
        t0 = time.time()
        extra_g, extra_l = [grids], [labels]
        for p in range(args.augment_passes):
            aug_loader = make_loader(
                aug_train, min(args.batch_size, len(aug_train)), train=True,
                seed=args.seed + p,
            )
            g, lab = encode_corpus(
                model, params, batch_stats, aug_loader, with_labels=True, epoch=p + 1
            )
            if hasattr(aug_loader, "release"):
                aug_loader.release()
            extra_g.append(g)
            if labels is not None and lab is not None:
                extra_l.append(lab)
        grids = np.concatenate(extra_g, axis=0)
        labels = np.concatenate(extra_l, axis=0) if len(extra_l) == len(extra_g) else labels
        if labels is not None and len(labels) != len(grids):
            raise SystemExit("an augmentation pass dropped labels; cannot train conditionally "
                             "on a partially-labeled corpus")
        print(f"augment passes x{args.augment_passes}: corpus now {len(grids)} grids "
              f"(+{time.time() - t0:.1f}s encode)")
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
        if resume is not None and int(resume["config"].get("num_classes") or 0) > 0:
            num_classes = int(resume["config"]["num_classes"])
        else:
            from midi_vae_tpu.data.registry import image_dataset_sizes

            n_class = image_dataset_sizes(dataset)[0]
            num_classes = int(n_class) if n_class and n_class > 0 else int(labels.max()) + 1
        print(f"conditional prior over {num_classes} classes")
        if int(labels.max()) >= num_classes or int(labels.min()) < 0:
            raise SystemExit(
                f"train labels span [{int(labels.min())}, {int(labels.max())}] — outside "
                f"[0, {num_classes}); an out-of-range label one-hots to a zero row and "
                "trains as unconditional. Fix the dataset registry's class count."
            )
        if test_grids is not None and test_labels is not None:
            test_grids, test_labels = validate_labels(
                test_grids, test_labels, num_classes, "held-out"
            )

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    prior = build_prior(
        args.prior_arch, num_codes=num_codes, features=args.features,
        layers=args.layers, kernel_size=args.kernel_size, heads=args.heads,
        num_classes=num_classes, dtype=dtype,
    )
    key = jax.random.PRNGKey(args.seed)
    y0 = jnp.zeros((1,), jnp.int32) if num_classes else None
    pparams = prior.init(key, jnp.zeros((1, grid, grid), jnp.int32), y0)["params"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(pparams)
    start_epoch, total_step = 0, 0
    if resume is not None:
        state_dict = resume["state"]
        pparams = serialization.from_state_dict(pparams, state_dict["params"])
        if "opt_state" in state_dict:
            opt_state = serialization.from_state_dict(opt_state, state_dict["opt_state"])
        else:  # pre-round-4 prior checkpoint: params only
            print("resumed checkpoint has no optimizer state (older format); "
                  "optimizer restarts fresh")
        start_epoch = int(resume.get("epoch", 0))
        total_step = int(resume.get("total_step", 0))

    # -- device placement: mesh + resident corpus --------------------------
    mesh = make_mesh(args.num_devices or 1)
    n_dev = mesh.devices.size
    rep = replicated(mesh)
    x_sharding = batch_sharding(mesh)
    n = len(grids)
    if n < n_dev:
        raise SystemExit(f"corpus has {n} grids but the mesh has {n_dev} devices; "
                         "reduce --num-devices")
    bs = min(args.batch_size, n)
    bs = max(n_dev, bs - bs % n_dev)  # global batch divisible by the mesh
    grids_dev = jax.device_put(jnp.asarray(grids, jnp.int32), rep)
    labels_dev = (
        jax.device_put(jnp.asarray(labels, jnp.int32), rep) if num_classes else grids_dev[:, 0, 0]
    )  # unconditional: a dummy resident array keeps one program signature
    pparams = jax.device_put(pparams, rep)
    opt_state = jax.device_put(opt_state, rep)
    if n_dev > 1:
        print(f"data-parallel prior training over {n_dev} devices (global batch {bs})")

    run_chunk = make_chunk_step(prior, tx, x_sharding, conditional=bool(num_classes))

    logger = MetricLogger(
        output_dir=os.path.join(os.path.dirname(os.path.abspath(out)), "prior"),
        use_wandb=args.log_wandb,
        wandb_entity=args.wandb_entity,
        wandb_project=args.wandb_project,
        run_name=args.run_name or f"prior-{args.prior_arch}",
        run_id=generate_id(),
        config={**vars(args), "num_codes": num_codes, "grid": grid},
    )

    def prior_config(final_nll, test_nll):
        return {
            "kind": "vq-code-prior",
            "arch": args.prior_arch,
            "num_codes": num_codes,
            "grid": grid,
            "features": args.features,
            "layers": args.layers,
            "kernel_size": args.kernel_size,
            "heads": args.heads,
            "num_classes": num_classes,
            "augment_passes": int(args.augment_passes),
            "bf16": bool(args.bf16),
            "seed": args.seed,
            "lr": args.lr,
            "batch_size": bs,
            "epochs": args.epochs,
            "dataset": dataset,
            "vq_checkpoint": os.path.abspath(args.checkpoint),
            "final_nll": final_nll,
            "test_nll": test_nll,
        }

    def save(epoch, nll, test_nll=None):
        save_checkpoint(
            out,
            {"params": pparams, "opt_state": opt_state},
            config=prior_config(float(nll), test_nll),
            epoch=epoch,
            total_step=total_step,
        )

    from midi_vae_tpu.core.rng import host_rng

    steps = max(n // bs, 1)
    nll = float(resume["config"].get("final_nll", float("nan"))) if resume else float("nan")
    if start_epoch >= args.epochs:
        print(f"checkpoint already at epoch {start_epoch} >= --epochs {args.epochs}; "
              "skipping training (held-out eval still runs)")
    positions = grid * grid
    for epoch in range(start_epoch + 1, args.epochs + 1):
        # epoch-keyed host RNG: a resumed run replays exactly the
        # permutations an uninterrupted run would have used (core/rng.py)
        order = host_rng(args.seed, epoch).permutation(n)[: steps * bs].reshape(steps, bs)
        t0 = time.time()
        epoch_nlls = []
        for c0 in range(0, steps, args.scan_steps):
            sel = jax.device_put(
                jnp.asarray(order[c0:c0 + args.scan_steps], jnp.int32), rep
            )
            pparams, opt_state, nlls = run_chunk(pparams, opt_state, grids_dev, labels_dev, sel)
            nlls = np.asarray(nlls)  # one host sync per chunk
            epoch_nlls.append(nlls)
            for k, v in enumerate(nlls):
                total_step += 1
                if total_step % args.log_interval == 0:
                    logger.log_namespaced(
                        "training/stepwise", {"nll": float(v), "epoch": epoch}, total_step
                    )
        duration = time.time() - t0
        nll = float(np.concatenate(epoch_nlls).mean()) if epoch_nlls else nll
        throughput = steps * bs / max(duration, 1e-9)
        print(f"epoch {epoch}/{args.epochs}: nll {nll:.4f} nats/position "
              f"({throughput:,.0f} grids/sec)")
        logger.log_namespaced(
            "training/epochwise",
            {"nll": nll, "throughput": throughput, "duration": duration, "epoch": epoch},
            total_step,
        )
        if epoch % max(args.save_every, 1) == 0 or epoch == args.epochs:
            save(epoch, nll)

    test_nll = None
    if test_grids is not None and num_classes and test_labels is None:
        print("skipping held-out NLL: conditional prior but the test partition has no labels")
        test_grids = None
    if test_grids is not None and len(test_grids) > 0:
        test_nll = held_out_nll(
            prior, pparams, test_grids,
            test_labels if num_classes else None, bs=min(bs, len(test_grids)),
        )
        print(f"held-out test nll: {test_nll:.4f} nats/position "
              f"({test_nll / np.log(2.0):.4f} bits/code, {len(test_grids)} grids; "
              f"uniform = {np.log(num_codes):.4f} nats)")
        logger.log_namespaced(
            "eval/test", {"nll": test_nll, "nll-per-grid": test_nll * positions}, total_step
        )

    save(max(start_epoch, args.epochs), nll, test_nll)
    logger.close()
    print(f"saved prior to {out}")


def build_prior(arch: str, *, num_codes: int, features: int, layers: int,
                kernel_size: int = 5, heads: int = 4, num_classes: int = 0,
                dtype=jnp.float32):
    """Construct a code-prior module by architecture name.

    One constructor serves the train CLI and ``load_prior`` so a saved
    checkpoint always rebuilds the exact module that trained it.
    """
    from midi_vae_tpu.models.prior import CodePrior, TransformerCodePrior

    if arch == "pixelcnn":
        return CodePrior(
            num_codes=num_codes, features=features, num_layers=layers,
            kernel_size=kernel_size, num_classes=num_classes, dtype=dtype,
        )
    if arch == "transformer":
        return TransformerCodePrior(
            num_codes=num_codes, features=features, num_layers=layers,
            num_heads=heads, num_classes=num_classes, dtype=dtype,
        )
    raise ValueError(f"unknown prior architecture {arch!r}")


def load_prior(path: str):
    """Load a trained code prior → (module, params, config).

    Dispatches on the checkpoint's ``arch`` field (absent in pre-round-3
    checkpoints → pixelcnn, the original architecture). Params are
    always f32 (``--bf16`` affects compute dtype only), so inference
    modules load at full precision regardless of how they trained.
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
