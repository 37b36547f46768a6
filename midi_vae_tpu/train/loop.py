"""Training orchestration (reference: ``train.py:19-767``).

Same phases as the reference ``run``: seed → checkpoint config restore →
model build → data/loaders → optimizer/scheduler → logging setup →
state restore → epoch loop (train, validate, save, log) → final
test/val/train-under-eval-conditions evaluation. The hot loop is one
jitted program per step (see ``train/state.py``); host code only
shuffles indices, feeds the prefetch queue, and logs.

Reference bugs deliberately not replicated (SURVEY §7):
- checkpoints save on process 0 (train.py:444 inverts the rank gate)
- ``best_epoch`` actually tracks the best validation epoch (the
  reference initializes it and never updates, train.py:318)
- the full parameter set is optimized and checkpointed (train.py:210-225,
  445-451 silently drop the latent heads and final layer)
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from datetime import datetime
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from midi_vae_tpu.core.rng import epoch_key as derive_epoch_key
from midi_vae_tpu.core.rng import root_key
from midi_vae_tpu.data.fetch import fetch_dataset
from midi_vae_tpu.data.pipeline import DeviceLoader, make_loader
from midi_vae_tpu.data.registry import image_dataset_sizes
from midi_vae_tpu.data.transforms import VALID_TRANSFORMS, get_transform
from midi_vae_tpu.evaluation.evaluate import evaluate, make_eval_step
from midi_vae_tpu.io.checkpoint import (
    CHECKPOINT_LATEST,
    ORBAX_CHECKPOINT_LATEST,
    AsyncCheckpointWriter,
    copy_best,
    load_checkpoint,
    restore_config,
    save_checkpoint,
)
from midi_vae_tpu.io.logging import MetricLogger, PhaseTimer, generate_id, print_epoch_summary
from midi_vae_tpu.losses.schedules import kl_weight_schedule
from midi_vae_tpu.models.registry import build_model
from midi_vae_tpu.models.vq import codebook_metrics
from midi_vae_tpu.models.vae import param_group_label
from midi_vae_tpu.parallel.mesh import batch_sharding, make_mesh, make_mesh_multislice, replicate
from midi_vae_tpu.train.config import TrainConfig
from midi_vae_tpu.train.optim import build_optimizer, scale_lr
from midi_vae_tpu.train.state import create_train_state, make_train_step


def run(config: TrainConfig) -> dict:
    """Run a training job (reference contract: train.py:19)."""
    t_run_start = time.time()

    if config.compilation_cache:
        # before any jit: already-compiled programs are not retro-cached
        from midi_vae_tpu.core.compile_cache import enable_compilation_cache

        print(f"Persistent compilation cache: {enable_compilation_cache(config.compilation_cache)}")
    if config.debug_nans:
        jax.config.update("jax_debug_nans", True)
    # Batch-sharded reparam noise is drawn from ONE replicated key over the
    # global batch shape; partitionable threefry lets each shard generate
    # its rows locally instead of gathering the full noise tensor.
    jax.config.update("jax_threefry_partitionable", True)

    print("\nConfiguration:\n")
    print(config)
    devices = jax.devices()
    print(f"\nFound {len(devices)} device(s): {[str(d) for d in devices]}")

    # RESTORE OMITTED CONFIG FROM RESUMPTION CHECKPOINT (train.py:59-99) ======
    from midi_vae_tpu.io.orbax_io import is_orbax_checkpoint

    checkpoint_payload = None
    if config.checkpoint_path:
        config.model_output_dir = os.path.dirname(config.checkpoint_path)
        # a checkpoint "exists" as a msgpack file OR a completed Orbax dir
        if not (os.path.isfile(config.checkpoint_path) or is_orbax_checkpoint(config.checkpoint_path)):
            print(
                "Skipping premature resumption from preemption: no checkpoint file"
                f" found at '{config.checkpoint_path}'"
            )
        else:
            print(f"Loading resumption checkpoint '{config.checkpoint_path}'")
            checkpoint_payload = load_checkpoint(config.checkpoint_path)
            merged = restore_config(config.to_dict(), checkpoint_payload.get("config", {}))
            config = TrainConfig.from_dict(merged)
            # keep writing the format we resumed from, in BOTH directions:
            # saving msgpack onto an orbax dir (or orbax into a .msgpack
            # file) would crash at the first end-of-epoch save
            resumed_backend = "orbax" if is_orbax_checkpoint(config.checkpoint_path) else "msgpack"
            if config.checkpoint_backend != resumed_backend:
                print(f"Note: resumed a {resumed_backend} checkpoint; saves stay {resumed_backend}.")
                config.checkpoint_backend = resumed_backend

    start_epoch = 1 if checkpoint_payload is None else int(checkpoint_payload["epoch"]) + 1

    # MODEL SIZING (the model itself builds after the dataset, which the
    # "auto" loss/init statistics need) =======================================
    n_class, raw_img_size, img_channels = image_dataset_sizes(config.dataset_name)
    if config.image_size is None:
        # Reference hardcodes 32 regardless of dataset (train.py:105); same
        # default here, but --image-size genuinely works.
        config.image_size = 32
    dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    encoder_config = {"input_size": config.image_size, "n_feature": config.n_features}

    # MESH ====================================================================
    if config.mesh_slices:
        if config.num_devices is not None:
            if config.num_devices % config.mesh_slices:
                raise ValueError(
                    f"--num-devices {config.num_devices} does not divide into "
                    f"--mesh-slices {config.mesh_slices}"
                )
            mesh = make_mesh_multislice(config.mesh_slices, config.num_devices // config.mesh_slices)
        else:
            # let the helper infer chips_per_slice (and validate divisibility /
            # per-slice capacity — on real multi-slice platforms slices group
            # by slice_index, so a flat device-count division would be wrong)
            mesh = make_mesh_multislice(config.mesh_slices)
    else:
        mesh = make_mesh(config.num_devices)
    n_devices = mesh.devices.size
    global_batch_size = config.batch_size_per_device * n_devices
    x_sharding = batch_sharding(mesh)
    print(
        f"Data-parallel mesh over {n_devices} device(s)"
        + (f" ({config.mesh_slices} slices)" if config.mesh_slices else "")
        + f"; global batch size {global_batch_size}"
    )

    # DATASET (train.py:131-191) ==============================================
    transform_args = {}
    if config.dataset_name in VALID_TRANSFORMS:
        transform_args["normalization"] = config.dataset_name
    transform_train, transform_eval = get_transform(config.transform_type, config.image_size, transform_args)

    dataset_args = dict(
        dataset=config.dataset_name,
        root=config.data_dir,
        prototyping=config.prototyping,
        download=config.allow_download_dataset,
        protoval_split_rate=config.protoval_split_rate,
    )
    if config.protoval_split_id is not None:
        dataset_args["protoval_split_id"] = config.protoval_split_id
    dataset_train, dataset_val, dataset_test, distinct_val_test = fetch_dataset(
        **dataset_args, transform_train=transform_train, transform_eval=transform_eval
    )
    eval_set = "Val" if distinct_val_test else "Test"

    # MODEL (train.py:101-115) ================================================
    from midi_vae_tpu.data.stats import estimate_base_rate, resolve_auto

    # one corpus sweep serves every "auto" resolution below
    base_rate = (
        estimate_base_rate(dataset_train)
        if "auto" in (config.bce_pos_weight, config.output_bias_init)
        else None
    )
    pos_weight = resolve_auto(config.bce_pos_weight, dataset_train, "pos_weight", base_rate=base_rate)
    output_bias = resolve_auto(config.output_bias_init, dataset_train, "bias", base_rate=base_rate)
    # --bce-targets raw: the loss de-normalizes targets back to [0, 1]
    target_denorm = (
        (tuple(transform_train.mean), tuple(transform_train.std))
        if config.bce_targets == "raw"
        else None
    )
    if config.conditional and not config.num_classes:
        # Resolve the class count once and persist it in the config (the
        # checkpoint embeds it, so generate/evaluate rebuild the same
        # architecture). Registry-declared counts win; by-folder datasets
        # (n_class == -1) derive it from the fetched labels — identical on
        # every host, since all hosts fetch the same corpus.
        if n_class and n_class > 0:
            config.num_classes = int(n_class)
        else:
            label_arrays = [
                np.asarray(ds.labels)
                for ds in (dataset_train, dataset_val, dataset_test)
                if getattr(ds, "labels", None) is not None and len(ds.labels)
            ]
            if not label_arrays:
                raise ValueError(
                    f"--conditional needs labels, but dataset '{config.dataset_name}' "
                    "exposes none (streaming corpus without a label table?)"
                )
            config.num_classes = int(max(int(a.max()) for a in label_arrays)) + 1
        print(f"Conditional VAE over {config.num_classes} classes")
    # VQ-VAE ↔ VQ objective pairing: the discrete families train only under
    # their reconstruction+commitment loss (losses/vq.py) and vice versa.
    from midi_vae_tpu.models.registry import VQ_ARCHS

    if config.arch.lower() in VQ_ARCHS:
        if config.loss_type == "elbo":
            config.loss_type = "vq"
            print(f"--model {config.arch}: selecting the VQ objective (loss_type=vq)")
        elif config.loss_type != "vq":
            raise ValueError(f"--model {config.arch} trains with loss_type=vq, not {config.loss_type!r}")
    elif config.loss_type == "vq":
        raise ValueError("loss_type=vq requires a VQ architecture (--model VQVAE|FoldedVQVAE)")
    print(f"loading model '{config.arch}' for '{config.dataset_name}' dataset @ {config.image_size}px")
    model = build_model(
        config.arch,
        in_channels=img_channels,
        latent_dim=config.n_features,
        input_dim=config.image_size,
        hidden_dims=config.hidden_dims,
        dtype=dtype,
        fused_reparam=config.fused,
        stem=config.stem,
        head=config.head,
        fold=config.fold,
        verbose=config.verbose,
        remat=config.remat,
        torch_compat=config.torch_compat,
        output_logit_bias=output_bias,
        norm=config.norm,
        num_classes=config.num_classes if config.conditional else 0,
        codebook_size=config.codebook_size,
        vq_decay=config.vq_decay,
        # Under the explicit shard_map step the VQ quantizer psums its
        # per-shard cluster statistics over the mesh axes BEFORE the EMA
        # update (models/vq.py), so the codebook matches the auto path
        # exactly — unlike BN running stats, the codebook is the model's
        # discrete vocabulary and must not drift per shard. The axis names
        # are only referenced under train=True inside the shard_map body.
        bn_axis_name=(
            tuple(mesh.axis_names)
            if (config.step_impl == "shard_map" and config.arch.lower() in VQ_ARCHS)
            else None
        ),
    )

    seed = config.seed if config.seed is not None else int(time.time()) % 100000
    if config.seed is None and jax.process_count() > 1:
        # the loaders' shared-order contract requires one seed on every host;
        # a wall-clock seed drawn per process would silently shuffle each
        # host differently (duplicated/missing samples in "global" batches)
        from jax.experimental import multihost_utils

        seed = int(multihost_utils.broadcast_one_to_all(jnp.int32(seed)))
    loader_train = make_loader(
        dataset_train, global_batch_size, train=True, seed=seed, sharding=x_sharding,
        prefetch=config.prefetch, placement=config.data_placement,
    )
    loader_val = make_loader(
        dataset_val, global_batch_size, train=False, sharding=x_sharding,
        prefetch=config.prefetch, placement=config.data_placement,
    )
    # when val IS test (no distinct split) one loader serves both roles —
    # two loaders over the same dataset would upload the same device-resident
    # corpus to HBM twice and double its residency against the data budget
    loader_test = loader_val if not distinct_val_test else make_loader(
        dataset_test, global_batch_size, train=False, sharding=x_sharding,
        prefetch=config.prefetch, placement=config.data_placement,
    )

    # OPTIMIZATION (train.py:193-244) =========================================
    lr = scale_lr(config.lr_relative, global_batch_size)
    total_steps = config.epochs * len(loader_train)
    bundle = build_optimizer(
        None,  # labels resolved lazily below once params exist
        param_group_label,
        optimizer=config.optimizer,
        lr=lr,
        lr_encoder_mult=config.lr_encoder_mult,
        lr_decoder_mult=config.lr_decoder_mult,
        weight_decay=config.weight_decay,
        scheduler=config.scheduler,
        total_steps=total_steps,
        freeze_encoder=config.freeze_encoder,
        grad_clip=config.grad_clip or None,
    )
    kl_sched = kl_weight_schedule(
        config.kl_schedule,
        config.kld_weight,
        warmup_steps=config.kl_warmup_steps,
        period=config.kl_cycle_steps,
        ramp_fraction=config.kl_ramp_fraction,
        growth=config.kl_growth,
        cap=config.kl_cap,
    )

    # STATE ===================================================================
    init_key = root_key(seed)
    sample_batch = jnp.zeros((2, config.image_size, config.image_size, img_channels), jnp.float32)
    state = create_train_state(model, bundle.tx, init_key, sample_batch, ema=config.ema_decay is not None)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
    print(f"Model has {n_params:,} parameters")

    # WARM START (--pretrained): parameters from an existing checkpoint,
    # optimizer state and counters fresh. Resuming (checkpoint_payload)
    # takes precedence — the resumed state already contains the weights.
    if config.pretrained and checkpoint_payload is None:
        from flax import serialization

        from midi_vae_tpu.io.checkpoint import load_checkpoint as _load_ckpt

        if config.pretrained.endswith(".pt"):
            raise ValueError(
                "--pretrained expects a midi_vae_tpu checkpoint; for PyTorch reference "
                "checkpoints use examples/migrate_from_torch.py (torch_compat import)"
            )
        pre = _load_ckpt(config.pretrained)
        pre_state = pre["state"]
        params_src = pre_state.get("ema_params") or pre_state["params"]
        new_params = serialization.from_state_dict(state.params, params_src)
        state = state.replace(
            params=new_params,
            batch_stats=serialization.from_state_dict(
                state.batch_stats, pre_state.get("batch_stats", {})
            ),
            # EMA tracking (if on) restarts from the warm-started weights.
            # Explicit host-side copies: the train step donates the state, so
            # params and ema_params must never share buffers (create_train_state
            # documents the invariant; don't rely on from_state_dict returning
            # fresh leaves).
            ema_params=jax.tree_util.tree_map(np.copy, new_params)
            if state.ema_params
            else state.ema_params,
        )
        print(
            f"Warm-started parameters from '{config.pretrained}' "
            f"(epoch {pre.get('epoch', '?')}); optimizer state and counters start fresh"
        )

    state = replicate(state, mesh)

    if config.step_impl == "shard_map":
        from midi_vae_tpu.parallel.spmd import make_spmd_train_step

        train_step = make_spmd_train_step(
            model,
            bundle.tx,
            kl_sched,
            mesh,
            log_var_clamp=config.log_var_clamp,
            free_bits=config.free_bits,
            pos_weight=pos_weight,
            target_denorm=target_denorm,
            grad_accum=config.grad_accum,
            ema_decay=config.ema_decay,
            fused_loss=config.fused,
            loss_type=config.loss_type,
            tc_beta=config.tc_beta,
            dataset_size=len(dataset_train),
        )
    else:
        train_step = make_train_step(
            model,
            bundle.tx,
            kl_sched,
            log_var_clamp=config.log_var_clamp,
            free_bits=config.free_bits,
            pos_weight=pos_weight,
            target_denorm=target_denorm,
            fused_loss=config.fused,
            loss_type=config.loss_type,
            tc_beta=config.tc_beta,
            dataset_size=len(dataset_train),
            grad_accum=config.grad_accum,
            ema_decay=config.ema_decay,
        )
    # raw-target runs also get the objective-space BCE metric in every eval
    eval_step = make_eval_step(
        model, target_denorm=target_denorm,
        # occupancy precision/recall/F1 need [0,1] targets whatever the loss
        # mode — the informative reconstruction metrics on sparse rolls
        occupancy_denorm=(tuple(transform_eval.mean), tuple(transform_eval.std)),
    )

    def eval_view(s):
        """Evaluation weights: the EMA shadow params when tracking is on."""
        if config.ema_decay is not None and s.ema_params:
            return s.replace(params=s.ema_params)
        return s

    # LOGGING (train.py:246-307) ==============================================
    if config.run_name is None:
        config.run_name = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    if config.run_id is None:
        config.run_id = generate_id()
    if not config.checkpoint_path and config.models_dir:
        # rrd:/abs/path dataset names would otherwise nest directories
        dataset_component = config.dataset_name.replace("/", "_").replace(":", "_")
        config.model_output_dir = os.path.join(
            config.models_dir, dataset_component, f"{config.run_name}__{config.run_id}"
        )
        latest = CHECKPOINT_LATEST if config.checkpoint_backend == "msgpack" else ORBAX_CHECKPOINT_LATEST
        config.checkpoint_path = os.path.join(config.model_output_dir, latest)
    print(
        "Model will not be saved."
        if not config.checkpoint_path
        else f"Model will be saved to '{config.checkpoint_path}'"
    )

    is_leader = jax.process_index() == 0
    logger = MetricLogger(
        config.model_output_dir,
        use_wandb=config.log_wandb,
        wandb_entity=config.wandb_entity,
        wandb_project=config.wandb_project,
        run_name=f"{config.run_name}__{config.run_id}",
        run_id=config.run_id,
        config=config.to_dict(),
        is_leader=is_leader,
        tags=["prototype" if config.prototyping else "final"],
    )

    # RESUME (train.py:309-329) ==============================================
    total_step = 0
    n_samples_seen = 0
    best_stats = {"best_epoch": 0, "best_metric": float("inf"), "best_metric_name": None}
    collapse_warned = False
    if checkpoint_payload is not None:
        print(f"Loading state from checkpoint (epoch {checkpoint_payload['epoch']})")
        from flax import serialization

        from midi_vae_tpu.train.state import reconcile_ema_state_dict

        st_dict = reconcile_ema_state_dict(checkpoint_payload["state"], state)
        state = serialization.from_state_dict(state, st_dict)
        state = replicate(state, mesh)
        total_step = int(checkpoint_payload["total_step"])
        n_samples_seen = int(checkpoint_payload["n_samples_seen"])
        best_stats["best_epoch"] = int(checkpoint_payload.get("best_epoch", 0))
        best_stats["best_metric"] = float(checkpoint_payload.get("best_metric", float("inf")))
        # checkpoints predating the name field tracked the parity metric
        best_stats["best_metric_name"] = checkpoint_payload.get("best_metric_name") or "cross-entropy"

    # TRAIN (train.py:331-501) ===============================================
    results: dict = {}
    last_epoch = config.epochs
    if config.stop_after_epochs is not None:
        last_epoch = min(last_epoch, start_epoch + config.stop_after_epochs - 1)
    if config.early_stop_patience is not None and config.early_stop_patience < 1:
        raise ValueError(f"early_stop_patience must be >= 1, got {config.early_stop_patience}")
    # Every handed-off checkpoint lands on disk even if an exception
    # unwinds out of the epoch loop: the msgpack writer thread is
    # non-daemon (interpreter shutdown joins the in-flight write;
    # tmp+rename keeps the latest file atomic even under SIGTERM
    # mid-write), and the orbax variant — whose .staging→path promotion
    # happens on the main thread — is finalized by the try/finally below.
    # Orbax's own AsyncCheckpointer handles the multi-host barrier
    # internally (io/orbax_io.py:OrbaxAsyncWriter).
    if config.async_checkpoint and config.checkpoint_backend == "orbax":
        from midi_vae_tpu.io.orbax_io import OrbaxAsyncWriter

        async_writer = OrbaxAsyncWriter()
    else:
        async_writer = AsyncCheckpointWriter() if config.async_checkpoint else None
    profiling = False
    try:
        for epoch in range(start_epoch, last_epoch + 1):
            t_start_epoch = time.time()
            # Profiler trace for the leading epochs (SURVEY §5: jax.profiler
            # replaces the reference's torch.cuda.Event phase timing)
            if config.profile_dir and epoch < start_epoch + config.profile_epochs:
                if not profiling:
                    jax.profiler.start_trace(config.profile_dir)
                    profiling = True
            elif profiling:
                jax.profiler.stop_trace()
                profiling = False
                print(f"Wrote profiler trace to {config.profile_dir}")
            # Resume-stable per-epoch randomness (train.py:345-369 semantics).
            # ONE global key on every process: the jitted step treats this
            # unsharded argument as replicated, so it must be identical across
            # hosts (multi-controller SPMD contract). Per-sample decorrelation
            # needs no per-process fold — the reparam noise is drawn over the
            # GLOBAL batch shape from this single key (models/vae.py:276), so
            # every sample already gets an independent stream regardless of
            # which host fed it.
            ekey = derive_epoch_key(seed, epoch)

            n_before = n_samples_seen
            train_stats, state, total_step, n_samples_seen = train_one_epoch(
                config=config,
                model=model,
                state=state,
                train_step=train_step,
                loader=loader_train,
                logger=logger,
                epoch=epoch,
                epoch_key=ekey,
                lr_schedules=bundle.lr_schedules,
                n_samples_seen=n_samples_seen,
            )
            t_end_train = time.time()
            duration_train = t_end_train - t_start_epoch
            n_epoch_samples = n_samples_seen - n_before
            train_stats["throughput"] = n_epoch_samples / max(duration_train, 1e-9)

            print_epoch_summary(
                "Training",
                epoch,
                config.epochs,
                {
                    "total_step": total_step,
                    "steps": len(loader_train),
                    "samples": n_epoch_samples,
                    **train_stats,
                },
                duration_train,
            )

            # Validate (train.py:416-440)
            t_start_val = time.time()
            eval_stats = evaluate(
                loader_val, model, eval_view(state), partition_name=eval_set, seed=seed, eval_step=eval_step
            )
            duration_val = time.time() - t_start_val
            eval_stats["throughput"] = loader_val.num_samples / max(duration_val, 1e-9)
            # VQ models: codebook health from the EMA stats (perplexity /
            # active codes — the discrete analogue of the latent-health
            # metrics). No-op {} for the Gaussian families.
            eval_stats.update(codebook_metrics(state.batch_stats))
            print_epoch_summary("Evaluating", epoch, config.epochs, eval_stats, duration_val)

            # Latent-collapse alarm (operational guard — RESULTS.md "posterior
            # collapse on sparse MIDI"): 0 active units past the first epochs
            # means the run is training a plain autoencoder-to-silence; say so
            # NOW with the fix, not after N wasted epochs. Epochs 1-2 are
            # excluded — under KL warmup the latent can legitimately start
            # inactive. Once per run; eval keeps reporting the number anyway.
            if (
                not collapse_warned
                and eval_stats.get("active-units") == 0
                and epoch >= min(3, last_epoch)
            ):
                collapse_warned = True
                print(
                    "WARNING: 0 active latent units at epoch "
                    f"{epoch} (KL {eval_stats.get('kl', float('nan')):.4f} nat) — posterior collapse. "
                    "On sparse corpora train with --bce-targets raw --output-bias-init auto "
                    "(configs/folded_quality.yaml sets both); pre-flight with "
                    "python -m midi_vae_tpu.data.stats."
                )

            # Track best epoch by validation reconstruction metric — the trained
            # objective when it differs from the parity metric (--bce-targets raw
            # runs report both; selecting on the normalized-target cross-entropy
            # there would rank models on a function the run never optimized)
            select_name = "bce-objective" if "bce-objective" in eval_stats else "cross-entropy"
            if best_stats["best_metric_name"] not in (None, select_name):
                # resumed from a checkpoint tracked on a different metric — the
                # scales are incomparable (parity CE is negative on sparse
                # corpora, the objective is positive), so restart the race
                print(
                    f"best-metric tracking switched from {best_stats['best_metric_name']!r} "
                    f"to {select_name!r}; resetting best-epoch tracking"
                )
                best_stats["best_metric"] = float("inf")
            best_stats["best_metric_name"] = select_name
            if eval_stats[select_name] < best_stats["best_metric"]:
                best_stats["best_metric"] = eval_stats[select_name]
                best_stats["best_epoch"] = epoch

            # Save (train.py:442-464). msgpack writes on the leader only; the
            # orbax save is an ALL-hosts collective (it barriers internally), so
            # every process must enter it — the leader-only parts (meta sidecar,
            # swap, best copy) are gated inside orbax_io / below.
            t_start_save = time.time()
            if config.checkpoint_path and (is_leader or config.checkpoint_backend == "orbax"):
                save_kwargs = dict(
                    config=config.to_dict(),
                    epoch=epoch,
                    total_step=total_step,
                    n_samples_seen=n_samples_seen,
                    encoder_config=encoder_config,
                    transform_args=transform_args,
                    best_epoch=best_stats["best_epoch"],
                    best_metric=best_stats["best_metric"],
                    best_metric_name=best_stats["best_metric_name"],
                    backend=config.checkpoint_backend,
                )
                # orbax consumes the live (possibly sharded) arrays — each process
                # writes only its own shards; msgpack serializes host copies
                host_state = state if config.checkpoint_backend == "orbax" else jax.device_get(state)
                if async_writer is not None:
                    async_writer.save(config.checkpoint_path, host_state, **save_kwargs)
                else:
                    save_checkpoint(config.checkpoint_path, host_state, **save_kwargs)
                if config.save_best_model and best_stats["best_epoch"] == epoch and is_leader:
                    if async_writer is not None:
                        async_writer.wait()  # best copies the completed latest file
                    best_path = copy_best(config.checkpoint_path)
                    print(f"Copied best model to {best_path}")
            duration_save = time.time() - t_start_save

            # Epochwise logging (train.py:469-496)
            pre = "training/epochwise"
            logger.log(
                {
                    "training/stepwise/epoch": epoch,
                    "training/stepwise/n_samples_seen": n_samples_seen,
                    f"{pre}/epoch": epoch,
                    **{f"{pre}/train/{k}": v for k, v in train_stats.items()},
                    **{f"{pre}/{eval_set}/{k}": v for k, v in eval_stats.items() if k != "latents"},
                    f"{pre}/duration/train": duration_train,
                    f"{pre}/duration/val": duration_val,
                    f"{pre}/duration/saving": duration_save,
                    f"{pre}/duration/overall": time.time() - t_start_epoch,
                },
                step=total_step,
            )
            results["train"] = train_stats
            results[eval_set.lower()] = eval_stats

            # Early stopping (capability extension): the patience window is
            # anchored on the checkpointed best_epoch, so it keeps counting
            # correctly across preemption resumes. Placed after save/logging —
            # the stopping epoch is fully recorded before the loop exits.
            if (
                config.early_stop_patience is not None
                and epoch - best_stats["best_epoch"] >= config.early_stop_patience
            ):
                print(
                    f"Early stopping after epoch {epoch}: no {best_stats['best_metric_name']} "
                    f"improvement in {config.early_stop_patience} epochs "
                    f"(best epoch {best_stats['best_epoch']})"
                )
                last_epoch = epoch  # completion messages must not claim unran epochs
                break

    finally:
        # An exception unwinding out of the epoch loop (OOM, data error,
        # KeyboardInterrupt) must still finalize the in-flight async save:
        # the orbax variant otherwise strands a fully-committed checkpoint
        # in .staging, which _resolve() never loads and the next run's
        # save() deletes. When already unwinding, a finalizer failure is
        # reported but must not mask the primary error.
        unwinding = sys.exc_info()[0] is not None
        try:
            if profiling:
                jax.profiler.stop_trace()
                print(f"Wrote profiler trace to {config.profile_dir}")
            if async_writer is not None:
                async_writer.wait()  # the final checkpoint must be on disk before eval/return
                if hasattr(async_writer, "close"):
                    async_writer.close()
        except Exception:
            if not unwinding:
                raise
            traceback.print_exc()

    if start_epoch > config.epochs:
        print("Training already completed!")
    else:
        # last_epoch, not config.epochs: a --stop-after-epochs run must not
        # claim epochs it never ran
        print(f"Training complete! (Trained epochs {start_epoch} to {last_epoch})")

    # FINAL EVALUATION (train.py:503-551) ====================================
    print(f"\nEvaluating final model (epoch {last_epoch}) performance")
    print("\nEvaluating final model on test set...")
    test_stats = evaluate(loader_test, model, eval_view(state), partition_name="Test", seed=seed, eval_step=eval_step)
    test_stats.update(codebook_metrics(state.batch_stats))  # VQ models; {} otherwise
    if config.final_iwae and getattr(model, "latent_kind", "gaussian") == "vq":
        print("Skipping --final-iwae: the IWAE bound assumes a Gaussian posterior "
              "(VQ-VAE reports reconstruction metrics + codebook perplexity instead)")
    elif config.final_iwae:
        # works under multi-controller SPMD too: iwae_bound reduces the
        # masked per-sample bounds ON DEVICE to replicated scalars, so no
        # host ever needs the sharded per-batch values (round-4 fix)
        from midi_vae_tpu.evaluation.iwae import iwae_bound

        # held-out density estimate (nats/sample); computed against the
        # de-normalized [0,1] pixels so the Bernoulli likelihood is
        # well-defined whatever --bce-targets mode trained the run
        test_stats[f"iwae-{config.final_iwae}"] = iwae_bound(
            loader_test, model, eval_view(state), k=config.final_iwae, seed=seed,
            target_denorm=(tuple(transform_eval.mean), tuple(transform_eval.std)),
        )
        print(f"  {f'iwae-{config.final_iwae} ':.<24s} {test_stats[f'iwae-{config.final_iwae}']:9.5f} nat/sample")
    if config.final_mig and jax.process_count() > 1:
        # same fully-addressable-array constraint as --final-iwae above
        print("Skipping --final-mig under multi-process SPMD; "
              "run cli.evaluate --mig on the checkpoint instead")
    elif config.final_mig:
        from midi_vae_tpu.evaluation.disentanglement import mig_from_loader

        # disentanglement of the test posterior means against the dataset
        # labels (works for VQ models too: mu is the pre-quantized z_e)
        mig = mig_from_loader(loader_test, model, eval_view(state), bins=config.final_mig)
        test_stats["mig"] = mig["mig"]
        print(f"  {'mig ':.<24s} {mig['mig']:9.5f}")
    logger.log({f"eval/test/{k}": v for k, v in test_stats.items() if k != "latents"}, step=total_step)
    results["final_test"] = test_stats

    if distinct_val_test:
        print(f"\nEvaluating final model on {eval_set} set...")
        val_stats = evaluate(loader_val, model, eval_view(state), partition_name=eval_set, seed=seed, eval_step=eval_step)
        logger.log({f"eval/val/{k}": v for k, v in val_stats.items() if k != "latents"}, step=total_step)
        results["final_val"] = val_stats

    # Train partition under eval conditions (train.py:533-548)
    print("\nEvaluating final model on train set under test conditions (no augmentation)...")
    # The train loader is done; release its on-device corpus first so the
    # re-transformed copy below fits the same HBM data budget instead of
    # doubling the train split's residency.
    if hasattr(loader_train, "release"):
        loader_train.release()
    dataset_train_eval = fetch_dataset(
        **dataset_args, transform_train=transform_eval, transform_eval=transform_eval
    )[0]
    loader_train_eval = make_loader(
        dataset_train_eval, global_batch_size, train=False, sharding=x_sharding,
        prefetch=config.prefetch, placement=config.data_placement,
    )
    train_eval_stats = evaluate(
        loader_train_eval, model, eval_view(state), partition_name="Train", seed=seed, eval_step=eval_step
    )
    logger.log({f"eval/train/{k}": v for k, v in train_eval_stats.items() if k != "latents"}, step=total_step)
    results["final_train"] = train_eval_stats

    results["state"] = state
    results["total_step"] = total_step
    results["n_samples_seen"] = n_samples_seen
    results["best_epoch"] = best_stats["best_epoch"]
    results["duration_total"] = time.time() - t_run_start
    # free loader resources: NativeDeviceLoader owns C++ threads + an mmap,
    # DeviceResidentLoader pins corpus HBM — a long-lived process driving
    # several run() calls (sweeps, tests) must not accumulate them
    for ldr in (loader_train, loader_val, loader_test, loader_train_eval):
        if hasattr(ldr, "close"):
            ldr.close()
        elif hasattr(ldr, "release"):
            ldr.release()
    logger.close()
    return results


def train_one_epoch(
    *,
    config: TrainConfig,
    model,
    state,
    train_step,
    loader: DeviceLoader,
    logger: MetricLogger,
    epoch: int,
    epoch_key,
    lr_schedules,
    n_samples_seen: int = 0,
    n_epoch: Optional[int] = None,
):
    """Train one epoch (reference: train.py:554-767).

    Returns (stats, state, total_step, n_samples_seen). Loss components
    stay on device between log points; the only host syncs happen at
    print/log intervals and the end-of-epoch mean.
    """
    n_epoch = n_epoch if n_epoch is not None else config.epochs
    print_interval = config.print_interval if config.print_interval is not None else config.log_interval
    num_batches = len(loader)
    world_batch = loader.batch_size

    # Scan-chunked epochs: N steps per compiled dispatch over the
    # device-resident corpus (see DeviceResidentLoader.epoch_scan).
    scan_steps = getattr(config, "scan_steps", 1) or 1
    if scan_steps > 1:
        raw_step = getattr(train_step, "raw_step_fn", None)
        if raw_step is None:
            raise ValueError("--scan-steps needs the auto train step (drop --step-impl shard_map)")
        if not hasattr(loader, "epoch_scan"):
            print(
                "--scan-steps: corpus is not device-resident (too large, multi-host, or "
                "--data-placement host); falling back to per-batch dispatch"
            )
        else:
            if config.log_images and epoch == 1:
                print(
                    "--scan-steps: reconstruction grids are skipped in scan mode "
                    "(no per-batch host tensors); use the generate CLI for grids"
                )
            return _train_one_epoch_scan(
                config=config,
                state=state,
                train_step=train_step,
                loader=loader,
                logger=logger,
                epoch=epoch,
                lr_schedules=lr_schedules,
                n_samples_seen=n_samples_seen,
                n_epoch=n_epoch,
                print_interval=print_interval,
                chunk=scan_steps,
            )

    loss_sum = jnp.float32(0.0)  # device accumulator — no per-step sync
    last_lo = None
    t_epoch_start = time.time()
    t_last_log = t_epoch_start
    steps_since_log = 0

    # Stepwise phase split (reference: train.py:749-756). One XLA program
    # fuses forward/backward/optimizer, so the *measurable* host phases are:
    # dataloader = blocked on host batch assembly / the prefetch queue,
    # device_step = blocked on device-dependent work (dispatch + the metric
    # sync at log points), logging = metric formatting/emission.
    timer = PhaseTimer()
    batches = iter(loader.epoch(epoch))
    batch_idx = -1
    while True:
        timer.mark("dataloader")
        batch = next(batches, None)
        if batch is None:
            break
        batch_idx += 1
        timer.mark("device_step")
        with jax.profiler.StepTraceAnnotation("train_step", step_num=batch_idx):
            if getattr(train_step, "conditional", False):
                state, lo, grad_norm = train_step(state, batch.x, batch.y, epoch_key)
            else:
                state, lo, grad_norm = train_step(state, batch.x, epoch_key)
        loss_sum = loss_sum + lo.loss
        last_lo = lo
        n_samples_seen += world_batch
        steps_since_log += 1

        is_print = batch_idx <= 2 or batch_idx % print_interval == 0 or batch_idx >= num_batches - 1
        is_log = batch_idx % config.log_interval == 0

        if epoch <= 1 and batch_idx == 0:
            print("stimuli.shape =", tuple(batch.x.shape))
            print("loss.shape    =", tuple(lo.loss.shape) or "scalar")
            print("loss =", float(lo.loss))

        if is_print or is_log:
            # Host sync point (the reference syncs every step, train.py:672-675)
            step_now = int(state.step)
            loss_f = float(lo.loss)
            kld_f = float(lo.kld_loss)
            w_f = float(lo.kld_weight)
            lr_now = {
                name: float(s(jnp.int32(step_now - 1))) for name, s in lr_schedules.items()
            }
            timer.mark("logging")  # device wait above counts as device_step
            if is_print:
                lr_print = next(iter(lr_now.values())) if lr_now else 0.0
                print(
                    f"Train Epoch:{epoch:4d}/{n_epoch}"
                    f"  Step:{batch_idx + 1:4d}/{num_batches}"
                    f"  Loss:[F: {loss_f:6.3f}, KL: {kld_f:6.3f}]"
                    f"  LR: {lr_print:.5f}"
                    f"  KL Weight: {w_f:.5f}"
                )
            if is_log:
                t_now = time.time()
                throughput = steps_since_log * world_batch / max(t_now - t_last_log, 1e-9)
                t_last_log, steps_since_log = t_now, 0
                log_dict = {
                    "training/stepwise/epoch": epoch,
                    "training/stepwise/epoch_progress": epoch - 1 + (batch_idx + 1) / num_batches,
                    "training/stepwise/n_samples_seen": n_samples_seen,
                    "training/stepwise/train/throughput": throughput,
                    "training/stepwise/train/loss": loss_f,
                    "training/stepwise/train/loss_recon": float(lo.reconstruction_loss),
                    "training/stepwise/train/loss_kld": kld_f,
                    "training/stepwise/train/kld_weight": w_f,
                    "training/stepwise/train/grad_norm": float(grad_norm),
                }
                for name, v in lr_now.items():
                    log_dict[f"training/stepwise/lr-{name}"] = v
                for phase, secs in timer.durations().items():
                    log_dict[f"training/stepwise/duration/{phase}"] = secs
                timer.reset()
                logger.log(log_dict, step=step_now)
            timer.mark("device_step")  # tail of the log block until the next fetch

        # Reconstruction image grids for the first batches (train.py:687-701);
        # without wandb the grid lands as a PNG next to the checkpoint
        if config.log_images and batch_idx <= 1 and (logger.wandb_run is not None or logger.output_dir):
            _log_reconstruction_grid(
                logger, model, state, batch.x, int(state.step),
                spec=getattr(loader.dataset, "transform", None), y=batch.y,
            )

    total_step = int(state.step)
    del last_lo
    stats = {"loss": float(loss_sum) / num_batches}
    return stats, state, total_step, n_samples_seen


def _train_one_epoch_scan(
    *,
    config,
    state,
    train_step,
    loader,
    logger,
    epoch,
    lr_schedules,
    n_samples_seen,
    n_epoch,
    print_interval,
    chunk,
):
    """Scan-chunked variant of ``train_one_epoch``: the loader runs
    ``chunk`` train steps per compiled dispatch and hands back a
    [n_steps, 5] metric array per chunk (loss, recon, kld, kld_weight,
    grad_norm). Logging keeps per-step fidelity for the loss metrics —
    the same print/log intervals fire from the materialized arrays after
    each chunk lands; throughput is necessarily per-chunk (host wall
    time inside a chunk carries no information).
    """
    num_batches = len(loader)
    world_batch = loader.batch_size
    step0 = int(state.step)  # one sync at epoch start anchors LR logging
    loss_sum = 0.0
    t_epoch_start = time.time()
    t_chunk_start = t_epoch_start
    timer = PhaseTimer()

    batch_idx = -1
    timer.mark("device_step")
    for state, ys in loader.epoch_scan(state, train_step, epoch, chunk=chunk):
        m = np.asarray(ys)  # host sync point: the chunk's per-step metrics
        timer.mark("logging")
        # All log points inside one chunk fire microseconds apart on the
        # host, so per-row wall-time deltas are meaningless — the honest
        # rate is the whole chunk's samples over the whole chunk's wall
        # time (device work + the previous chunk's logging overhead).
        t_now = time.time()
        throughput = len(m) * world_batch / max(t_now - t_chunk_start, 1e-9)
        t_chunk_start = t_now
        for row in m:
            batch_idx += 1
            loss_f, recon_f, kld_f, w_f, gn_f = (float(v) for v in row)
            loss_sum += loss_f
            n_samples_seen += world_batch
            step_now = step0 + batch_idx + 1

            if epoch <= 1 and batch_idx == 0:
                print(f"scan-chunked training: {chunk} steps/dispatch")
                print("loss =", loss_f)
            is_print = batch_idx <= 2 or batch_idx % print_interval == 0 or batch_idx >= num_batches - 1
            if is_print:
                lr_now = {name: float(s(jnp.int32(step_now - 1))) for name, s in lr_schedules.items()}
                lr_print = next(iter(lr_now.values())) if lr_now else 0.0
                print(
                    f"Train Epoch:{epoch:4d}/{n_epoch}"
                    f"  Step:{batch_idx + 1:4d}/{num_batches}"
                    f"  Loss:[F: {loss_f:6.3f}, KL: {kld_f:6.3f}]"
                    f"  LR: {lr_print:.5f}"
                    f"  KL Weight: {w_f:.5f}"
                )
            if batch_idx % config.log_interval == 0:
                lr_now = {name: float(s(jnp.int32(step_now - 1))) for name, s in lr_schedules.items()}
                log_dict = {
                    "training/stepwise/epoch": epoch,
                    "training/stepwise/epoch_progress": epoch - 1 + (batch_idx + 1) / num_batches,
                    "training/stepwise/n_samples_seen": n_samples_seen,
                    "training/stepwise/train/throughput": throughput,
                    "training/stepwise/train/loss": loss_f,
                    "training/stepwise/train/loss_recon": recon_f,
                    "training/stepwise/train/loss_kld": kld_f,
                    "training/stepwise/train/kld_weight": w_f,
                    "training/stepwise/train/grad_norm": gn_f,
                }
                for name, v in lr_now.items():
                    log_dict[f"training/stepwise/lr-{name}"] = v
                for phase, secs in timer.durations().items():
                    log_dict[f"training/stepwise/duration/{phase}"] = secs
                timer.reset()
                logger.log(log_dict, step=step_now)
        timer.mark("device_step")

    total_step = int(state.step)
    stats = {"loss": loss_sum / num_batches}
    return stats, state, total_step, n_samples_seen


def _log_reconstruction_grid(logger, model, state, x, step, spec=None, y=None):
    from midi_vae_tpu.data.transforms import denormalize
    from midi_vae_tpu.evaluation.inference import reconstruct, reconstruction_grid

    y8 = y[:8] if y is not None and getattr(model, "num_classes", 0) > 0 else None
    recon = reconstruct(model, state.params, state.batch_stats, x[:8], jax.random.PRNGKey(0), y=y8)
    # inputs are normalized (e.g. -0.5..0.5 under the default table) while
    # reconstructions are sigmoid outputs in 0..1 — denormalize the inputs
    # so both halves of the grid share the display range (the generate CLI
    # already does this, cli/generate.py:142-146)
    inputs = denormalize(spec, x[:8]) if spec is not None else x[:8]
    grid = np.asarray(reconstruction_grid(inputs, recon, pairs=8))
    if logger.wandb_run is not None:
        import wandb

        logger.wandb_run.log({"training/stepwise/train/reconstruction": wandb.Image(grid)}, step=step)
    elif logger.output_dir:
        from PIL import Image

        arr = np.clip(grid, 0.0, 1.0)
        arr = (arr[..., 0] if arr.shape[-1] == 1 else arr) * 255
        Image.fromarray(arr.astype(np.uint8)).save(
            os.path.join(logger.output_dir, f"reconstruction_step{step:06d}.png")
        )
