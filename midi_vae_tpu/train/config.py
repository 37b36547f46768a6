"""Run configuration — one coherent config object (SURVEY §5 "config system").

Field names and defaults mirror the reference CLI (train.py:770-1063)
so checkpoints and launch scripts carry over; the dead YAML's
hyperparameters (configs/vae.yaml) load through the same object via
:func:`from_yaml`. Everything here is JSON-serializable so the config
embeds in checkpoints (C10) and backfills on resume.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple


@dataclasses.dataclass
class TrainConfig:
    # Dataset (train.py:801-852)
    dataset_name: str = "mnist"
    protoval_split_id: Optional[int] = None
    prototyping: bool = False
    data_dir: Optional[str] = None
    allow_download_dataset: bool = False
    transform_type: str = "digits"
    image_size: Optional[int] = None  # None → 32, matching the reference hardcode (train.py:105)
    # Fraction of train carved into the prototyping val fold, or "auto" to
    # size it like the test set (reference datasets.py:256-264).
    protoval_split_rate: Any = 0.1

    # Architecture (train.py:854-879)
    arch: str = "VanillaVAE"
    stem: str = "conv"  # conv (reference parity) | s2d (space-to-depth MXU stem)
    head: str = "deconv"  # deconv (reference parity) | d2s (depth-to-space head)
    fold: int = 4  # FoldedVAE input fold factor (power of two)
    norm: str = "batch"  # batch (reference parity) | group | none (models/vae.py _apply_norm)
    remat: bool = False  # recompute conv-stack activations in backward (larger batches)
    # Reference's exact padding arithmetic + flatten order: forward is
    # bit-compatible with the torch reference, enabling weight import
    # (interop/torch_import.py) and export (interop/torch_export.py)
    torch_compat: bool = False
    # Warm-start model parameters from an existing checkpoint; optimizer
    # state and counters start fresh (fine-tuning). Distinct from
    # checkpoint_path, which RESUMES a run. The reference parses
    # --pretrained but never uses it (train.py:854-879) — here it works.
    pretrained: Optional[str] = None
    freeze_encoder: bool = False
    n_features: int = 10  # latent dim
    hidden_dims: Tuple[int, ...] = (32, 64, 128, 256)
    # Conditional VAE (--conditional): q(z|x,y), p(x|z,y) over the dataset's
    # class labels (models/vae.py num_classes). num_classes is resolved at
    # run time — from the dataset registry when it declares a count, else
    # from the fetched labels — and stored in the checkpoint config so the
    # generate/evaluate/serve CLIs rebuild the same architecture.
    conditional: bool = False
    num_classes: int = 0  # resolved; 0 = unconditional

    # Loss (made real from models.py:16 / configs/vae.yaml:20 / models.py:218-219)
    kld_weight: float = 1.0
    kl_schedule: str = "constant"  # constant | multiplicative | linear | cyclical
    kl_warmup_steps: int = 1000
    kl_cycle_steps: int = 1000  # cyclical: full period in steps
    kl_ramp_fraction: float = 0.5  # cyclical: fraction of the period spent ramping
    kl_growth: float = 1.005  # multiplicative: per-step growth (models.py:218-219)
    kl_cap: float = 1.0  # multiplicative: ceiling
    loss_type: str = "elbo"  # elbo | beta-tc (losses/tcvae.py) | vq (losses/vq.py)
    tc_beta: float = 6.0  # TC penalty for loss_type=beta-tc
    # VQ-VAE bottleneck (--model VQVAE, models/vq.py): codebook entries and
    # the EMA decay of the codebook statistics. kld_weight doubles as the
    # commitment β for loss_type=vq (paper default 0.25).
    codebook_size: int = 512
    vq_decay: float = 0.99
    log_var_clamp: Optional[Tuple[float, float]] = None
    # Per-dimension KL floor in nats (free bits, Kingma et al. 2016) —
    # the anti-posterior-collapse tool for sparse corpora (RESULTS.md
    # "posterior collapse on sparse MIDI"). None = plain ELBO.
    free_bits: Optional[float] = None
    # Positive-class weight on the BCE term (torch BCEWithLogitsLoss
    # pos_weight convention): a float, or "auto" = (1-p)/p from the train
    # corpus fill rate p (data/stats.py). The reconstruction-side
    # anti-collapse rebalancer for sparse piano-rolls. None = reference
    # parity (unweighted, models.py:208).
    bce_pos_weight: Any = None
    # Decoder output-logit bias init: a float, or "auto" = log(p/(1-p))
    # from the train corpus fill rate — the decoder starts at the corpus
    # base rate instead of the all-0.5 cliff. None = zeros (parity).
    output_bias_init: Any = None
    # BCE target space: "normalized" = reference parity (BCE against the
    # normalized input, models.py:208 — targets in [-0.5, 0.5] under the
    # default table); "raw" = de-normalize targets to [0, 1] inside the
    # loss, the space where pos-weight/base-rate math is exact.
    bce_targets: str = "normalized"
    fused: bool = False  # Pallas fused reparam + BCE kernels on the hot path

    # Optimization (train.py:881-932)
    epochs: int = 5
    stop_after_epochs: Optional[int] = None  # train at most N epochs this invocation (preemption simulation / time-budgeted jobs)
    # Stop when the best-model validation metric hasn't improved for N
    # consecutive epochs (the metric best-model selection uses). None = off.
    early_stop_patience: Optional[int] = None
    # Report the K-sample IWAE log-likelihood bound on the final test
    # sweep (evaluation/iwae.py). None = off.
    final_iwae: Optional[int] = None
    # Report the MIG disentanglement score of the test-partition posterior
    # means against the dataset labels on the final sweep, discretized
    # into this many bins (evaluation/disentanglement.py). None = off.
    final_mig: Optional[int] = None
    lr_relative: float = 0.01
    lr_encoder_mult: float = 1.0
    lr_decoder_mult: float = 1.0
    weight_decay: float = 0.0
    optimizer: str = "AdamW"
    scheduler: str = "OneCycle"
    # Split each batch into N sequential microbatches inside the compiled
    # step (one optimizer update per batch) — peak-memory knob, see
    # train/state.py:make_train_step.
    grad_accum: int = 1
    # Clip the global gradient norm to this value before the optimizer
    # update (torch clip_grad_norm_ semantics; frozen groups excluded
    # from the norm). 0.0 = off. Capability extension over the reference.
    grad_clip: float = 0.0
    # Track an EMA of the parameters; evaluation/checkpoint-best use the
    # averaged weights when set (e.g. 0.999). None = off.
    ema_decay: Optional[float] = None

    # Checkpointing (train.py:934-957)
    models_dir: Optional[str] = "models"
    async_checkpoint: bool = False  # background-thread saves (io/checkpoint.py)
    checkpoint_backend: str = "msgpack"  # msgpack | orbax (io/orbax_io.py)
    checkpoint_path: str = ""
    save_best_model: bool = False

    # Reproducibility (train.py:959-969)
    seed: Optional[int] = None
    deterministic: bool = False
    debug_nans: bool = False
    verbose: bool = False  # model-internal forward range tracing (models.py:126-173)
    # Profiling (SURVEY §5: jax.profiler.trace + StepTraceAnnotation replace
    # the reference's manual torch.cuda.Event timing, train.py:632-655)
    profile_dir: Optional[str] = None
    profile_epochs: int = 1  # trace this many leading epochs
    # Persistent XLA compilation cache (core/compile_cache.py): preemption
    # resumes re-jit the train step from disk instead of recompiling
    compilation_cache: Optional[str] = None

    # Hardware (train.py:971-1007)
    batch_size_per_device: int = 128
    prefetch: int = 2  # batches kept in flight host→device (raise on high-latency links)
    # Corpus placement: "auto" uploads corpora that fit the HBM data budget
    # to device ONCE (shuffled gather + transform run inside jit — no
    # per-batch host→device copy); "host" keeps the streaming loaders;
    # "device" forces residency (data/pipeline.py:DeviceResidentLoader).
    data_placement: str = "auto"
    # Train N steps per compiled dispatch (lax.scan over the device-resident
    # corpus — zero host involvement inside a chunk, per-step metrics still
    # logged). 1 = per-batch dispatch. Needs device placement + the auto
    # step; the big win on high-dispatch-latency links.
    scan_steps: int = 1
    num_devices: Optional[int] = None  # None → all visible devices
    # Hierarchical multi-slice DP: shard batches over a 2-D (slice, data)
    # mesh so gradient reduction rides ICI within a slice and only
    # per-slice partials cross DCN (parallel/mesh.py:make_mesh_multislice).
    mesh_slices: Optional[int] = None  # None → flat 1-D data mesh
    dtype: str = "float32"  # compute dtype: float32 | bfloat16
    # Train-step partitioning: "auto" = jit auto-partitioning (global-batch
    # BN), "shard_map" = explicit SPMD collectives (per-shard BN, pinned
    # communication schedule — parallel/spmd.py).
    step_impl: str = "auto"

    # Logging (train.py:1009-1061)
    log_interval: int = 10
    print_interval: Optional[int] = None
    log_wandb: bool = False
    wandb_entity: Optional[str] = None
    wandb_project: str = "midi_vae_tpu"
    run_name: Optional[str] = None
    run_id: Optional[str] = None
    log_images: bool = True

    # Derived at runtime (not CLI surface)
    model_output_dir: Optional[str] = None

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["hidden_dims"] = list(self.hidden_dims)
        if self.log_var_clamp is not None:
            d["log_var_clamp"] = list(self.log_var_clamp)
        return d

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TrainConfig":
        field_names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in field_names}
        if "hidden_dims" in kwargs and kwargs["hidden_dims"] is not None:
            kwargs["hidden_dims"] = tuple(kwargs["hidden_dims"])
        if kwargs.get("log_var_clamp") is not None:
            kwargs["log_var_clamp"] = tuple(kwargs["log_var_clamp"])
        return cls(**kwargs)


def from_yaml(path: str) -> TrainConfig:
    """Load a config from YAML — makes the reference's dead ``configs/vae.yaml``
    format real (C14). Supports both this package's flat schema and the
    reference's Lightning-style nested schema (model_params/exp_params/...)."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    if any(k in raw for k in ("model_params", "exp_params", "data_params", "trainer_params")):
        # Reference vae.yaml schema (configs/vae.yaml:1-34)
        model = raw.get("model_params", {})
        data = raw.get("data_params", {})
        exp = raw.get("exp_params", {})
        trainer = raw.get("trainer_params", {})
        flat: Dict[str, Any] = {}
        if "latent_dim" in model:
            flat["n_features"] = model["latent_dim"]
        if "hidden_dims" in model:
            flat["hidden_dims"] = model["hidden_dims"]
        if "data_path" in data:
            flat["data_dir"] = data["data_path"]
        if "train_batch_size" in data:
            flat["batch_size_per_device"] = data["train_batch_size"]
        if "LR" in exp:
            # the YAML's LR is absolute; convert to the relative-to-128 CLI convention
            bs = data.get("train_batch_size", 128)
            flat["lr_relative"] = exp["LR"] * 128 / bs
        if "weight_decay" in exp:
            flat["weight_decay"] = exp["weight_decay"]
        if "kld_weight" in exp:
            flat["kld_weight"] = exp["kld_weight"]
        if "manual_seed" in exp:
            flat["seed"] = exp["manual_seed"]
        if "max_epochs" in trainer:
            flat["epochs"] = trainer["max_epochs"]
        return TrainConfig.from_dict(flat)

    return TrainConfig.from_dict(raw)
