"""Flagship benchmark: training samples/sec/chip on 128px MIDI piano-rolls.

The north-star metric (BASELINE.json): conv VAE train step — forward +
ELBO + backward + AdamW update, one fused XLA program — fed by the
fully on-device synthetic piano-roll generator (zero host↔device
traffic in steady state). Runs on whatever backend JAX selects (the
real TPU chip under the driver). Prints ONE JSON line.

``vs_baseline`` compares against the PyTorch-CPU reference throughput
recorded in BASELINE_MEASURED.json (measured by
benchmarks/torch_cpu_baseline.py: same architecture, same image size,
in-memory data, CPU).

The measurement core is importable (``setup``/``measure_train``/
``measure_sampling``) so ``benchmarks/measure.py`` can sweep the full
config matrix in one process and regenerate RESULTS.md from the same
code path — published and driver-captured numbers cannot drift.
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# testing escape hatch: the platform sitecustomize forces the axon TPU
# backend, so a plain JAX_PLATFORMS=cpu env var is ignored — this one isn't
if os.environ.get("MIDI_VAE_BENCH_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

IMAGE_SIZE = 128
# throughput is flat in batch size (compute-bound chip; see RESULTS.md);
# 2048 is the largest batch fitting the 16G HBM at f32 (3072+ OOMs)
BATCH = int(os.environ.get("MIDI_VAE_BENCH_BATCH", "2048"))
WARMUP_STEPS = 20
# ~24k samples/sec verified ⇒ a 2048 batch step ≈ 85 ms; 300 steps ≈ 26 s
# of steady state — long enough to average jitter, short enough for the driver
MEASURE_STEPS = int(os.environ.get("MIDI_VAE_BENCH_STEPS", "300"))
FUSED = os.environ.get("MIDI_VAE_BENCH_FUSED", "0") == "1"  # Pallas fused ELBO path
# bf16 compute measures 1.45x faster than f32 (24.5k vs 16.9k samples/sec,
# value-materialization timing) — the MXU-preferred precision is the default
BF16 = os.environ.get("MIDI_VAE_BENCH_BF16", "1") == "1"
# encoder stem: "conv" (reference parity) | "s2d" (space-to-depth MXU stem)
STEM = os.environ.get("MIDI_VAE_BENCH_STEM", "conv")
# decoder head: "d2s" (depth-to-space, the flagship perf config: +70% over
# the reference head by keeping all head compute at half resolution —
# RESULTS.md "architecture experiments") | "deconv" (reference parity)
HEAD = os.environ.get("MIDI_VAE_BENCH_HEAD", "d2s")
# model family: "FoldedVAE" (fully folded TPU-native layout — the flagship
# perf config: ~8x the reference arch at fold=8, models/folded.py) |
# "VanillaVAE" (reference capability parity; combine with STEM/HEAD above)
ARCH = os.environ.get("MIDI_VAE_BENCH_ARCH", "FoldedVAE")
# fold factor for FoldedVAE: 8 won the round-2 sweep (188.9k samples/sec/chip
# vs 119.2k at fold=4, with eval quality matching the reference layout —
# benchmarks/quality.json); 16 is +8% faster but quality-riskier at short
# horizons (worse 300-step train loss)
FOLD = int(os.environ.get("MIDI_VAE_BENCH_FOLD", "8"))
# hidden dims: (48, 64, 128, 256) is THE flagship config ("fold8m",
# configs/folded.yaml) — the round-3 resolution of the headline-vs-
# recommended split: 192.9k samples/sec/chip with a 10-epoch training
# objective (BCE −3.67) that beats both the narrow fold8 (−2.25) AND the
# reference layout (−2.45). bench.py measures exactly the config the
# docs tell users to train.
# (parsed in main(); the default depends on ARCH — the reference-parity
# VanillaVAE keeps the reference's (32, 64, 128, 256))
HIDDEN_ENV = os.environ.get("MIDI_VAE_BENCH_HIDDEN")
# conv-block normalization: batch (reference parity, the flagship default) |
# group | none. Measured (benchmarks/norm_bench.json): none is +12.6%,
# group is -1.6% — see RESULTS.md "normalization" for the quality gate
NORM = os.environ.get("MIDI_VAE_BENCH_NORM", "batch")
# Per-compile XLA compiler options (JSON dict), applied to the timed
# programs. This is how TPU-only knobs (scoped VMEM, latency-hiding
# scheduler) reach the REMOTE compiler on this platform: process-level
# XLA_FLAGS are parsed by the local (CPU) XLA client, which fatals on
# unknown TPU flags, while jit(compiler_options=...) rides the compile
# RPC. Swept by benchmarks/xla_flags_bench.py.
COMPILER_OPTIONS = json.loads(os.environ.get("MIDI_VAE_COMPILER_OPTIONS", "null"))


def setup(
    batch=BATCH,
    bf16=True,
    fused=False,
    stem="conv",
    head="deconv",
    arch="VanillaVAE",
    fold=4,
    remat=False,
    grad_accum=1,
    hidden_dims=(32, 64, 128, 256),
    norm="batch",
):
    """Build (model, state, train_step, mesh, shardings) for one config."""
    from midi_vae_tpu.losses.schedules import kl_weight_schedule
    from midi_vae_tpu.models.registry import build_model
    from midi_vae_tpu.models.vae import param_group_label
    from midi_vae_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
    from midi_vae_tpu.train.optim import build_optimizer
    from midi_vae_tpu.train.state import create_train_state, make_train_step

    devices = jax.devices()
    n_chips = len(devices)
    mesh = make_mesh(n_chips)
    # the discrete families train under their own objective: reconstruction +
    # commitment (losses/vq.py; the weight is the paper's beta=0.25)
    vq = arch.lower() in ("vqvae", "foldedvqvae")
    model = build_model(
        arch,
        in_channels=1,
        # VQ: latent_dim is the code embedding dim — configs/vqvae.yaml's 16
        latent_dim=16 if vq else 10,
        input_dim=IMAGE_SIZE,
        hidden_dims=tuple(hidden_dims),
        fused_reparam=fused,
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
        stem=stem,
        head=head,
        fold=fold,
        remat=remat,
        norm=norm,
    )
    bundle = build_optimizer(
        None, param_group_label, optimizer="AdamW", lr=1e-3, scheduler="OneCycle", total_steps=10000
    )
    state = create_train_state(
        model, bundle.tx, jax.random.PRNGKey(0), jnp.zeros((2, IMAGE_SIZE, IMAGE_SIZE, 1), jnp.float32)
    )
    state = replicate(state, mesh)
    train_step = make_train_step(
        model, bundle.tx,
        kl_weight_schedule("constant", 0.25 if vq else 2.5e-4),
        fused_loss=fused, grad_accum=grad_accum,
        loss_type="vq" if vq else "elbo",
    )
    return {
        "model": model,
        "state": state,
        "train_step": train_step,
        "mesh": mesh,
        "n_chips": n_chips,
        "total_batch": batch * n_chips,
        "x_sharding": batch_sharding(mesh),
        "backend": devices[0].platform,
    }


def measure_train(ctx, steps=MEASURE_STEPS, warmup=WARMUP_STEPS):
    """Timed training window. Returns (samples/sec/chip, final_loss, steps).

    Runs as ``lax.scan`` chunks (no host involvement inside a chunk; the
    remote executor rejects very long single programs) and materializes a
    host VALUE inside the timed window — on this platform
    ``block_until_ready`` alone can return before execution finishes for
    some dispatch patterns, silently inflating throughput.
    """
    from midi_vae_tpu.data.synthetic import make_pianoroll_batch

    state = ctx["state"]
    train_step = ctx["train_step"]
    total_batch = ctx["total_batch"]
    x_sharding = ctx["x_sharding"]
    base_key = jax.random.PRNGKey(1)

    def scan_body(state, i):
        key = jax.random.fold_in(base_key, i)
        x, _ = make_pianoroll_batch(key, total_batch, pitches=IMAGE_SIZE, steps=IMAGE_SIZE)
        x = jax.lax.with_sharding_constraint(x, x_sharding)
        state, lo, _ = train_step(state, x, base_key)
        return state, lo.loss

    @functools.partial(jax.jit, static_argnums=(2,), compiler_options=COMPILER_OPTIONS)
    def run_steps(state, start, n_steps):
        return jax.lax.scan(scan_body, state, start + jnp.arange(n_steps))

    scan_chunk = min(100, steps)
    n_chunks = -(-steps // scan_chunk)

    state, _ = run_steps(state, jnp.int32(0), warmup)
    state, _ = run_steps(state, jnp.int32(warmup), scan_chunk)  # compile the chunk size
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    start = warmup + scan_chunk
    losses = None
    for c in range(n_chunks):
        state, losses = run_steps(state, jnp.int32(start + c * scan_chunk), scan_chunk)
    final_loss = float(losses[-1])  # value materialization closes the window
    dt = time.perf_counter() - t0
    measured = n_chunks * scan_chunk

    ctx["state"] = state
    per_chip = total_batch * measured / dt / ctx["n_chips"]
    return per_chip, final_loss, measured


def measure_sampling(ctx, iters=50, repeats=1):
    """Decode-only prior sampling (serving path), batch sharded over the
    data mesh. Returns a list of per-repeat samples/sec/chip rates —
    repeat to quantify run-to-run variance (RESULTS.md reports it)."""
    from jax.sharding import NamedSharding, PartitionSpec

    model = ctx["model"]
    state = ctx["state"]
    sample_batch = ctx["total_batch"]
    z_sharding = NamedSharding(ctx["mesh"], PartitionSpec("data", None))
    base_key = jax.random.PRNGKey(2)

    latent_dim = int(getattr(model, "flat_latent_dim", model.latent_dim))  # VQ: [s·s·D]

    @functools.partial(jax.jit, compiler_options=COMPILER_OPTIONS)
    def sample_step(key):
        z = jax.random.normal(key, (sample_batch, latent_dim), jnp.float32)
        z = jax.lax.with_sharding_constraint(z, z_sharding)
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            z, train=False, method=type(model).decode,
        )

    jax.block_until_ready(sample_step(base_key))
    rates = []
    for r in range(repeats):
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = sample_step(jax.random.fold_in(base_key, r * iters + i))
        float(jnp.sum(out[0]))  # value materialization — see measure_train
        rates.append(sample_batch * iters / (time.perf_counter() - t0) / ctx["n_chips"])
    return rates


def read_baseline():
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    if os.path.isfile(baseline_path):
        with open(baseline_path) as f:
            return json.load(f).get("torch_cpu_samples_per_sec")
    return None


def preflight_backend(timeout_s: float = 300.0, attempts: int = 3) -> None:
    """Fail FAST (with a parseable JSON line) when the TPU tunnel is dead.

    The axon tunnel can go down for hours (memory/tpu_watch logs show an
    8.7 h outage on 2026-08-18); a dead tunnel makes the first device op
    hang FOREVER, so an unguarded bench run wedges whatever invoked it.
    A trivial matmul completes in seconds on a healthy chip and ~60 s
    under heavy congestion — probe it in a subprocess (a hung XLA call
    cannot be cancelled in-process) with a generous deadline, retry, and
    exit with an error JSON the driver can record if the backend never
    answers. Skipped on CPU (MIDI_VAE_BENCH_CPU=1). The probe itself is
    shared with the serving CLI (core/backend_check.py)."""
    from midi_vae_tpu.core.backend_check import backend_alive

    if backend_alive(timeout_s=timeout_s, attempts=attempts):
        return
    print(
        json.dumps(
            {
                "metric": "train_throughput_pianoroll_128px",
                "value": None,
                "unit": "samples/sec/chip",
                "vs_baseline": None,
                "error": f"backend unreachable: trivial matmul never completed "
                         f"({attempts} x {timeout_s:.0f}s)",
            }
        )
    )
    sys.exit(1)


def main():
    if os.environ.get("MIDI_VAE_BENCH_CPU", "0") != "1":
        preflight_backend()
    # FoldedVAE has its own layout — stem/head knobs only apply to VanillaVAE;
    # the reference-parity arch keeps the reference's (32, 64, 128, 256)
    if ARCH.lower() == "vanillavae":
        stem, head, default_hidden = STEM, HEAD, "32,64,128,256"
    elif ARCH.lower() == "vqvae":
        # the discrete family keeps the reference trunk; stem/head apply
        stem, head, default_hidden = STEM, HEAD, "32,64,128,256"
    else:
        # folded layouts (FoldedVAE / FoldedVQVAE): own stem/head, flagship widths
        stem, head, default_hidden = "conv", "deconv", "48,64,128,256"
    hidden = tuple(int(h) for h in (HIDDEN_ENV or default_hidden).split(","))
    ctx = setup(
        batch=BATCH, bf16=BF16, fused=FUSED, stem=stem, head=head, arch=ARCH, fold=FOLD,
        hidden_dims=hidden, norm=NORM,
    )
    per_chip, final_loss, measured = measure_train(ctx)
    # median of 3 windows: the first window after compile is routinely much
    # slower on this path (cold caches/power state) — see RESULTS.md
    gen_per_sec = sorted(measure_sampling(ctx, repeats=3))[1]
    ref = read_baseline()
    print(
        json.dumps(
            {
                "metric": "train_throughput_pianoroll_128px",
                "value": round(per_chip, 2),
                "unit": "samples/sec/chip",
                "vs_baseline": round(per_chip / ref, 2) if ref else None,
                "extra": {
                    "n_chips": ctx["n_chips"],
                    "batch_per_chip": BATCH,
                    "steps": measured,
                    "final_loss": round(final_loss, 5),
                    "backend": ctx["backend"],
                    "fused": FUSED,
                    "dtype": "bfloat16" if BF16 else "float32",
                    "arch": ARCH,
                    "fold": FOLD if ARCH.lower() in ("foldedvae", "foldedvqvae") else None,
                    "hidden_dims": list(hidden),
                    "stem": stem,
                    "head": head,
                    "sample_throughput_per_chip": round(gen_per_sec, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
