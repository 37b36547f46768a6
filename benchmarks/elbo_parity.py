"""ELBO-parity artifact: matched-config training curves, torch vs JAX.

The north star is throughput *at held-out ELBO parity*; BASELINE.md
step 3 prescribes overlaid loss curves. This harness makes the
comparison airtight by removing every uncontrolled difference:

- **identical initial weights**: torch xavier init imported into the
  flax model (``interop/torch_import.py``; forward parity is proven at
  bit level in ``tests/test_torch_parity.py``),
- **identical data**: one fixed synthetic-lines corpus, same batch
  order, no augmentation,
- **identical reparam noise**: eps drawn once in numpy, fed to both,
- **matched config** (reference ``configs/vae.yaml:16-27`` + formula
  ``models.py:208-216``): batch 100, AdamW lr 1e-3 / wd 1e-5,
  kld_weight 2.5e-4, latent 10, hidden [32,64,128,256], 32 px.

What remains is reduction-order/conv-algorithm float noise, which
accumulates through Adam over steps; the artifact quantifies it.
Writes ``PARITY.json`` (both curves + divergence stats) and
``PARITY.md`` next to this file; exits non-zero if the curves disagree
beyond tolerance.

Usage: python benchmarks/elbo_parity.py [--steps 200] [--batch 100] [--cpu]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

KLD_WEIGHT = 2.5e-4
LR = 1e-3
WD = 1e-5
IMG = 32
HID = (32, 64, 128, 256)
LATENT = 10


def make_data(n: int, batch: int, seed: int = 0) -> np.ndarray:
    from midi_vae_tpu.data.synthetic import generate_line_images

    images, _ = generate_line_images(n, img_size=(IMG, IMG), max_lines=3, line_width=2, seed=seed)
    x = images.astype(np.float32) / 255.0  # [N, H, W] in {0, 1}
    return x[: (n // batch) * batch, None, :, :]  # NCHW for torch; transposed later for JAX


def run_torch(x: np.ndarray, eps_all: np.ndarray, steps: int, batch: int):
    import torch

    from torch_cpu_baseline import TorchRefVAE

    torch.manual_seed(0)
    model = TorchRefVAE(in_ch=1, latent=LATENT, input_dim=IMG, hidden=HID)
    sd = {k: v.detach().clone() for k, v in model.state_dict().items()}
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=WD)
    n_batches = len(x) // batch
    losses = []
    model.train()
    for step in range(steps):
        lo = (step % n_batches) * batch
        xb = torch.from_numpy(x[lo : lo + batch])
        eps = torch.from_numpy(eps_all[step])
        opt.zero_grad()
        recon, mu, log_var = model(xb, eps=eps)
        bce = torch.nn.functional.binary_cross_entropy(recon, xb)
        kld = -0.5 * torch.mean(torch.sum(1 + log_var - mu**2 - torch.exp(log_var), dim=-1))
        loss = bce + KLD_WEIGHT * kld
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return losses, sd


def run_jax(x: np.ndarray, eps_all: np.ndarray, steps: int, batch: int, sd, force_cpu: bool):
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from midi_vae_tpu.interop.torch_import import import_reference_state_dict
    from midi_vae_tpu.losses.elbo import elbo_loss
    from midi_vae_tpu.models.vae import VanillaVAE

    model = VanillaVAE(
        in_channels=1, latent_dim=LATENT, input_dim=IMG, hidden_dims=HID, torch_compat=True
    )
    variables = import_reference_state_dict(sd, input_dim=IMG, hidden_dims=HID)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adamw(LR, weight_decay=WD)
    opt_state = tx.init(params)

    def loss_fn(params, batch_stats, xb, eps):
        def fwd(mdl):
            enc = mdl.encode(xb, train=True)
            z = enc.mu + eps * jnp.exp(0.5 * enc.log_var)
            logits = mdl.decode_logits(z, train=True)
            from midi_vae_tpu.core.types import EncoderOutput, ModelOutput

            return ModelOutput(
                output=jax.nn.sigmoid(logits), logits=logits, input=xb,
                encoded=EncoderOutput(mu=enc.mu, log_var=enc.log_var, pre_latents=enc.pre_latents),
                latents=z,
            )

        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, method=fwd, mutable=["batch_stats"]
        )
        lo = elbo_loss(out, kld_weight=KLD_WEIGHT)
        return lo.loss, mutated["batch_stats"]

    @jax.jit
    def train_step(params, batch_stats, opt_state, xb, eps):
        (loss, batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, xb, eps
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, batch_stats, opt_state, loss

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    n_batches = len(x) // batch
    losses = []
    for step in range(steps):
        lo = (step % n_batches) * batch
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, x_nhwc[lo : lo + batch], jnp.asarray(eps_all[step])
        )
        losses.append(float(loss))
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--n-images", type=int, default=2000)
    ap.add_argument("--cpu", action="store_true", help="force the JAX CPU backend")
    ap.add_argument("--tol-mean", type=float, default=0.02,
                    help="max allowed mean |Δloss| over the last quarter of training (nats)")
    ap.add_argument("--at-scale", action="store_true",
                    help="Convergence-length mode (round-4 capstone): judge LEVEL parity — "
                         "|mean(torch tail) − mean(jax tail)| — instead of pointwise curve "
                         "overlap. Over thousands of Adam steps the float32 reduction-order "
                         "noise compounds chaotically, so two bit-identical-at-step-0 runs "
                         "legitimately decorrelate pointwise while converging to the same "
                         "ELBO; the level is the claim the north star makes. Writes "
                         "PARITY_SCALE.{json,md} so the short-run artifact stays intact.")
    args = ap.parse_args()

    x = make_data(args.n_images, args.batch)
    eps_all = np.random.default_rng(7).standard_normal((args.steps, args.batch, LATENT)).astype(np.float32)

    t0 = time.perf_counter()
    torch_losses, sd = run_torch(x, eps_all, args.steps, args.batch)
    t_torch = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax_losses = run_jax(x, eps_all, args.steps, args.batch, sd, args.cpu)
    t_jax = time.perf_counter() - t0

    d = np.abs(np.asarray(torch_losses) - np.asarray(jax_losses))
    tail = args.steps // 4
    torch_level = float(np.mean(torch_losses[-tail:]))
    jax_level = float(np.mean(jax_losses[-tail:]))
    stats = {
        "steps": args.steps,
        "batch": args.batch,
        "config": {"lr": LR, "weight_decay": WD, "kld_weight": KLD_WEIGHT, "latent": LATENT,
                   "hidden_dims": list(HID), "image_size": IMG},
        "torch_loss": torch_losses,
        "jax_loss": jax_losses,
        "max_abs_diff": float(d.max()),
        "mean_abs_diff": float(d.mean()),
        "mean_abs_diff_last_quarter": float(d[-tail:].mean()),
        "torch_tail_level": torch_level,
        "jax_tail_level": jax_level,
        "tail_level_diff": abs(torch_level - jax_level),
        "torch_final_loss": torch_losses[-1],
        "jax_final_loss": jax_losses[-1],
        "torch_seconds": t_torch,
        "jax_seconds": t_jax,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    json_name = "PARITY_SCALE.json" if args.at_scale else "PARITY.json"
    with open(os.path.join(here, json_name), "w") as f:
        json.dump(stats, f)

    if args.at_scale:
        ok = stats["tail_level_diff"] <= args.tol_mean
    else:
        ok = stats["mean_abs_diff_last_quarter"] <= args.tol_mean
    marks = ""
    for i in range(0, args.steps, max(1, args.steps // 20)):
        marks += f"| {i:5d} | {torch_losses[i]:.5f} | {jax_losses[i]:.5f} | {d[i]:.2e} |\n"
    md_name = "PARITY_SCALE.md" if args.at_scale else "PARITY.md"
    scale_note = (
        f"\n**At-scale (convergence-level) mode**: the verdict compares the "
        f"last-quarter MEAN loss levels — torch {torch_level:.5f} vs jax "
        f"{jax_level:.5f} (|Δ| = {stats['tail_level_diff']:.2e} nats, tolerance "
        f"{args.tol_mean}) — because over thousands of Adam steps the float32 "
        f"reduction-order noise decorrelates the curves pointwise while both "
        f"converge to the same ELBO.\n" if args.at_scale else ""
    )
    with open(os.path.join(here, md_name), "w") as f:
        f.write(f"""# ELBO parity: torch reference vs midi_vae_tpu (matched everything)

Same initial weights (torch xavier init imported — bit-level forward
parity proven in tests/test_torch_parity.py), same data/batch order,
same reparameterization noise, matched config (batch {args.batch},
AdamW lr {LR} / wd {WD}, kld_weight {KLD_WEIGHT}, hidden {list(HID)},
{IMG}px synthetic lines). Differences are float32 reduction-order noise
accumulated through Adam.

Regenerate: `python benchmarks/elbo_parity.py` (writes PARITY.json + this file).

| step | torch loss | jax loss | abs diff |
|---|---|---|---|
{marks}
- final losses: torch {torch_losses[-1]:.5f}, jax {jax_losses[-1]:.5f}
- mean |Δ| over all steps: {stats['mean_abs_diff']:.2e} nats
- mean |Δ| over the last quarter: {stats['mean_abs_diff_last_quarter']:.2e} nats (tolerance {args.tol_mean})
- last-quarter LEVELS: torch {torch_level:.5f}, jax {jax_level:.5f} (|Δ| {stats['tail_level_diff']:.2e})
{scale_note}- verdict: **{"PASS" if ok else "FAIL"}**
""")
    print(json.dumps({k: v for k, v in stats.items() if not isinstance(v, list)}, indent=2))
    print("PARITY:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
