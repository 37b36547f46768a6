"""Migration walkthrough: carry trained torch-vae weights into midi_vae_tpu.

For a user of the PyTorch reference (``finlaymiller/torch-vae``) moving
to this framework: take a reference checkpoint's ``state_dict``, import
it into the flax model, verify the reconstruction outputs match the
torch model bit-for-bit, then CONTINUE training on TPU/JAX from those
weights.

Runs in ~1 minute on CPU::

    python examples/migrate_from_torch.py --cpu

Steps:
1. Build the reference-architecture torch model (here freshly
   initialized — point ``--checkpoint`` at a real reference ``.pt``
   to migrate actual training state; keys are the reference's
   ``encoder``/``decoder`` state-dict layout, utils.py:344-345).
2. ``interop.import_reference_state_dict`` → flax variables for
   ``VanillaVAE(torch_compat=True)``.
3. Forward-parity check on real inputs (same reparam noise both sides).
4. Resume training in JAX: a few optimizer steps on synthetic data,
   loss decreasing from the migrated weights.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", default=None,
                        help="Optional reference checkpoint (.pt). Its encoder/decoder "
                             "state dicts are merged and imported; default: fresh torch init.")
    parser.add_argument("--image-size", type=int, default=32)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    import torch

    from midi_vae_tpu.interop.torch_import import import_reference_state_dict
    from midi_vae_tpu.losses.elbo import elbo_loss
    from midi_vae_tpu.models.vae import VanillaVAE
    from torch_cpu_baseline import TorchRefVAE

    hid = (32, 64, 128, 256)

    # 1. The torch side -----------------------------------------------------
    torch.manual_seed(0)
    tmodel = TorchRefVAE(in_ch=1, latent=10, input_dim=args.image_size, hidden=hid)
    if args.checkpoint:
        payload = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
        sd = {**payload["encoder"], **payload["decoder"]}  # reference layout (utils.py:344-345)
        tmodel.load_state_dict(sd)
        print(f"loaded reference checkpoint '{args.checkpoint}' (epoch {payload.get('epoch')})")
    tmodel.eval()

    # 2. Import into flax ---------------------------------------------------
    variables = import_reference_state_dict(
        tmodel.state_dict(), input_dim=args.image_size, hidden_dims=hid
    )
    jmodel = VanillaVAE(
        in_channels=1, latent_dim=10, input_dim=args.image_size, hidden_dims=hid, torch_compat=True
    )

    # 3. Forward parity on real inputs --------------------------------------
    x = np.random.default_rng(0).uniform(0, 1, (8, 1, args.image_size, args.image_size)).astype(np.float32)
    eps = np.random.default_rng(1).standard_normal((8, 10)).astype(np.float32)
    with torch.no_grad():
        recon_t, _, _ = tmodel(torch.from_numpy(x), eps=torch.from_numpy(eps))

    def fwd(mdl):
        enc = mdl.encode(jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        z = enc.mu + jnp.asarray(eps) * jnp.exp(0.5 * enc.log_var)
        return mdl.decode(z, train=False)

    recon_j = jmodel.apply(variables, method=fwd)
    err = float(np.abs(np.asarray(recon_j).transpose(0, 3, 1, 2) - recon_t.numpy()).max())
    print(f"forward parity: max |torch - jax| = {err:.2e}  (expect < 1e-4)")
    assert err < 1e-4, "imported weights do not reproduce the torch forward pass"

    # 4. Continue training in JAX -------------------------------------------
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adamw(1e-3, weight_decay=1e-5)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, xb, key):
        def loss_fn(params):
            out, mutated = jmodel.apply(
                {"params": params, "batch_stats": batch_stats},
                xb, train=True, rngs={"reparam": key}, mutable=["batch_stats"],
            )
            lo = elbo_loss(out, kld_weight=2.5e-4)
            return lo.loss, mutated["batch_stats"]

        (loss, batch_stats2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), batch_stats2, opt_state2, loss

    from midi_vae_tpu.data.synthetic import generate_line_images

    images, _ = generate_line_images(512, img_size=(args.image_size, args.image_size), max_lines=3, seed=0)
    data = jnp.asarray(images.astype(np.float32) / 255.0)[..., None]
    key = jax.random.PRNGKey(0)
    first = last = None
    for step in range(args.steps):
        lo = (step * 64) % (len(data) - 64)
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, data[lo : lo + 64], jax.random.fold_in(key, step)
        )
        if step == 0:
            first = float(loss)
        last = float(loss)
    print(f"continued training {args.steps} steps in JAX: loss {first:.4f} -> {last:.4f}")
    assert last < first, "loss did not decrease from the migrated weights"
    print("migration OK")


if __name__ == "__main__":
    main()
