"""PyTorch-CPU baseline measurement harness.

Measures the training throughput of the reference architecture on CPU —
the denominator of the north-star target ("≥10× samples/sec/chip vs the
PyTorch CPU reference", BASELINE.json). The reference repo itself cannot
run in this image (it imports torchvision, which is not installed), so
this is a freshly-written minimal harness exercising the same
computational graph as the reference:

- conv VAE: 4× [Conv2d(k3,s2,p1) + BatchNorm2d + LeakyReLU] encoder with
  channels [32,64,128,256], linear mu/logvar heads, linear decoder input,
  3× ConvTranspose2d(k3,s2,p1,op1) decoder stages, final ConvTranspose +
  BN + LeakyReLU + Conv2d + Sigmoid  (reference: models.py:40-83)
- loss: BCE(mean) + kld_weight · KL, kld_weight=2.5e-4
  (models.py:208-216, configs/vae.yaml:20)
- AdamW, full batch per step, synthetic data resident in memory
  (generous to the baseline: no dataloader/transform overhead at all)

Writes the measured samples/sec into BASELINE_MEASURED.json at the repo
root, which bench.py uses as the comparison denominator.

Usage: python benchmarks/torch_cpu_baseline.py [--image-size 128] [--batch 128] [--steps 5]
"""

import argparse
import json
import math
import os
import time

import numpy as np
import torch
from torch import nn


class TorchRefVAE(nn.Module):
    """Reference architecture, with the reference's exact module nesting
    (models.py:40-83: per-stage nn.Sequential blocks inside encoder/
    decoder Sequentials) so ``state_dict()`` keys match the reference
    checkpoints — the layout ``interop/torch_import.py`` consumes."""

    def __init__(self, in_ch=1, latent=10, input_dim=128, hidden=(32, 64, 128, 256)):
        super().__init__()
        enc = []
        c = in_ch
        for h in hidden:
            enc.append(
                nn.Sequential(nn.Conv2d(c, h, 3, stride=2, padding=1), nn.BatchNorm2d(h), nn.LeakyReLU())
            )
            c = h
        self.encoder = nn.Sequential(*enc)
        s = input_dim
        for _ in hidden:
            s = math.ceil(s / 2)
        self.s = s
        flat = s * s * hidden[-1]
        self.fc_mu = nn.Linear(flat, latent)
        self.fc_var = nn.Linear(flat, latent)
        self.decoder_input = nn.Linear(latent, flat)
        rev = list(reversed(hidden))
        dec = []
        for i in range(len(rev) - 1):
            dec.append(
                nn.Sequential(
                    nn.ConvTranspose2d(rev[i], rev[i + 1], 3, stride=2, padding=1, output_padding=1),
                    nn.BatchNorm2d(rev[i + 1]),
                    nn.LeakyReLU(),
                )
            )
        self.decoder = nn.Sequential(*dec)
        self.final_layer = nn.Sequential(
            nn.ConvTranspose2d(rev[-1], rev[-1], 3, stride=2, padding=1, output_padding=1),
            nn.BatchNorm2d(rev[-1]),
            nn.LeakyReLU(),
            nn.Conv2d(rev[-1], in_ch, 3, padding=1),
            nn.Sigmoid(),
        )
        self.hidden_last = hidden[-1]

    def encode(self, x):
        h = self.encoder(x).flatten(1)
        return self.fc_mu(h), self.fc_var(h)

    def decode(self, z):
        d = self.decoder_input(z).view(-1, self.hidden_last, self.s, self.s)
        return self.final_layer(self.decoder(d))

    def forward(self, x, eps=None):
        mu, log_var = self.encode(x)
        if eps is None:
            eps = torch.randn_like(mu)
        z = mu + eps * torch.exp(0.5 * log_var)
        return self.decode(z), mu, log_var


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..", "BASELINE_MEASURED.json"))
    args = ap.parse_args()

    torch.manual_seed(0)
    model = TorchRefVAE(input_dim=args.image_size)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    kld_weight = 2.5e-4
    x = torch.rand(args.batch, 1, args.image_size, args.image_size)

    def step():
        opt.zero_grad()
        recon, mu, log_var = model(x)
        bce = nn.functional.binary_cross_entropy(recon, x)
        kld = -0.5 * torch.mean(torch.sum(1 + log_var - mu**2 - torch.exp(log_var), dim=-1))
        loss = bce + kld_weight * kld
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        loss = step()
    dt = time.perf_counter() - t0
    throughput = args.batch * args.steps / dt

    result = {
        "torch_cpu_samples_per_sec": throughput,
        "image_size": args.image_size,
        "batch": args.batch,
        "steps": args.steps,
        "seconds_per_step": dt / args.steps,
        "final_loss": loss,
        "torch_version": torch.__version__,
        "cpu_count": os.cpu_count(),
        "note": "reference-architecture conv VAE train step, synthetic in-memory data, CPU",
    }
    print(json.dumps(result, indent=2))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
