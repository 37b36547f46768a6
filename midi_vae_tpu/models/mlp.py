"""MLP VAE — the minimal end-to-end model (BASELINE.json config #1).

No reference implementation exists (the reference only ships the conv
``VanillaVAE``); this model exists so the framework's first vertical
slice — "MLP VAE on synthetic piano-roll batches" — runs everywhere,
and as the fastest smoke-test model. Same pytree contracts and RNG
streams as :class:`~midi_vae_tpu.models.vae.VanillaVAE`, so the trainer,
loss, and eval suite are model-agnostic.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from midi_vae_tpu.core.types import EncoderOutput, ModelOutput

_xavier = nn.initializers.xavier_uniform()


class MLPVAE(nn.Module):
    """Dense encoder/decoder VAE over flattened NHWC images."""

    in_channels: int = 1
    latent_dim: int = 10
    input_dim: int = 32
    hidden_dims: Sequence[int] = (512, 256)
    out_channels: Optional[int] = None
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None  # unused; kept for constructor parity
    fused_reparam: bool = False
    verbose: bool = False  # forward range tracing (see vae.trace_range)
    remat: bool = False  # inert (dense stack is activation-light); kept for constructor parity
    output_logit_bias: Optional[float] = None  # see models/vae.py _logit_bias_init
    # > 0 makes this a conditional VAE: one-hot label concatenated at the
    # dense bottleneck, exactly like VanillaVAE (see models/vae.py).
    num_classes: int = 0

    name_tag = "MLPVAE"

    @property
    def flat_size(self) -> int:
        return self.input_dim * self.input_dim * self.in_channels

    def setup(self):
        self.encoder = [
            nn.Dense(h, kernel_init=_xavier, bias_init=nn.initializers.zeros, dtype=self.dtype)
            for h in self.hidden_dims
        ]
        self.fc_mu = nn.Dense(self.latent_dim, kernel_init=_xavier, bias_init=nn.initializers.zeros, dtype=self.dtype)
        self.fc_var = nn.Dense(self.latent_dim, kernel_init=_xavier, bias_init=nn.initializers.zeros, dtype=self.dtype)
        out_ch = self.out_channels or self.in_channels
        self.decoder = [
            nn.Dense(h, kernel_init=_xavier, bias_init=nn.initializers.zeros, dtype=self.dtype)
            for h in reversed(self.hidden_dims)
        ]
        from midi_vae_tpu.models.vae import _logit_bias_init

        self.decoder_out = nn.Dense(
            self.input_dim * self.input_dim * out_ch,
            kernel_init=_xavier,
            bias_init=_logit_bias_init(self.output_logit_bias),
            dtype=self.dtype,
        )

    def _class_onehot(self, y: Optional[jax.Array], where: str) -> jax.Array:
        if y is None:
            raise ValueError(
                f"{self.name_tag}(num_classes={self.num_classes}) is conditional: "
                f"{where} requires labels y (int [B])"
            )
        return jax.nn.one_hot(y, self.num_classes, dtype=self.dtype)

    def encode(self, x: jax.Array, train: bool = False, y: Optional[jax.Array] = None) -> EncoderOutput:
        from midi_vae_tpu.models.vae import trace_range

        trace_range(self.verbose, "encode/input", x)
        h = x.reshape(x.shape[0], -1)
        for layer in self.encoder:
            h = nn.leaky_relu(layer(h), negative_slope=0.01)
        trace_range(self.verbose, "encode/hidden", h)
        hc = (
            jnp.concatenate([h, self._class_onehot(y, "encode")], axis=-1)
            if self.num_classes > 0
            else h
        )
        return EncoderOutput(mu=self.fc_mu(hc), log_var=self.fc_var(hc), pre_latents=h)

    def decode_logits(self, z: jax.Array, train: bool = False, y: Optional[jax.Array] = None) -> jax.Array:
        if self.num_classes > 0:
            z = jnp.concatenate([z.astype(self.dtype), self._class_onehot(y, "decode")], axis=-1)
        h = z
        for layer in self.decoder:
            h = nn.leaky_relu(layer(h), negative_slope=0.01)
        out_ch = self.out_channels or self.in_channels
        logits = self.decoder_out(h)
        return logits.reshape(-1, self.input_dim, self.input_dim, out_ch)

    def decode(self, z: jax.Array, train: bool = False, y: Optional[jax.Array] = None) -> jax.Array:
        return jax.nn.sigmoid(self.decode_logits(z, train, y=y))

    def reparameterize(self, mu: jax.Array, log_var: jax.Array) -> jax.Array:
        key = self.make_rng("reparam")
        if self.fused_reparam:
            from midi_vae_tpu.ops.fused_elbo import fused_reparam_kl

            seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
            z, _ = fused_reparam_kl(mu, log_var, seed)
            return z
        eps = jax.random.normal(key, mu.shape, dtype=mu.dtype)
        return mu + eps * jnp.exp(0.5 * log_var)

    def __call__(self, x: jax.Array, train: bool = False, y: Optional[jax.Array] = None) -> ModelOutput:
        encoded = self.encode(x, train, y=y)
        z = self.reparameterize(encoded.mu, encoded.log_var)
        logits = self.decode_logits(z, train, y=y)
        return ModelOutput(
            output=jax.nn.sigmoid(logits),
            logits=logits,
            input=x,
            encoded=encoded,
            latents=z,
        )

    def generate(self, x: jax.Array, y: Optional[jax.Array] = None) -> jax.Array:
        return self(x, train=False, y=y).output
