"""FoldedVAE — the fully TPU-native-layout conv VAE variant.

Round-2 profiling (``benchmarks/layer_profile.py``, RESULTS.md
"architecture experiments") found a systematic pattern on this chip:
convolutions at wide spatial sizes with few channels (64²–128², ≤64 ch)
run 3–13× above their compute AND bandwidth rooflines, while the same
FLOPs at ≤32² with ≥128 channels run near the measurement floor —
e.g. the s2d-folded equivalent of the 64²×32→64 encoder stage is 35%
faster at 1.8× the FLOPs, and the depth-to-space head alone bought +70%
end-to-end.

FoldedVAE applies that finding globally: space-to-depth folds the input
by ``fold`` (default 4) immediately — 128²×1 → 32²×16 — so EVERY conv
in the network runs at ≤32² spatial with ≥16 channels; the decoder
mirrors with a depth-to-space unfold of the logits. Same capability
surface as :class:`~midi_vae_tpu.models.vae.VanillaVAE` (same latent
contract, same flattened size, same ELBO, same crop rule for
non-power-of-two inputs), different compute layout. Select with
``--model FoldedVAE``.

Stage plan for L hidden dims and fold f (power of two, ≤ 2^L):
- encoder: s2d(f) → L ConvBlocks; the first ``L - log2(f)`` use stride 2
  (finish the downsample early, while tensors are largest), the rest
  stride 1. Final spatial = input / 2^L — identical to VanillaVAE.
- decoder: L-1 blocks; the LAST ``L - log2(f)`` upsample (stride-2
  ConvTranspose), earlier ones are stride-1 ConvBlocks at tiny sizes.
- head: ConvBlock(s1) → Conv(f²·out_ch) → depth-to-space(f) → logits.

No reference equivalent (the reference is CUDA-idiom; SURVEY §7 scopes
the rebuild to capability parity, with TPU-first design free to choose
its own layouts). The reference-parity architecture remains
``VanillaVAE``.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from midi_vae_tpu.models.vae import (
    ConvBlock,
    DeconvBlock,
    VanillaVAE,
    _logit_bias_init,
    _xavier,
)


def _log2_int(n: int) -> int:
    r = int(math.log2(n))
    if 2**r != n:
        raise ValueError(f"fold must be a power of two, got {n}")
    return r


def _space_to_depth(x: jax.Array, f: int) -> jax.Array:
    b, h, w, c = x.shape
    if h % f or w % f:
        raise ValueError(f"input {h}x{w} not divisible by fold={f}")
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def _depth_to_space(x: jax.Array, f: int, out_ch: int) -> jax.Array:
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, f, f, out_ch)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * f, w * f, out_ch)


class FoldedEncoder(nn.Module):
    hidden_dims: Sequence[int]
    fold: int = 4
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = _space_to_depth(x, self.fold)
        n_down = len(self.hidden_dims) - _log2_int(self.fold)
        if n_down < 0:
            raise ValueError(f"fold={self.fold} exceeds the 2^{len(self.hidden_dims)} stage downsample")
        for i, h in enumerate(self.hidden_dims):
            x = ConvBlock(
                h, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                stride=2 if i < n_down else 1, norm=self.norm,
            )(x, train)
        return x


class FoldedDecoder(nn.Module):
    hidden_dims: Sequence[int]  # reversed order, e.g. (256, 128, 64, 32)
    fold: int = 4
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        n_up = len(self.hidden_dims) - _log2_int(self.fold)
        blocks = list(self.hidden_dims[1:])
        n_flat = len(blocks) - n_up
        for i, h in enumerate(blocks):
            if i < n_flat:
                x = ConvBlock(
                    h, dtype=self.dtype, bn_axis_name=self.bn_axis_name, stride=1, norm=self.norm
                )(x, train)
            else:
                x = DeconvBlock(
                    h, dtype=self.dtype, bn_axis_name=self.bn_axis_name, norm=self.norm
                )(x, train)
        return x


class FoldedHead(nn.Module):
    """ConvBlock(s1) → Conv(f²·out_ch) → depth-to-space(f) → logits."""

    features: int
    out_channels: int
    fold: int = 4
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    output_logit_bias: Optional[float] = None
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = ConvBlock(
            self.features, dtype=self.dtype, bn_axis_name=self.bn_axis_name, stride=1, norm=self.norm
        )(x, train)
        x = nn.Conv(
            self.fold * self.fold * self.out_channels,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding="SAME",
            kernel_init=_xavier,
            # unfolds onto output pixels, so this IS the output-logit bias
            # (see models/vae.py _logit_bias_init)
            bias_init=_logit_bias_init(self.output_logit_bias),
            dtype=self.dtype,
        )(x)
        return _depth_to_space(x, self.fold, self.out_channels)


class FoldedVAE(VanillaVAE):
    """VanillaVAE with the folded compute layout (see module docstring).

    Inherits the full interface — ``encode``/``decode``/``reparameterize``
    /``loss`` contract, latent head shapes, crop rule — and swaps the
    conv stacks. ``stem``/``head``/``torch_compat`` do not apply here.
    """

    fold: int = 4

    name_tag = "FoldedVAE"

    @property
    def decoded_size(self) -> int:
        n_up = len(self.hidden_dims) - _log2_int(self.fold)
        return self.last_conv_size * (2**n_up) * self.fold

    def setup(self):
        if self.torch_compat or self.stem != "conv" or self.head != "deconv":
            raise ValueError("FoldedVAE has its own layout; stem/head/torch_compat do not apply")
        if self.fold < 2:
            # the head's depth-to-space provides the final ×fold upsample;
            # at fold=1 the decoder would come out one stage short of
            # decoded_size (use VanillaVAE for the unfolded layout)
            raise ValueError(f"FoldedVAE needs fold >= 2, got {self.fold}")
        if self.input_dim % self.fold:
            raise ValueError(f"input_dim={self.input_dim} not divisible by fold={self.fold}")
        rev = tuple(reversed(self.hidden_dims))
        # see VanillaVAE.setup: train bool is static argnum 2 under nn.remat
        enc_cls = nn.remat(FoldedEncoder, static_argnums=(2,)) if self.remat else FoldedEncoder
        dec_cls = nn.remat(FoldedDecoder, static_argnums=(2,)) if self.remat else FoldedDecoder
        head_cls = nn.remat(FoldedHead, static_argnums=(2,)) if self.remat else FoldedHead
        self.encoder = enc_cls(
            self.hidden_dims, fold=self.fold, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name, norm=self.norm,
        )
        self.fc_mu = nn.Dense(self.latent_dim, kernel_init=_xavier, bias_init=nn.initializers.zeros, dtype=self.dtype)
        self.fc_var = nn.Dense(self.latent_dim, kernel_init=_xavier, bias_init=nn.initializers.zeros, dtype=self.dtype)
        self.decoder_input = nn.Dense(
            self.flattened_size, kernel_init=_xavier, bias_init=nn.initializers.zeros, dtype=self.dtype
        )
        self.decoder = dec_cls(
            rev, fold=self.fold, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name, norm=self.norm,
        )
        self.final_layer = head_cls(
            rev[-1],
            self.out_channels or self.in_channels,
            fold=self.fold,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            output_logit_bias=self.output_logit_bias,
            norm=self.norm,
        )
