"""Convolutional VAE, designed TPU-first.

Capability match for the reference ``VanillaVAE``
(``midi_autoencoder/models.py:7-272``): 4-stage stride-2 conv encoder
(Conv + BatchNorm + LeakyReLU, channels ``[32, 64, 128, 256]``,
models.py:40-51), linear ``fc_mu``/``fc_var`` heads (models.py:55-56),
linear ``decoder_input`` + 3-stage transposed-conv decoder
(models.py:59-74), and a final ConvTranspose + BN + LeakyReLU + Conv +
Sigmoid stage (models.py:76-83), with Xavier-uniform weight init
(models.py:231).

TPU-native design differences (deliberate, not omissions):

- **NHWC layout** end to end: the TPU conv units want channels-last;
  no transposes anywhere on the hot path.
- **Computed feature-map sizes.** The reference hardcodes the post-encoder
  spatial size (models.py:33) and the decoder reshape (models.py:166),
  so it only works at 32 px input. We compute both, supporting 28/32/128
  px (SURVEY §5 "remove the 32px hardcode"). When the input size is not a
  multiple of ``2**num_stages`` the decoder output is center-cropped to
  the input size.
- **Logit outputs.** The model also returns pre-sigmoid logits so the
  ELBO can use fused, numerically-stable sigmoid cross-entropy
  (see ``losses/elbo.py``). ``output`` stays the sigmoid probability map
  for parity with models.py:81.
- **out_channels defaults to in_channels** (the reference hardcodes one
  output channel at models.py:80, which silently breaks 3-channel
  inputs — a bug we do not replicate).
- **BatchNorm cross-replica semantics** are explicit: under jit
  auto-partitioning with a batch-sharded input, XLA computes global batch
  statistics (synced BN). ``bn_axis_name`` exists for explicit
  ``shard_map`` usage.
- Configurable compute ``dtype`` (bfloat16 on TPU) with float32 params.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from midi_vae_tpu.core.types import EncoderOutput, ModelOutput


def trace_range(verbose: bool, name: str, x: jax.Array) -> None:
    """Verbose forward tracing (reference: ``models.py:126-173``).

    The reference prints shape/min/max at each forward stage under its
    ``verbose`` flag — host-side prints that force device syncs every
    call. The jit-safe equivalent: shapes are static (formatted at trace
    time), value ranges stream through ``jax.debug.print`` without
    breaking the compiled program. Zero ops inserted when ``verbose`` is
    falsy.
    """
    if not verbose:
        return
    jax.debug.print(
        name + " shape=" + str(tuple(x.shape)) + " min={mn} max={mx}",
        mn=jnp.min(x).astype(jnp.float32),
        mx=jnp.max(x).astype(jnp.float32),
    )


def label_kwarg(y) -> dict:
    """``{"y": y}`` when labels exist, else ``{}`` — the one shared rule for
    forwarding CVAE labels into ``model.apply``: unconditional models
    (including duck-typed test models without a ``y`` parameter) must
    never see the kwarg. Used by evaluation, IWAE, serving, and AOT
    export so the forward-labels-only-when-present contract lives in
    exactly one place."""
    return {} if y is None else {"y": y}


def conv_output_size(dim: int, num_layers: int, stride: int = 2) -> int:
    """Spatial size after ``num_layers`` stride-2 SAME convolutions.

    Equivalent of the reference's ``_compute_conv_output_size``
    (models.py:85-105), which is defined but bypassed by a hardcode
    (models.py:33). PyTorch Conv2d(k=3, s=2, p=1) gives ceil(n/2), the
    same as XLA SAME padding, so one formula serves both frameworks.
    """
    for _ in range(num_layers):
        dim = -(-dim // stride)
    return dim


_xavier = nn.initializers.xavier_uniform()


def _logit_bias_init(value: Optional[float]):
    """Bias initializer for the decoder's output-logit conv/dense layer.

    ``None`` → zeros (reference parity: σ(0) = 0.5 initial output).
    A float → constant init, normally the corpus base-rate logit
    ``log(p/(1-p))`` so the decoder STARTS at the corpus mean instead of
    having to descend into the all-silence attractor to find it — the
    standard anti-collapse init for sparse (~98% empty) BCE targets
    (RESULTS.md "posterior collapse on sparse MIDI"). Only the output
    layer's bias is touched; everything else stays Xavier/zeros.
    """
    return nn.initializers.zeros if value is None else nn.initializers.constant(value)


def _gn_groups(channels: int, target: int = 32) -> int:
    """Largest group count ≤ ``target`` that divides ``channels``."""
    g = min(target, channels)
    while channels % g:
        g -= 1
    return g


class SubsampledBatchNorm(nn.Module):
    """BatchNorm whose TRAINING statistics come from a strided batch
    subsample (``x[::stride]``) while the normalization applies to the
    full batch — a measured MFU lever (round 4).

    Rationale: the BN statistics pass is a full re-read of every conv
    output (HBM-bound; ``benchmarks/norm_bench.json`` prices all of
    BatchNorm at 12.6% of flagship wall throughput). At flagship batch
    2048, a stride-4 subsample still estimates each channel's mean/var
    from ~10⁵ elements (SEM under 0.4% of σ) but reads a quarter of the
    bytes. Eval-mode behavior (running averages, momentum 0.9, ε 1e-5)
    is IDENTICAL to the ``"batch"`` path; under a mesh axis the
    subsample statistics are ``pmean``-ed cross-replica exactly like
    flax BN. Quality is gated in ``benchmarks/quality_check.py``
    (``fold8m_bnsub4`` variant) like every architecture variant.
    """

    stride: int = 4
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_running_average: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xs = x[::self.stride].astype(jnp.float32)
            mean = xs.mean(axis=(0, 1, 2))
            # biased variance over the subsample (flax BN convention)
            var = (xs * xs).mean(axis=(0, 1, 2)) - mean * mean
            if self.axis_name is not None:
                # pooled subsample stats: E[x²] from the LOCAL moments first,
                # then global mean — var_global = E[x²] − E[x]²
                ex2 = jax.lax.pmean(var + mean * mean, self.axis_name)
                mean = jax.lax.pmean(mean, self.axis_name)
                var = ex2 - mean * mean
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        # apply as ONE in-dtype FMA: fold {mean, var, scale, bias} into
        # per-channel (a, b) in f32 first — upcasting the whole activation
        # to f32 would double the apply pass's HBM traffic
        a = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * a
        return x.astype(self.dtype) * a.astype(self.dtype) + b.astype(self.dtype)


def _apply_norm(
    x: jax.Array, *, norm: str, dtype: Any, bn_axis_name: Optional[str], train: bool
) -> jax.Array:
    """The conv blocks' normalization sublayer, by name.

    ``"batch"`` is the reference-parity default (BatchNorm2d semantics,
    models.py:46). ``"group"`` (GroupNorm, no running statistics, no
    cross-replica dependence) and ``"none"`` exist as measured
    alternatives. Measured on the flagship step (benchmarks/
    norm_bench.json): BatchNorm costs 12.6% of wall throughput vs no
    norm (193.0k → 217.2k samples/sec/chip), while GroupNorm is
    slightly SLOWER than BatchNorm (189.8k) — its per-sample
    normalization fuses worse than BN's batch-wide stats on this
    program. ``"batch-subN"`` (e.g. ``batch-sub4``) computes training
    statistics from a stride-N batch subsample (see
    :class:`SubsampledBatchNorm`) — the round-4 MFU swing at the BN
    statistics pass. Called from the blocks' ``@nn.compact`` methods,
    so the created submodule auto-names exactly as the previous inline
    ``nn.BatchNorm`` did — existing checkpoints load unchanged.
    """
    if norm == "batch":
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # torch BatchNorm2d momentum=0.1 ⇒ flax momentum = 1 - 0.1
            epsilon=1e-5,
            axis_name=bn_axis_name if train else None,
            dtype=dtype,
        )(x)
    if norm.startswith("batch-sub"):
        return SubsampledBatchNorm(
            stride=int(norm[len("batch-sub"):]),
            use_running_average=not train,
            axis_name=bn_axis_name if train else None,
            dtype=dtype,
        )(x)
    if norm == "group":
        return nn.GroupNorm(num_groups=_gn_groups(x.shape[-1]), epsilon=1e-5, dtype=dtype)(x)
    if norm == "none":
        return x
    raise ValueError(f"unknown norm: {norm!r} (batch|batch-subN|group|none)")


class TorchConvTranspose(nn.Module):
    """Bit-exact torch ``ConvTranspose2d(k3, s2, p1, output_padding=1)``.

    Expressed as the dilated convolution it mathematically is: insert
    s-1 zeros between input rows/cols, pad ``(k-1-p, k-1-p+op)`` =
    ``(1, 2)`` per spatial dim, and convolve with the spatially-flipped
    kernel. Kernel is stored HWIO *unflipped* (same shape/layout as
    ``nn.ConvTranspose``) and flipped at apply time, so a torch weight
    imports as a plain ``W.transpose(2, 3, 0, 1)``.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.param("kernel", _xavier, (3, 3, x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.flip(k, (0, 1)).astype(self.dtype),
            window_strides=(1, 1),
            padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(self.dtype)


class ConvBlock(nn.Module):
    """Conv(k3, s2, SAME) + BatchNorm + LeakyReLU (reference: models.py:43-49).

    ``torch_compat=True`` uses the reference's exact padding arithmetic
    (symmetric (1,1), which for even sizes aligns windows one pixel
    earlier than XLA SAME) so torch-trained reference weights reproduce
    bit-level activations — the migration/parity mode.
    """

    features: int
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    torch_compat: bool = False
    stride: int = 2
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.Conv(
            self.features,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)) if self.torch_compat else "SAME",
            kernel_init=_xavier,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)
        x = _apply_norm(
            x, norm=self.norm, dtype=self.dtype, bn_axis_name=self.bn_axis_name, train=train
        )
        return nn.leaky_relu(x, negative_slope=0.01)


class DeconvBlock(nn.Module):
    """ConvTranspose(k3, s2) + BatchNorm + LeakyReLU (reference: models.py:64-72).

    PyTorch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) exactly
    doubles the spatial size; XLA SAME-padded conv_transpose with stride
    2 does the same, so sizes line up without the off-by-one hazards
    noted in SURVEY §7.
    """

    features: int
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    torch_compat: bool = False
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.torch_compat:
            # same param tree name/shape as the SAME-padded path
            x = TorchConvTranspose(self.features, dtype=self.dtype, name="ConvTranspose_0")(x)
        else:
            x = nn.ConvTranspose(
                self.features,
                kernel_size=(3, 3),
                strides=(2, 2),
                padding="SAME",
                kernel_init=_xavier,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
            )(x)
        x = _apply_norm(
            x, norm=self.norm, dtype=self.dtype, bn_axis_name=self.bn_axis_name, train=train
        )
        return nn.leaky_relu(x, negative_slope=0.01)


class S2DStem(nn.Module):
    """Space-to-depth stem: fold 2×2 spatial blocks into channels, then a
    stride-1 conv — same [B, H/2, W/2, features] output as the stride-2
    ConvBlock it replaces.

    MXU rationale (docs/DESIGN.md "known headroom"): the reference stem
    convolves a 1-channel input, so the systolic array contracts over
    k·k·C_in = 9 values — a sliver of its 128-wide dimension. Folding
    2×2 blocks quadruples C_in (contracting dim 36) at identical output
    shape. Opt-in (``stem="s2d"``); the reference-parity architecture
    stays the default.
    """

    features: int
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            raise ValueError(f"s2d stem needs even spatial dims, got {h}x{w}")
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.Conv(
            self.features,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding="SAME",
            kernel_init=_xavier,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)
        x = _apply_norm(
            x, norm=self.norm, dtype=self.dtype, bn_axis_name=self.bn_axis_name, train=train
        )
        return nn.leaky_relu(x, negative_slope=0.01)


class Encoder(nn.Module):
    """Stride-2 conv stack (reference: models.py:40-51)."""

    hidden_dims: Sequence[int]
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    torch_compat: bool = False
    stem: str = "conv"  # "conv" (reference parity) | "s2d" (space-to-depth)
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        for i, h in enumerate(self.hidden_dims):
            if i == 0 and self.stem == "s2d":
                x = S2DStem(
                    h, dtype=self.dtype, bn_axis_name=self.bn_axis_name, norm=self.norm
                )(x, train)
            else:
                x = ConvBlock(
                    h, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                    torch_compat=self.torch_compat, norm=self.norm,
                )(x, train)
        return x


class Decoder(nn.Module):
    """Transposed-conv stack, mirror of the encoder (reference: models.py:62-74)."""

    hidden_dims: Sequence[int]  # reversed order, e.g. (256, 128, 64, 32)
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    torch_compat: bool = False
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        for h in self.hidden_dims[1:]:
            x = DeconvBlock(
                h, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                torch_compat=self.torch_compat, norm=self.norm,
            )(x, train)
        return x


class FinalLayer(nn.Module):
    """ConvTranspose + BN + LeakyReLU + Conv → logits (reference: models.py:76-83).

    Returns *logits*; the sigmoid (models.py:81) is applied by the caller
    so the loss can consume logits directly.
    """

    features: int
    out_channels: int
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    torch_compat: bool = False
    output_logit_bias: Optional[float] = None
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = DeconvBlock(
            self.features, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
            torch_compat=self.torch_compat, norm=self.norm,
        )(x, train)
        return nn.Conv(
            self.out_channels,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding="SAME",
            kernel_init=_xavier,
            bias_init=_logit_bias_init(self.output_logit_bias),
            dtype=self.dtype,
        )(x)


class D2SHead(nn.Module):
    """Depth-to-space decoder head: all compute at HALF the output
    resolution, then a free pixel-shuffle to full size.

    Motivation (benchmarks/layer_profile.py, round 2): the reference
    head — ConvTranspose to 128², BN+LeakyReLU at 128², Conv at 128² —
    accounts for ≈45% of forward time, with each piece running 3-6×
    above its HBM roofline; the full-resolution 128²×32 activations are
    the step's real bottleneck. This head computes the same
    conv→BN→LeakyReLU→conv shape family at 64² and rearranges 2×2×C
    channel blocks into pixels (depth-to-space), so no 128²×32 tensor
    ever exists. Opt-in (``head="d2s"``); the reference-parity head
    stays the default.
    """

    features: int
    out_channels: int
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    output_logit_bias: Optional[float] = None
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.Conv(
            self.features,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding="SAME",
            kernel_init=_xavier,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
        )(x)
        x = _apply_norm(
            x, norm=self.norm, dtype=self.dtype, bn_axis_name=self.bn_axis_name, train=train
        )
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = nn.Conv(
            4 * self.out_channels,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding="SAME",
            kernel_init=_xavier,
            # every channel block lands on output pixels after the shuffle,
            # so a constant bias here IS the output-logit bias
            bias_init=_logit_bias_init(self.output_logit_bias),
            dtype=self.dtype,
        )(x)
        b, h, w, _ = x.shape
        x = x.reshape(b, h, w, 2, 2, self.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, self.out_channels)
        return x  # logits


class VanillaVAE(nn.Module):
    """Convolutional VAE over NHWC piano-roll images.

    Parameters mirror the reference constructor (models.py:10-25):
    ``in_channels``, ``latent_dim`` (= ``embed_dim``), ``input_dim``,
    ``hidden_dims``. The loss weight lives in the loss, not the model.
    """

    in_channels: int = 1
    latent_dim: int = 10
    input_dim: int = 32
    hidden_dims: Sequence[int] = (32, 64, 128, 256)
    out_channels: Optional[int] = None  # defaults to in_channels
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    fused_reparam: bool = False  # use the Pallas on-core-PRNG reparam kernel
    # Reference-exact padding arithmetic (bit-level activation parity with
    # torch-trained weights — see interop/torch_import.py). The TPU-native
    # SAME padding is the default; param trees are structurally identical
    # across the two modes but NOT numerically interchangeable.
    torch_compat: bool = False
    # Encoder stem: "conv" (reference parity) or "s2d" (space-to-depth fold
    # before the first conv — fills the MXU contracting dim, see S2DStem).
    stem: str = "conv"
    # Decoder head: "deconv" (reference parity) or "d2s" (depth-to-space —
    # kills the full-resolution activation tensors, see D2SHead).
    head: str = "deconv"
    # Conv-block normalization: "batch" (reference parity, BatchNorm2d
    # semantics), "group" (GroupNorm — no running stats, no cross-replica
    # coupling), or "none". See _apply_norm for the TPU cost rationale.
    norm: str = "batch"
    # Verbose forward range tracing (reference models.py:126-173) via
    # jax.debug.print — jit-safe, zero cost when off.
    verbose: bool = False
    # Initialize the output-logit layer's bias to this constant (normally
    # the corpus base-rate logit log(p/(1-p)); see _logit_bias_init).
    # None = zeros, reference parity.
    output_logit_bias: Optional[float] = None
    # Rematerialization: recompute the conv stacks' activations during the
    # backward pass instead of storing them (jax.checkpoint via nn.remat) —
    # trades ~1 extra forward of FLOPs for an ~N× drop in peak activation
    # memory. Enables much larger per-chip batches (--remat; pairs with
    # --grad-accum). No reference equivalent (torch would use
    # torch.utils.checkpoint).
    remat: bool = False
    # Conditional VAE (Sohn et al. 2015): > 0 turns the model into a CVAE
    # over that many classes — q(z|x,y) and p(x|z,y). The label enters as a
    # one-hot concatenated at the DENSE bottleneck (encoder features before
    # fc_mu/fc_var, and z before decoder_input), not as spatial label
    # planes: the conditioning costs O(latent·classes) FLOPs instead of
    # O(H·W·classes) extra HBM traffic per conv — the TPU-first choice.
    # The reference parses class counts (datasets.py:17-62) but never uses
    # labels; this is a capability extension (no reference equivalent).
    num_classes: int = 0

    name_tag = "VanillaVAE"

    @property
    def last_conv_size(self) -> int:
        return conv_output_size(self.input_dim, len(self.hidden_dims))

    @property
    def flattened_size(self) -> int:
        return self.last_conv_size * self.last_conv_size * self.hidden_dims[-1]

    @property
    def decoded_size(self) -> int:
        """Spatial size produced by the decoder before cropping."""
        return self.last_conv_size * (2 ** len(self.hidden_dims))

    def setup(self):
        rev = tuple(reversed(self.hidden_dims))
        if self.torch_compat and (self.stem != "conv" or self.head != "deconv"):
            raise ValueError("torch_compat requires the reference stem and head")
        if self.torch_compat and self.norm != "batch":
            raise ValueError("torch_compat requires norm='batch' (reference BatchNorm2d parity)")
        if self.torch_compat and self.num_classes > 0:
            raise ValueError(
                "torch_compat is the reference-parity mode; the reference has no conditional "
                "variant (num_classes widens the latent-head/decoder-input layers)"
            )
        # nn.remat argnums count the module instance as 0, so the `train`
        # bool of __call__(self, x, train) is static argnum 2.
        enc_cls = nn.remat(Encoder, static_argnums=(2,)) if self.remat else Encoder
        dec_cls = nn.remat(Decoder, static_argnums=(2,)) if self.remat else Decoder
        fin_cls = nn.remat(FinalLayer, static_argnums=(2,)) if self.remat else FinalLayer
        d2s_cls = nn.remat(D2SHead, static_argnums=(2,)) if self.remat else D2SHead
        self.encoder = enc_cls(
            self.hidden_dims,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            torch_compat=self.torch_compat,
            stem=self.stem,
            norm=self.norm,
        )
        self.fc_mu = nn.Dense(self.latent_dim, kernel_init=_xavier, bias_init=nn.initializers.zeros, dtype=self.dtype)
        self.fc_var = nn.Dense(self.latent_dim, kernel_init=_xavier, bias_init=nn.initializers.zeros, dtype=self.dtype)
        self.decoder_input = nn.Dense(
            self.flattened_size, kernel_init=_xavier, bias_init=nn.initializers.zeros, dtype=self.dtype
        )
        self.decoder = dec_cls(
            rev, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
            torch_compat=self.torch_compat, norm=self.norm,
        )
        if self.head == "d2s":
            self.final_layer = d2s_cls(
                rev[-1],
                self.out_channels or self.in_channels,
                dtype=self.dtype,
                bn_axis_name=self.bn_axis_name,
                output_logit_bias=self.output_logit_bias,
                norm=self.norm,
            )
        else:
            self.final_layer = fin_cls(
                rev[-1],
                self.out_channels or self.in_channels,
                dtype=self.dtype,
                bn_axis_name=self.bn_axis_name,
                torch_compat=self.torch_compat,
                output_logit_bias=self.output_logit_bias,
                norm=self.norm,
            )

    def _class_onehot(self, y: Optional[jax.Array], where: str) -> jax.Array:
        """Validated one-hot of the class labels for CVAE conditioning."""
        if y is None:
            raise ValueError(
                f"{self.name_tag}(num_classes={self.num_classes}) is conditional: "
                f"{where} requires labels y (int [B])"
            )
        return jax.nn.one_hot(y, self.num_classes, dtype=self.dtype)

    def encode(self, x: jax.Array, train: bool = False, y: Optional[jax.Array] = None) -> EncoderOutput:
        """Conv stack → flatten → (mu, log_var) (reference: models.py:107-145).

        With ``num_classes > 0`` the one-hot label joins the flattened
        features before the latent heads (q(z|x,y)); ``pre_latents``
        stays the un-conditioned conv features. Unconditional models
        ignore ``y``, so callers may pass labels uniformly.
        """
        trace_range(self.verbose, "encode/input", x)
        h = self.encoder(x, train)
        trace_range(self.verbose, "encode/conv_out", h)
        h = h.reshape(h.shape[0], -1)
        hc = (
            jnp.concatenate([h, self._class_onehot(y, "encode")], axis=-1)
            if self.num_classes > 0
            else h
        )
        mu = self.fc_mu(hc)
        log_var = self.fc_var(hc)
        trace_range(self.verbose, "encode/mu", mu)
        trace_range(self.verbose, "encode/log_var", log_var)
        return EncoderOutput(mu=mu, log_var=log_var, pre_latents=h)

    def decode_logits(self, z: jax.Array, train: bool = False, y: Optional[jax.Array] = None) -> jax.Array:
        """Latents → reconstruction logits (reference: models.py:147-175).

        The decoder naturally produces ``decoded_size``²; if the model's
        input size is not a power-of-two multiple (e.g. 28 px), the output
        is center-cropped — the reference simply crashes in that case
        because of its 32 px hardcode (train.py:105).
        """
        s = self.last_conv_size
        trace_range(self.verbose, "decode/latents", z)
        if self.num_classes > 0:
            # p(x|z,y): the label conditions the decoder at its dense input
            z = jnp.concatenate([z.astype(self.dtype), self._class_onehot(y, "decode")], axis=-1)
        h = self.decoder_input(z)
        h = h.reshape(-1, s, s, self.hidden_dims[-1])
        trace_range(self.verbose, "decode/decoder_input", h)
        h = self.decoder(h, train)
        trace_range(self.verbose, "decode/deconv_out", h)
        logits = self.final_layer(h, train)
        trace_range(self.verbose, "decode/logits", logits)
        d = self.decoded_size
        if d != self.input_dim:
            off = (d - self.input_dim) // 2
            logits = jax.lax.dynamic_slice_in_dim(logits, off, self.input_dim, axis=1)
            logits = jax.lax.dynamic_slice_in_dim(logits, off, self.input_dim, axis=2)
        return logits

    def decode(self, z: jax.Array, train: bool = False, y: Optional[jax.Array] = None) -> jax.Array:
        """Latents → reconstruction probabilities (sigmoid of logits)."""
        return jax.nn.sigmoid(self.decode_logits(z, train, y=y))

    def reparameterize(self, mu: jax.Array, log_var: jax.Array) -> jax.Array:
        """z = mu + eps·exp(log_var/2), eps ~ N(0, I) (reference: models.py:177-183).

        Uses the module's ``reparam`` RNG stream — the TPU-native
        replacement for ``torch.randn_like`` device RNG. With
        ``fused_reparam=True`` the draw happens inside the Pallas kernel
        (``ops/fused_elbo.py``) with the on-core PRNG seeded from the
        same stream.
        """
        key = self.make_rng("reparam")
        if self.fused_reparam:
            from midi_vae_tpu.ops.fused_elbo import fused_reparam_kl

            seed = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
            z, _ = fused_reparam_kl(mu, log_var, seed)
            return z
        eps = jax.random.normal(key, mu.shape, dtype=mu.dtype)
        return mu + eps * jnp.exp(0.5 * log_var)

    def __call__(self, x: jax.Array, train: bool = False, y: Optional[jax.Array] = None) -> ModelOutput:
        """Full forward pass (reference: models.py:185-188).

        ``y`` (int labels [B]) is required when ``num_classes > 0`` and
        ignored otherwise.
        """
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

    def sample_latents(self, num_samples: int) -> jax.Array:
        """z ~ N(0, I) prior draws (reference: models.py:250-263)."""
        key = self.make_rng("sample")
        return jax.random.normal(key, (num_samples, self.latent_dim), dtype=jnp.float32)

    def generate(self, x: jax.Array, y: Optional[jax.Array] = None) -> jax.Array:
        """Reconstruct inputs (reference: models.py:265-272)."""
        return self(x, train=False, y=y).output


def param_group_label(path: tuple, _leaf=None) -> str:
    """Map a parameter path to its optimizer group.

    The reference builds per-component param groups for distinct encoder/
    decoder learning rates (train.py:210-225) — but accidentally omits
    ``fc_mu``/``fc_var``/``decoder_input``/``final_layer`` from *any*
    group, so those parameters are never optimized (and are also dropped
    from checkpoints, train.py:445-451). We do not replicate that bug:
    the latent heads train with the encoder group, and everything from
    ``decoder_input`` onward trains with the decoder group.
    """
    top = str(getattr(path[0], "key", path[0]))
    # prefix match, not equality: flax auto-names list-valued setup
    # attributes "encoder_0", "encoder_1", ... (MLPVAE's dense stacks),
    # and an exact match silently filed those under the decoder group —
    # --freeze-encoder / --lr-encoder-mult applied to the wrong layers
    if top == "encoder" or top.startswith("encoder_") or top in ("fc_mu", "fc_var"):
        return "encoder"
    return "decoder"


def init_stats(params) -> dict:
    """Per-tensor weight-init statistics (reference: models.py:238-247).

    The reference prints mean/std/min/max/norm per weight after init
    (over a stale loop variable — models.py:239 iterates only the last
    module; we report all of them). Returned as a dict for logging
    rather than printed, so the trainer decides verbosity.
    """
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(getattr(p, "key", str(p)) for p in path)
        if "kernel" not in name and "scale" not in name:
            continue
        arr = jax.device_get(leaf)
        out[name] = {
            "shape": tuple(arr.shape),
            "mean": float(arr.mean()),
            "std": float(arr.std()),
            "min": float(arr.min()),
            "max": float(arr.max()),
            "norm": float(math.sqrt((arr.astype("float64") ** 2).sum())),
        }
    return out
