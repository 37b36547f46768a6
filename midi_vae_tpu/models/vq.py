"""VQ-VAE: vector-quantized discrete latents over piano rolls.

Capability extension — the reference implements only the Gaussian
``VanillaVAE`` (midi_autoencoder/models.py:7-272); discrete latents
(van den Oord et al. 2017, "Neural Discrete Representation Learning")
are the natural fit for the target domain: a piano-roll cell is on or
off, and a grid of codebook indices is a compact symbolic music
representation. The conv trunk reuses the existing TPU-native stages
(``models/vae.py``: NHWC, SAME padding, computed sizes), so throughput
characteristics carry over; only the bottleneck differs.

TPU-first design choices:

- **EMA codebook** (Appendix A.1 of the paper): the codebook learns by
  exponential moving averages of cluster statistics, not gradients —
  the stats ride the existing ``batch_stats`` mutable collection, so
  every already-built code path (jitted train step, grad-accum scan,
  device-resident epoch scan, shard_map step, checkpoints, serving)
  carries them with zero new plumbing.
- **Distances on the MXU**: the nearest-code search is one
  ``[N, D] x [D, K]`` matmul plus rank-1 norms — batched, bf16-input,
  f32-accumulated — instead of an ``[N, K, D]`` broadcast subtract that
  would materialize N·K·D elements in HBM.
- **Cross-replica statistics**: under jit auto-partitioning the EMA
  update sees the global batch (XLA inserts the collectives); under the
  explicit ``shard_map`` step the per-shard cluster sums are ``psum``'d
  over ``bn_axis_name`` — the same axis contract BatchNorm uses — so
  both step implementations produce identical codebooks.
- **f32 quantizer math** regardless of the model compute dtype: bf16
  distances mis-rank near-ties and bf16 EMA accumulators lose counts;
  the decoder consumes the quantized vectors cast back to the compute
  dtype.

Training objective: see ``losses/vq.py`` (reconstruction + commitment;
the codebook term is replaced by the EMA updates here).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from midi_vae_tpu.core.types import EncoderOutput, ModelOutput
from midi_vae_tpu.models.vae import (
    D2SHead,
    Decoder,
    Encoder,
    FinalLayer,
    _xavier,
    conv_output_size,
)


class VectorQuantizerEMA(nn.Module):
    """Nearest-code quantizer with EMA codebook updates.

    Variables (collection ``batch_stats`` — mutable in the train step,
    checkpointed with the model, replicated like BN running stats):

    - ``codebook`` [K, D]: current embedding vectors
    - ``cluster_size`` [K]: EMA of per-code assignment counts
    - ``embed_avg`` [K, D]: EMA of per-code assigned-vector sums

    ``codebook = embed_avg / laplace(cluster_size)`` after each update
    (Laplace smoothing keeps dead codes finite). Quantization uses the
    codebook from *before* this batch's update, the paper's ordering.
    """

    num_codes: int = 512
    embed_dim: int = 16
    decay: float = 0.99
    epsilon: float = 1e-5
    axis_name: Optional[str] = None  # psum axis for explicit shard_map steps

    def setup(self):
        K, D = self.num_codes, self.embed_dim
        # setup (not compact) so embed()/usage_probs() can read the
        # variables without a __call__ having run in the same trace
        self.codebook = self.variable(
            "batch_stats", "codebook",
            lambda: jax.random.normal(self.make_rng("params"), (K, D), jnp.float32),
        )
        # ones (not zeros): with embed_avg initialized to the codebook this
        # makes codebook == embed_avg / cluster_size exactly self-consistent
        # at init. Zero counts would make the FIRST update divide the decayed
        # embed_avg by ~(1-decay)·counts and inflate the codebook ~1/(1-decay)×
        # — the classic EMA-VQ cold-start blow-up.
        self.cluster_size = self.variable(
            "batch_stats", "cluster_size", lambda: jnp.ones((K,), jnp.float32)
        )
        self.embed_avg = self.variable(
            "batch_stats", "embed_avg", lambda: jnp.array(self.codebook.value)
        )

    def __call__(self, z_e: jax.Array, train: bool):
        """Quantize ``z_e`` [..., D] → (straight-through z_q [..., D], indices [...]).

        ``train=True`` (with ``batch_stats`` mutable) also applies one EMA
        codebook update from this batch's assignments.
        """
        K, D = self.num_codes, self.embed_dim
        flat = z_e.reshape(-1, D).astype(jnp.float32)  # [N, D]
        cb = self.codebook.value  # [K, D] f32
        # ||z - e||² = ||z||² − 2 z·eᵀ + ||e||²; the cross term is the MXU matmul
        d2 = (
            jnp.sum(flat * flat, axis=1, keepdims=True)
            - 2.0 * flat @ cb.T
            + jnp.sum(cb * cb, axis=1)[None, :]
        )  # [N, K]
        idx = jnp.argmin(d2, axis=1)  # [N]
        z_q = jnp.take(cb, idx, axis=0)  # [N, D]

        if train and not self.is_initializing() and self.is_mutable_collection("batch_stats"):
            onehot = jax.nn.one_hot(idx, K, dtype=jnp.float32)  # [N, K]
            counts = jnp.sum(onehot, axis=0)  # [K]
            dw = onehot.T @ flat  # [K, D]
            if self.axis_name is not None:
                counts = jax.lax.psum(counts, self.axis_name)
                dw = jax.lax.psum(dw, self.axis_name)
            d = jnp.float32(self.decay)
            new_cs = self.cluster_size.value * d + counts * (1.0 - d)
            new_ea = self.embed_avg.value * d + dw * (1.0 - d)
            n = jnp.sum(new_cs)
            smoothed = (new_cs + self.epsilon) / (n + K * self.epsilon) * n
            self.cluster_size.value = new_cs
            self.embed_avg.value = new_ea
            self.codebook.value = new_ea / smoothed[:, None]

        z_q = z_q.reshape(z_e.shape)
        # straight-through: forward value is z_q, gradient flows to z_e
        z_st = z_e.astype(jnp.float32) + jax.lax.stop_gradient(z_q - z_e.astype(jnp.float32))
        return z_st, idx.reshape(z_e.shape[:-1])

    def embed(self, idx: jax.Array) -> jax.Array:
        """Code indices [...] → codebook vectors [..., D]."""
        return jnp.take(self.codebook.value, idx.reshape(-1), axis=0).reshape(
            *idx.shape, self.embed_dim
        )

    def usage_probs(self) -> jax.Array:
        """EMA code-usage marginal [K] (uniform before any update)."""
        cs = self.cluster_size.value
        total = jnp.sum(cs)
        return jnp.where(
            total > 0, cs / jnp.maximum(total, 1e-9), jnp.full_like(cs, 1.0 / self.num_codes)
        )


class VQVAE(nn.Module):
    """Convolutional VQ-VAE over NHWC piano-roll images.

    Same conv trunk geometry as ``VanillaVAE`` (stride-2 encoder stack,
    mirrored deconv decoder, models/vae.py); the Gaussian bottleneck
    (fc_mu/fc_var + reparameterization) is replaced by 1×1 projections
    around a ``VectorQuantizerEMA``, keeping the latent SPATIAL: a
    ``[s, s]`` grid of code indices, s = input_dim / 2^stages.

    API parity with the other families: ``encode`` returns an
    ``EncoderOutput`` whose ``mu`` is the flattened pre-quantization
    latent (``log_var`` is identically zero — there is no posterior
    variance), ``decode``/``decode_logits`` accept that flattened layout
    and quantize before decoding, so serving, interpolation, and the
    generate CLI work unchanged. Prior sampling draws per-position codes
    from the EMA marginal (``sample``) — see ``sample_codes`` for the
    honest caveat.
    """

    in_channels: int = 1
    latent_dim: int = 16  # embedding dim D of each code vector
    input_dim: int = 32
    hidden_dims: Sequence[int] = (32, 64, 128, 256)
    codebook_size: int = 512
    vq_decay: float = 0.99
    out_channels: Optional[int] = None
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    stem: str = "conv"
    head: str = "deconv"
    norm: str = "batch"
    remat: bool = False
    verbose: bool = False
    output_logit_bias: Optional[float] = None
    num_classes: int = 0  # conditional VQ not supported; validated in setup

    name_tag = "VQVAE"
    latent_kind = "vq"  # dispatch marker (inference.sample_prior, CLIs)

    @property
    def last_conv_size(self) -> int:
        return conv_output_size(self.input_dim, len(self.hidden_dims))

    @property
    def flat_latent_dim(self) -> int:
        """Size of the flattened latent the public encode/decode API carries."""
        return self.last_conv_size * self.last_conv_size * self.latent_dim

    @property
    def decoded_size(self) -> int:
        return self.last_conv_size * (2 ** len(self.hidden_dims))

    def _validate_vq(self):
        if self.num_classes > 0:
            raise ValueError(
                "VQVAE has no conditional variant yet (the label would need to enter "
                "as spatial planes; use --model VanillaVAE for --conditional)"
            )

    def _setup_bottleneck(self):
        """1×1 projections into/out of the code space around the quantizer
        (kept conv so the latent stays spatial — no dense flatten), shared
        by the conv and folded trunks."""
        self.to_latent = nn.Conv(
            self.latent_dim, kernel_size=(1, 1), kernel_init=_xavier,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
        )
        self.quantizer = VectorQuantizerEMA(
            num_codes=self.codebook_size,
            embed_dim=self.latent_dim,
            decay=self.vq_decay,
            axis_name=self.bn_axis_name,
        )
        self.from_latent = nn.Conv(
            self.hidden_dims[-1], kernel_size=(1, 1), kernel_init=_xavier,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
        )

    def setup(self):
        self._validate_vq()
        rev = tuple(reversed(self.hidden_dims))
        enc_cls = nn.remat(Encoder, static_argnums=(2,)) if self.remat else Encoder
        dec_cls = nn.remat(Decoder, static_argnums=(2,)) if self.remat else Decoder
        fin_cls = nn.remat(FinalLayer, static_argnums=(2,)) if self.remat else FinalLayer
        d2s_cls = nn.remat(D2SHead, static_argnums=(2,)) if self.remat else D2SHead
        self.encoder = enc_cls(
            self.hidden_dims, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
            stem=self.stem, norm=self.norm,
        )
        self._setup_bottleneck()
        self.decoder = dec_cls(rev, dtype=self.dtype, bn_axis_name=self.bn_axis_name, norm=self.norm)
        head_cls = d2s_cls if self.head == "d2s" else fin_cls
        self.final_layer = head_cls(
            rev[-1],
            self.out_channels or self.in_channels,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            output_logit_bias=self.output_logit_bias,
            norm=self.norm,
        )

    # -- encoder side ------------------------------------------------------

    def _encode_spatial(self, x: jax.Array, train: bool):
        h = self.encoder(x, train)
        z_e = self.to_latent(h)  # [B, s, s, D]
        return z_e, h

    def encode(self, x: jax.Array, train: bool = False) -> EncoderOutput:
        """Conv stack → 1×1 projection → flattened pre-quantization latent.

        ``mu`` carries the continuous encoder output (the quantity the
        commitment loss pulls toward the codebook); ``log_var`` is zero —
        the posterior is a point mass on the nearest code.
        """
        z_e, h = self._encode_spatial(x, train)
        flat = z_e.astype(jnp.float32).reshape(z_e.shape[0], -1)
        return EncoderOutput(
            mu=flat, log_var=jnp.zeros_like(flat), pre_latents=h.reshape(h.shape[0], -1)
        )

    def encode_indices(self, x: jax.Array) -> jax.Array:
        """Inputs → [B, s, s] int32 codebook indices — the discrete code grid."""
        z_e, _ = self._encode_spatial(x, train=False)
        _, idx = self.quantizer(z_e, train=False)
        return idx.astype(jnp.int32)

    # -- decoder side ------------------------------------------------------

    def _decode_from_spatial(self, z_q: jax.Array, train: bool) -> jax.Array:
        h = self.from_latent(z_q.astype(self.dtype))
        h = self.decoder(h, train)
        logits = self.final_layer(h, train)
        d = self.decoded_size
        if d != self.input_dim:
            off = (d - self.input_dim) // 2
            logits = jax.lax.dynamic_slice_in_dim(logits, off, self.input_dim, axis=1)
            logits = jax.lax.dynamic_slice_in_dim(logits, off, self.input_dim, axis=2)
        return logits

    def decode_logits(self, z: jax.Array, train: bool = False) -> jax.Array:
        """Flattened latent [B, s·s·D] → logits. ``z`` is quantized to the
        nearest codes first (no EMA update), so any continuous point —
        an interpolation between two encodings, a prior draw — decodes
        through the discrete bottleneck the decoder was trained behind."""
        s = self.last_conv_size
        z_sp = z.reshape(-1, s, s, self.latent_dim)
        z_q, _ = self.quantizer(z_sp, train=False)
        return self._decode_from_spatial(z_q, train)

    def decode(self, z: jax.Array, train: bool = False) -> jax.Array:
        return jax.nn.sigmoid(self.decode_logits(z, train))

    def decode_indices(self, idx: jax.Array) -> jax.Array:
        """[B, s, s] int code grid → reconstruction probabilities."""
        z_q = self.quantizer.embed(idx)
        return jax.nn.sigmoid(self._decode_from_spatial(z_q, train=False))

    # -- full forward ------------------------------------------------------

    def __call__(self, x: jax.Array, train: bool = False) -> ModelOutput:
        z_e, h = self._encode_spatial(x, train)
        z_st, _ = self.quantizer(z_e, train)  # EMA update happens here when train
        logits = self._decode_from_spatial(z_st, train)
        flat_e = z_e.astype(jnp.float32).reshape(z_e.shape[0], -1)
        encoded = EncoderOutput(
            mu=flat_e, log_var=jnp.zeros_like(flat_e), pre_latents=h.reshape(h.shape[0], -1)
        )
        return ModelOutput(
            output=jax.nn.sigmoid(logits),
            logits=logits,
            input=x,
            encoded=encoded,
            latents=z_st.reshape(z_st.shape[0], -1),
        )

    def generate(self, x: jax.Array) -> jax.Array:
        return self(x, train=False).output

    # -- prior sampling ----------------------------------------------------

    def sample_codes(self, key: jax.Array, num_samples: int) -> jax.Array:
        """Draw [num, s, s] code grids i.i.d. per position from the EMA
        code-usage marginal.

        This is the built-in prior: honest about what it is — positions
        are independent, so samples have realistic LOCAL texture but no
        long-range structure. A learned autoregressive prior over the
        code grid (the paper's PixelCNN stage) plugs in via
        ``decode_indices``; see ``models/prior.py``.
        """
        probs = self.quantizer.usage_probs()
        s = self.last_conv_size
        return jax.random.categorical(
            key, jnp.log(probs + 1e-20), shape=(num_samples, s, s)
        ).astype(jnp.int32)

    def sample(self, key: jax.Array, num_samples: int) -> jax.Array:
        """Prior samples: marginal code draws → decode. Returns [num, H, W, C]."""
        return self.decode_indices(self.sample_codes(key, num_samples))


class FoldedVQVAE(VQVAE):
    """VQ-VAE on the folded compute layout (``models/folded.py``).

    The TPU-native trunk — space-to-depth fold of the whole input, every
    conv at ≤32² spatial with ≥16 channels — carrying the same discrete
    bottleneck as :class:`VQVAE`: identical quantizer grid (the folded
    encoder's stride plan lands on the same ``input/2^L`` spatial size),
    identical code API, identical objective. Measured rationale: the VQ
    bottleneck costs ~nothing at matched trunk, so the family's
    throughput is set by the trunk layout — this is the fast one
    (benchmarks/RESULTS.md "VQ-VAE").
    """

    fold: int = 4

    name_tag = "FoldedVQVAE"

    @property
    def decoded_size(self) -> int:
        from midi_vae_tpu.models.folded import _log2_int

        n_up = len(self.hidden_dims) - _log2_int(self.fold)
        return self.last_conv_size * (2**n_up) * self.fold

    def setup(self):
        from midi_vae_tpu.models.folded import FoldedDecoder, FoldedEncoder, FoldedHead, _log2_int

        self._validate_vq()
        if self.stem != "conv" or self.head != "deconv":
            raise ValueError("FoldedVQVAE has its own layout; stem/head do not apply")
        if self.fold < 2:
            raise ValueError(f"FoldedVQVAE needs fold >= 2, got {self.fold}")
        if self.input_dim % self.fold:
            raise ValueError(f"input_dim={self.input_dim} not divisible by fold={self.fold}")
        _log2_int(self.fold)  # validates power-of-two
        rev = tuple(reversed(self.hidden_dims))
        enc_cls = nn.remat(FoldedEncoder, static_argnums=(2,)) if self.remat else FoldedEncoder
        dec_cls = nn.remat(FoldedDecoder, static_argnums=(2,)) if self.remat else FoldedDecoder
        head_cls = nn.remat(FoldedHead, static_argnums=(2,)) if self.remat else FoldedHead
        self.encoder = enc_cls(
            self.hidden_dims, fold=self.fold, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name, norm=self.norm,
        )
        self._setup_bottleneck()
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


def codebook_metrics(batch_stats: dict) -> dict:
    """Host-side codebook health from the EMA stats in ``batch_stats``.

    - ``codebook-perplexity``: exp(entropy) of the EMA usage distribution —
      how many codes the encoder effectively uses (1 = collapsed to one
      code, K = perfectly uniform).
    - ``active-codes``: codes holding more than 1% of a uniform share.

    Returns {} when the tree has no quantizer (non-VQ models), so the
    trainer can call it unconditionally.
    """
    import numpy as np

    try:  # plain dict or FrozenDict
        q = batch_stats["quantizer"]
        cs_arr = q["cluster_size"]
    except (KeyError, TypeError, IndexError):
        return {}
    cs = np.asarray(jax.device_get(cs_arr), dtype=np.float64)
    total = cs.sum()
    if total <= 0:
        return {"codebook-perplexity": 0.0, "active-codes": 0}
    p = cs / total
    ent = -np.sum(p * np.log(np.maximum(p, 1e-20)))
    return {
        "codebook-perplexity": float(np.exp(ent)),
        "active-codes": int(np.sum(p > 0.01 / len(cs))),
    }
