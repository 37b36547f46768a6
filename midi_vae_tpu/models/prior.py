"""Autoregressive prior over VQ-VAE code grids (PixelCNN stage).

The second stage of the VQ-VAE pipeline (van den Oord et al. 2017 §3.3,
"Prior"): with the VQ-VAE frozen, a masked-convolution autoregressive
model learns p(codes) over the discrete ``[s, s]`` index grids the
encoder produces, replacing the i.i.d. EMA-marginal sampler
(``models/vq.py:VQVAE.sample_codes``) with a prior that captures the
SPATIAL structure of real code grids — the difference between "piano
rolls with realistic local texture" and "piano rolls with realistic
global structure".

TPU-first design:

- masked convolutions are ordinary XLA convs with a constant-masked
  kernel (the mask multiplies the kernel at apply time — no scatter, no
  dynamic shapes), so the whole log-likelihood step jits into one
  program on the MXU;
- ancestral sampling is a ``lax.scan`` over the s² grid positions with
  a full forward per step — static shapes, one compiled program
  (s² ≤ 64 for every supported geometry: 32 px → 2×2, 128 px → 8×8);
- the code grid enters as one-hot planes [B, s, s, K] so the first conv
  is an MXU contraction over K, not an embedding gather.

Reference: no equivalent (the reference has no discrete models at all —
SURVEY §2 covers only the Gaussian VanillaVAE). PixelCNN masking
follows van den Oord et al. 2016 ("Pixel Recurrent Neural Networks"
§3.4): mask A excludes the center pixel in the first layer, mask B
includes it thereafter.

Class-conditional variant (``num_classes > 0``): p(codes | y), the
construction of van den Oord et al. 2016 ("Conditional Image Generation
with PixelCNN Decoders" eq. 3) adapted to the ReLU-residual stack — a
learned per-class projection enters every masked layer as a
spatially-constant pre-activation bias. The VQ-VAE itself stays
UNCONDITIONAL (its job is compression); class control lives entirely in
the prior, exactly as in van den Oord et al. 2017 §5.1's
class-conditioned ImageNet sampling. One [B, C] one-hot × [C, features]
matmul per layer — negligible next to the masked convs.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from midi_vae_tpu.models.vae import _xavier


def causal_mask(kh: int, kw: int, include_center: bool) -> jnp.ndarray:
    """[kh, kw, 1, 1] raster-order causal mask for a conv kernel.

    Rows above the center are visible; on the center row, positions left
    of center (plus the center itself for mask B) are visible.
    """
    m = jnp.zeros((kh, kw), jnp.float32)
    ch, cw = kh // 2, kw // 2
    m = m.at[:ch, :].set(1.0)
    m = m.at[ch, :cw].set(1.0)
    if include_center:
        m = m.at[ch, cw].set(1.0)
    return m[:, :, None, None]


class MaskedConv(nn.Module):
    """SAME conv whose kernel is multiplied by a raster-order causal mask."""

    features: int
    kernel_size: int = 5
    include_center: bool = False  # False = mask A (first layer), True = mask B
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.param(
            "kernel", _xavier, (self.kernel_size, self.kernel_size, x.shape[-1], self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mask = causal_mask(self.kernel_size, self.kernel_size, self.include_center)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            (k * mask).astype(self.dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(self.dtype)


class CodePrior(nn.Module):
    """PixelCNN over ``[s, s]`` grids of ``num_codes`` discrete indices.

    ``__call__(idx)`` returns next-code logits [B, s, s, K]; position
    (i, j)'s logits depend only on indices earlier in raster order, so
    ``sum(log softmax(logits)[idx])`` is a valid autoregressive
    log-likelihood and ancestral sampling is exact.

    ``num_classes > 0`` makes the prior class-conditional: ``__call__``
    then requires int labels y [B], and every masked layer receives a
    learned class bias (see module docstring). Labels never touch the
    causal path, so the masking guarantees are unchanged.
    """

    num_codes: int = 512
    features: int = 128
    num_layers: int = 6
    kernel_size: int = 5
    num_classes: int = 0  # > 0 = class-conditional p(codes | y)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, idx: jax.Array, y: jax.Array | None = None) -> jax.Array:
        if self.num_classes > 0 and y is None:
            raise ValueError(
                f"this CodePrior is class-conditional over {self.num_classes} classes; "
                "__call__ needs int labels y [B]"
            )
        cond = (
            jax.nn.one_hot(y, self.num_classes, dtype=self.dtype)  # [B, C]
            if self.num_classes > 0
            else None
        )

        def class_bias(h: jax.Array) -> jax.Array:
            # spatially-constant per-class pre-activation bias (cond. PixelCNN eq. 3)
            if cond is None:
                return h
            return h + nn.Dense(self.features, kernel_init=_xavier, dtype=self.dtype)(cond)[
                :, None, None, :
            ]

        x = jax.nn.one_hot(idx, self.num_codes, dtype=self.dtype)  # [B, s, s, K]
        h = class_bias(
            MaskedConv(self.features, self.kernel_size, include_center=False, dtype=self.dtype)(x)
        )
        for _ in range(self.num_layers - 1):
            r = nn.relu(h)
            r = class_bias(
                MaskedConv(self.features, self.kernel_size, include_center=True, dtype=self.dtype)(r)
            )
            h = h + r  # residual: mask-B layers preserve causality
        h = nn.relu(h)
        h = nn.Conv(self.features, (1, 1), kernel_init=_xavier, dtype=self.dtype)(h)
        h = nn.relu(h)
        return nn.Conv(self.num_codes, (1, 1), kernel_init=_xavier, dtype=self.dtype)(h)

    def log_likelihood(self, idx: jax.Array, y: jax.Array | None = None) -> jax.Array:
        """Mean per-grid log-likelihood (nats) of index grids [B, s, s]."""
        return grid_log_likelihood(self(idx, y), idx)


def grid_log_likelihood(logits: jax.Array, idx: jax.Array) -> jax.Array:
    """Mean per-grid log-likelihood (nats) from [B, s, s, K] logits."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, idx[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return jnp.mean(jnp.sum(picked, axis=(1, 2)))


class TransformerCodePrior(nn.Module):
    """Decoder-only transformer over ``[s, s]`` code grids (raster order).

    Same contract as ``CodePrior`` — ``__call__(idx[, y])`` returns
    next-code logits [B, s, s, K] where position t depends only on codes
    earlier in raster order — so ``make_prior_train_step``,
    ``sample_codes_autoregressive``, the train-prior CLI, and the
    generate CLI all serve both architectures through one interface.

    TPU-first construction:

    - the code grid enters as one-hot planes so the token embedding is a
      [B·L, K] × [K, d] MXU contraction (no gather);
    - causality comes from shifting the sequence right by one learned
      BOS embedding and a causal attention mask — full self-attention is
      exact and cheap here (L = s² ≤ 64 for every supported geometry,
      so the [L, L] score matrix is tiny and flash-style tiling would
      be pure overhead);
    - pre-LN residual blocks (attention + GELU MLP), all matmuls in
      ``dtype``, LayerNorm statistics in f32 (flax default upcast).

    Class-conditional variant (``num_classes > 0``): a learned per-class
    projection is added to every token embedding — spatially constant,
    off the causal path, mirroring ``CodePrior``'s conditioning rule.

    Reference: no equivalent (SURVEY §2 — the reference has no discrete
    models); this is the van den Oord et al. 2017 §3.3 prior stage with
    the PixelCNN swapped for the now-standard transformer factorization
    (cf. Chen et al. 2020 "ImageGPT"; Esser et al. 2021 §3.2 samples VQ
    codes with exactly this decoder-only shape).
    """

    num_codes: int = 512
    features: int = 128
    num_layers: int = 4
    num_heads: int = 4
    mlp_ratio: int = 4
    num_classes: int = 0  # > 0 = class-conditional p(codes | y)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, idx: jax.Array, y: jax.Array | None = None) -> jax.Array:
        if self.num_classes > 0 and y is None:
            raise ValueError(
                f"this TransformerCodePrior is class-conditional over {self.num_classes} "
                "classes; __call__ needs int labels y [B]"
            )
        b, s1, s2 = idx.shape
        length = s1 * s2
        tok = jax.nn.one_hot(idx.reshape(b, length), self.num_codes, dtype=self.dtype)
        h = nn.Dense(self.features, kernel_init=_xavier, dtype=self.dtype, name="embed")(tok)
        # shift right: logits at flat position t see tokens [BOS, x_0 .. x_{t-1}]
        bos = self.param("bos", nn.initializers.normal(0.02), (self.features,))
        h = jnp.concatenate(
            [jnp.broadcast_to(bos.astype(self.dtype), (b, 1, self.features)), h[:, :-1]], axis=1
        )
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (length, self.features))
        h = h + pos.astype(self.dtype)[None]
        if self.num_classes > 0:
            cond = jax.nn.one_hot(y, self.num_classes, dtype=self.dtype)  # [B, C]
            h = h + nn.Dense(
                self.features, kernel_init=_xavier, dtype=self.dtype, name="class_bias"
            )(cond)[:, None, :]

        # [1, 1, L, L]: identical across the batch — attention broadcasts
        # the batch dim, so a per-batch copy would be pure HBM waste
        mask = nn.make_causal_mask(jnp.ones((1, length)))
        for _ in range(self.num_layers):
            a = nn.LayerNorm()(h)
            a = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                qkv_features=self.features,
                kernel_init=_xavier,
                dtype=self.dtype,
            )(a, mask=mask)
            h = h + a
            m = nn.LayerNorm()(h)
            m = nn.Dense(
                self.features * self.mlp_ratio, kernel_init=_xavier, dtype=self.dtype
            )(m)
            m = nn.gelu(m)
            m = nn.Dense(self.features, kernel_init=_xavier, dtype=self.dtype)(m)
            h = h + m
        h = nn.LayerNorm()(h)
        logits = nn.Dense(self.num_codes, kernel_init=_xavier, dtype=self.dtype)(h)
        return logits.reshape(b, s1, s2, self.num_codes)

    def log_likelihood(self, idx: jax.Array, y: jax.Array | None = None) -> jax.Array:
        """Mean per-grid log-likelihood (nats) of index grids [B, s, s]."""
        return grid_log_likelihood(self(idx, y), idx)


def make_prior_train_step(prior: "CodePrior | TransformerCodePrior", tx):
    """(params, opt_state, idx_batch[, y]) → (params, opt_state, nll) —
    jitted maximum-likelihood step over code grids. Conditional priors
    take the label batch as the fourth argument (``y=None`` otherwise —
    an empty pytree, so one jitted program serves both)."""
    import optax

    @jax.jit
    def step(params, opt_state, idx, y=None):
        def loss_fn(p):
            logits = prior.apply({"params": p}, idx, y)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            picked = jnp.take_along_axis(logp, idx[..., None].astype(jnp.int32), axis=-1)[..., 0]
            return -jnp.mean(picked)  # mean nats per position

        nll, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, nll

    return step


def nucleus_mask(logits: jax.Array, top_p: float) -> jax.Array:
    """Mask ``[N, K]`` logits to their nucleus (smallest set of codes with
    cumulative probability ≥ ``top_p``); masked entries become -inf.

    Holtzman et al. 2020 ("The Curious Case of Neural Text
    Degeneration"): truncating the unreliable low-probability tail fixes
    sampling artifacts that temperature scaling cannot — temperature
    rescales the WHOLE distribution toward the mode (measured harmful
    for code sampling, benchmarks/temperature_sweep_vq16.json), while
    the nucleus keeps relative probabilities among plausible codes and
    only removes the junk tail. XLA-friendly: one sort + cumsum per
    step, static shapes.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    order = jnp.argsort(-probs, axis=-1)  # descending
    sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
    # keep a sorted position while the mass BEFORE it is < top_p — this
    # always keeps the top-1 code and yields the minimal covering set
    keep_sorted = jnp.cumsum(sorted_probs, axis=-1) - sorted_probs < top_p
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], order
    ].set(keep_sorted)
    return jnp.where(keep, logits, -jnp.inf)


def sample_codes_autoregressive(
    prior: "CodePrior | TransformerCodePrior",
    params,
    key: jax.Array,
    num_samples: int,
    grid: int,
    temperature: float = 1.0,
    y: jax.Array | None = None,
    top_p: float | None = None,
    known: jax.Array | None = None,
    known_mask: jax.Array | None = None,
) -> jax.Array:
    """Exact ancestral sampling: [num_samples, grid, grid] int32 code grids.

    One compiled program: ``lax.scan`` over the grid² raster positions,
    each step a full masked forward (causality makes the not-yet-sampled
    positions irrelevant to position t's logits). grid² is 64 for the
    default 4-downsample trunks and 256 for the fine-grid (``vq16*``)
    variants — short enough that the sequential chain is sampling-bound,
    not compile-bound.
    Conditional priors take int labels ``y`` [num_samples].
    ``temperature`` may be a python float or a traced scalar (the AOT
    sampler export passes it as a runtime argument). ``top_p`` (python
    float, trace-time constant) restricts each draw to the nucleus —
    see :func:`nucleus_mask`; ``top_p >= 1`` is a no-op.

    Continuation / infilling: ``known`` [num_samples, grid, grid] int
    codes with ``known_mask`` [grid, grid] bool forces every masked
    position to its known code while the rest are drawn ancestrally.
    When the masked set is a raster-order prefix this is EXACT sampling
    from p(rest | prefix); for arbitrary masks (e.g. a time-column
    prefix, which interleaves with the pitch-major raster) it is the
    standard forced-decoding approximation — each free draw conditions
    on every known position earlier in raster order, but not on known
    positions later in raster order (a causal model cannot). Forcing a
    position does not perturb the draw stream: free positions before
    the first forced one are bit-identical to an unconstrained run with
    the same key (regression-pinned in ``tests/test_prior.py``).
    """
    if top_p is not None and not (0.0 < top_p <= 1.0):
        raise ValueError(f"top_p must be in (0, 1], got {top_p}")
    if (known is None) != (known_mask is None):
        raise ValueError("known and known_mask must be provided together")
    if known is not None:
        known = jnp.asarray(known, jnp.int32)
        known_mask = jnp.asarray(known_mask, bool)
        if known.shape != (num_samples, grid, grid):
            raise ValueError(
                f"known must be [num_samples={num_samples}, {grid}, {grid}], got {known.shape}"
            )
        if known_mask.shape != (grid, grid):
            raise ValueError(f"known_mask must be [{grid}, {grid}], got {known_mask.shape}")
    t_inv = 1.0 / jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)
    has_y = y is not None
    has_known = known is not None
    # The sampler re-traced its whole scan on EVERY call when invoked
    # eagerly (the serving /sample path), paying ~1s of host tracing per
    # request for ~1ms of device work. One jitted program per static
    # configuration (round-5 fix; flax Modules hash by structure, so the
    # cache key is the prior architecture, not the parameters).
    fn = _cached_sampler(prior, grid, num_samples,
                         None if top_p is None else float(top_p), has_y, has_known)
    return fn(params, key, t_inv,
              y if has_y else _NO_Y,
              known if has_known else _NO_KNOWN,
              known_mask if has_known else _NO_KNOWN_MASK)


_NO_Y = jnp.zeros((0,), jnp.int32)
_NO_KNOWN = jnp.zeros((0, 0, 0), jnp.int32)
_NO_KNOWN_MASK = jnp.zeros((0, 0), bool)


@functools.lru_cache(maxsize=64)
def _cached_sampler(prior, grid: int, num_samples: int, top_p, has_y: bool,
                    has_known: bool):
    """One compiled ancestral sampler per static configuration."""
    use_nucleus = top_p is not None and top_p < 1.0

    def sample(params, key, t_inv, y, known, known_mask):
        yy = y if has_y else None

        def body(carry, t):
            idx, k = carry
            logits = prior.apply({"params": params}, idx, yy)  # [N, s, s, K]
            i, j = t // grid, t % grid
            k, sub = jax.random.split(k)
            step_logits = logits[:, i, j, :].astype(jnp.float32) * t_inv
            if use_nucleus:
                step_logits = nucleus_mask(step_logits, float(top_p))
            draw = jax.random.categorical(sub, step_logits, axis=-1).astype(jnp.int32)
            if has_known:
                draw = jnp.where(known_mask[i, j], known[:, i, j], draw)
            idx = idx.at[:, i, j].set(draw)
            return (idx, k), None

        idx0 = jnp.zeros((num_samples, grid, grid), jnp.int32)
        (idx, _), _ = jax.lax.scan(body, (idx0, key), jnp.arange(grid * grid))
        return idx

    return jax.jit(sample)
