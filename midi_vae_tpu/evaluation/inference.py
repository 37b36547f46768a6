"""Inference entry points: prior sampling, reconstruction, latent interpolation.

Covers the reference's public inference API (``VanillaVAE.sample`` /
``generate``, models.py:250-272) plus the latent-interpolation
capability BASELINE.json config #4 requires, which the reference never
implemented (SURVEY §3.4: "latent interpolation must be built fresh").
All paths are jitted batched programs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


from midi_vae_tpu.models.vae import label_kwarg as _yk  # shared CVAE-label rule


@functools.partial(jax.jit, static_argnames=("model", "num_samples"))
def sample_prior(model, params, batch_stats, key, num_samples: int, y=None) -> jax.Array:
    """Decode z ~ N(0, I) prior draws (reference: models.py:250-263).

    Conditional models (``num_classes > 0``) require ``y``: int labels
    ``[num_samples]`` selecting the class each sample is drawn for —
    class-conditional generation, the CVAE's reason to exist.

    Discrete-latent models (``latent_kind == "vq"``) have no Gaussian
    prior; their ``sample`` method draws code grids from the EMA
    code-usage marginal instead (models/vq.py:VQVAE.sample).
    """
    if getattr(model, "latent_kind", "gaussian") == "vq":
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, key, num_samples,
            method=type(model).sample,
        )
    z = jax.random.normal(key, (num_samples, model.latent_dim), dtype=jnp.float32)
    return model.apply(
        {"params": params, "batch_stats": batch_stats}, z, train=False,
        method=type(model).decode, **_yk(y),
    )


@functools.partial(jax.jit, static_argnames=("model",))
def reconstruct(model, params, batch_stats, x, key, y=None) -> jax.Array:
    """Reconstruct inputs (reference: models.py:265-272 ``generate``)."""
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False,
        rngs={"reparam": key}, **_yk(y),
    )
    return out.output


def _slerp(a: jax.Array, b: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation along the great circle between latent vectors —
    the natural path under a Gaussian prior (White 2016, 'Sampling
    Generative Networks')."""
    a_n = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
    b_n = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
    omega = jnp.arccos(jnp.clip(jnp.sum(a_n * b_n, axis=-1, keepdims=True), -1 + 1e-7, 1 - 1e-7))
    so = jnp.sin(omega)
    return (jnp.sin((1.0 - t) * omega) / so) * a + (jnp.sin(t * omega) / so) * b


@functools.partial(jax.jit, static_argnames=("model", "steps", "mode"))
def interpolate(
    model, params, batch_stats, x_a, x_b, *, steps: int = 8, mode: str = "lerp", y=None
) -> jax.Array:
    """Encode two batches, interpolate in latent space, decode the path.

    Uses the posterior means (no sampling noise) so the path is
    deterministic. Returns [steps, B, H, W, C]. For conditional models
    pass ``y`` (int [B]) — both endpoints encode and every step decodes
    under that fixed condition, so the path explores the latent space of
    ONE class.
    """
    variables = {"params": params, "batch_stats": batch_stats}
    enc_a = model.apply(variables, x_a, train=False, method=type(model).encode, **_yk(y))
    enc_b = model.apply(variables, x_b, train=False, method=type(model).encode, **_yk(y))
    ts = jnp.linspace(0.0, 1.0, steps).reshape(steps, 1, 1)
    if mode == "lerp":
        zs = (1.0 - ts) * enc_a.mu[None] + ts * enc_b.mu[None]
    elif mode == "slerp":
        zs = jax.vmap(lambda t: _slerp(enc_a.mu, enc_b.mu, t))(ts[:, 0])
    else:
        raise ValueError(f"Unknown interpolation mode: {mode}")
    decode = lambda z: model.apply(variables, z, train=False, method=type(model).decode, **_yk(y))  # noqa: E731
    return jax.vmap(decode)(zs)


@functools.partial(jax.jit, static_argnames=("model", "steps", "span"))
def traverse(model, params, batch_stats, x, *, steps: int = 8, span: float = 2.5, y=None) -> jax.Array:
    """Latent traversal: encode one input, then vary each latent dimension
    across ``±span`` (posterior-σ units) while holding the others at the
    posterior mean. Returns [latent_dim, steps, H, W, C] — the standard
    disentanglement visualization (pairs with the β-TC-VAE objective;
    no reference equivalent). Conditional models traverse under the
    fixed label ``y`` (int [1]).
    """
    variables = {"params": params, "batch_stats": batch_stats}
    y1 = y[:1] if y is not None else None
    enc = model.apply(variables, x[:1], train=False, method=type(model).encode, **_yk(y1))
    mu = enc.mu[0]  # [D]
    sigma = jnp.exp(0.5 * enc.log_var[0])
    D = mu.shape[0]
    offsets = jnp.linspace(-span, span, steps)  # [S]
    # [D, S, D]: dim d varied by offsets·σ_d, others fixed at mu
    deltas = jnp.eye(D)[:, None, :] * (offsets[None, :, None] * sigma[None, None, :])
    zs = mu[None, None, :] + deltas
    decode = lambda z: model.apply(  # noqa: E731
        variables, z, train=False, method=type(model).decode,
        **_yk(jnp.broadcast_to(y1, (z.shape[0],)) if y1 is not None else None),
    )
    return jax.vmap(decode)(zs)  # [D, steps, H, W, C]


def reconstruction_grid(stimuli: jax.Array, reconstructions: jax.Array, pairs: int = 8) -> jax.Array:
    """Side-by-side input|reconstruction image grid for logging — the
    wandb grid at train.py:687-701, as a pure array op. Returns [H', W', C]."""
    n = min(pairs, stimuli.shape[0])
    paired = jnp.concatenate([stimuli[:n], reconstructions[:n]], axis=2)  # widthwise pairs
    rows = [jnp.concatenate(list(paired[i : i + 4]), axis=1) for i in range(0, n, 4)]
    width = max(r.shape[1] for r in rows)
    rows = [jnp.pad(r, ((0, 0), (0, width - r.shape[1]), (0, 0))) for r in rows]
    return jnp.concatenate(rows, axis=0)
