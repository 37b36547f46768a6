"""Pallas TPU kernels for the ELBO hot path (BASELINE north star:
"the reparameterization sample and ELBO fused into a single Pallas loss
kernel").

Two kernels with custom VJPs:

- :func:`fused_reparam_kl` — one VPU pass over (mu, log_var) that draws
  eps with the on-core PRNG (Box-Muller over ``pltpu.prng_random_bits``),
  forms ``z = mu + eps·exp(log_var/2)`` and the KL partial sums, without
  materializing eps/std intermediates in HBM.
- :func:`fused_bce_mean` — grid-strided masked reduction of the
  clamped binary cross-entropy over reconstruction logits; the
  elementwise BCE array (B·H·W·C floats) never exists in HBM. Backward
  is a single elementwise kernel emitting ``(σ(l)−t)·mask/N``.

Numerics match ``losses/elbo.py`` exactly (same clamp at -100, same
reductions); only the eps stream differs from ``jax.random.normal``
(threefry vs on-core PRNG — RNG parity is structural, SURVEY §7).
Kernels run in interpreter mode automatically off-TPU, so the test suite
exercises them on CPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG_CLAMP = -100.0


def _interpret():
    """False on TPU (compile with Mosaic); the TPU-semantics interpreter
    elsewhere, so pltpu primitives (PRNG, SMEM scalars) work on CPU."""
    if jax.default_backend() == "tpu":
        return False
    return pltpu.InterpretParams()


# ============================================================ reparam + KL


def _reparam_kl_kernel(seed_ref, mu_ref, lv_ref, z_ref, kl_ref):
    pltpu.prng_seed(seed_ref[0])
    # compute in f32 regardless of storage dtype (bf16 models); cast at the ref
    mu = mu_ref[:].astype(jnp.float32)
    lv = lv_ref[:].astype(jnp.float32)

    # Box-Muller: two uniform draws → one standard normal draw
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(mu.shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(mu.shape), jnp.uint32)
    # uint32 → uniform (0,1]: top 24 bits. Mosaic can't cast uint32→f32,
    # so shift (making the value < 2^24), reinterpret as non-negative
    # int32, then cast. Offset by 2^-25 keeps u1 strictly positive.
    i1 = pltpu.bitcast(bits1 >> 8, jnp.int32)
    i2 = pltpu.bitcast(bits2 >> 8, jnp.int32)
    u1 = i1.astype(jnp.float32) * (1.0 / (1 << 24)) + (1.0 / (1 << 25))
    u2 = i2.astype(jnp.float32) * (1.0 / (1 << 24))
    eps = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * np.pi * u2)

    z_ref[:] = (mu + eps * jnp.exp(0.5 * lv)).astype(z_ref.dtype)
    # KL partial: -0.5 · Σ_batch Σ_dim (1 + lv - mu² - e^lv); mean over batch
    # applied by the caller (models.py:214 semantics).
    kl_ref[0, 0] = -0.5 * jnp.sum(1.0 + lv - mu * mu - jnp.exp(lv))


def _reparam_kl_fwd_impl(mu: jax.Array, log_var: jax.Array, seed: jax.Array):
    batch = mu.shape[0]
    z, kl_sum = pl.pallas_call(
        _reparam_kl_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(mu.shape, mu.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_interpret(),
    )(seed.reshape(1).astype(jnp.int32), mu, log_var)
    return z, kl_sum[0, 0] / batch


@jax.custom_vjp
def fused_reparam_kl(mu: jax.Array, log_var: jax.Array, seed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(z, kl) where z = mu + eps·exp(log_var/2) and kl is the reference KL
    (models.py:177-183, 214) — one kernel, PRNG on-core."""
    return _reparam_kl_fwd_impl(mu, log_var, seed)


def _reparam_kl_fwd(mu, log_var, seed):
    z, kl = _reparam_kl_fwd_impl(mu, log_var, seed)
    return (z, kl), (mu, log_var, z)


def _reparam_kl_bwd(res, cotangents):
    mu, log_var, z = res
    g_z, g_kl = cotangents
    batch = mu.shape[0]
    # ∂z/∂mu = 1; ∂z/∂lv = eps·exp(lv/2)/2 = (z-mu)/2
    # ∂kl/∂mu = mu/B; ∂kl/∂lv = -0.5·(1-e^lv)/B
    d_mu = g_z + g_kl * mu / batch
    d_lv = g_z * 0.5 * (z - mu) + g_kl * (-0.5) * (1.0 - jnp.exp(log_var)) / batch
    return d_mu.astype(mu.dtype), d_lv.astype(log_var.dtype), None


fused_reparam_kl.defvjp(_reparam_kl_fwd, _reparam_kl_bwd)


# ============================================================== fused BCE

_BCE_BLOCK_ROWS = 256  # rows of the flattened (N/128, 128) view per grid step


def _bce_fwd_kernel(l_ref, t_ref, out_ref):
    i = pl.program_id(0)

    logits = l_ref[:].astype(jnp.float32)
    t = t_ref[:].astype(jnp.float32)
    log_p = jnp.maximum(-jax.nn.softplus(-logits), _LOG_CLAMP)
    log_1mp = jnp.maximum(-jax.nn.softplus(logits), _LOG_CLAMP)
    partial = -jnp.sum(t * log_p + (1.0 - t) * log_1mp)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += partial


def _bce_grad_kernel(l_ref, t_ref, g_ref, out_ref):
    logits = l_ref[:].astype(jnp.float32)
    t = t_ref[:].astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    log_p = -jax.nn.softplus(-logits)
    log_1mp = -jax.nn.softplus(logits)
    m1 = (log_p > _LOG_CLAMP).astype(logits.dtype)
    m2 = (log_1mp > _LOG_CLAMP).astype(logits.dtype)
    out_ref[:] = g_ref[0] * (-(t * (1.0 - p) * m1 - (1.0 - t) * p * m2))


def _flatten_pad(x: jax.Array) -> Tuple[jax.Array, int]:
    """Flatten to (rows, 128) with zero padding; returns (view, n_real_elements).

    Zero-padded (logit 0, target 0) elements contribute log(2) each to
    the BCE sum; the caller subtracts that closed-form correction, so no
    mask array is needed.
    """
    n = x.size
    rows = -(-n // 128)
    pad = rows * 128 - n
    flat = jnp.pad(x.reshape(-1), (0, pad))
    return flat.reshape(rows, 128), n


def _bce_fwd_impl(logits: jax.Array, targets: jax.Array) -> jax.Array:
    l2, n = _flatten_pad(logits)
    t2, _ = _flatten_pad(targets)
    rows = l2.shape[0]
    block = min(_BCE_BLOCK_ROWS, rows)
    grid = pl.cdiv(rows, block)
    # pad rows to a multiple of the block so every grid step sees a full block
    row_pad = grid * block - rows
    if row_pad:
        l2 = jnp.pad(l2, ((0, row_pad), (0, 0)))
        t2 = jnp.pad(t2, ((0, row_pad), (0, 0)))
    total = pl.pallas_call(
        _bce_fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=_interpret(),
    )(l2, t2)[0, 0]
    n_pad_elems = l2.size - n
    # each zero-padded element contributes -log σ(0) = log 2
    return (total - n_pad_elems * jnp.log(2.0).astype(jnp.float32)) / n


@jax.custom_vjp
def fused_bce_mean(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean clamped BCE over all elements (models.py:208 semantics), as a
    grid-strided Pallas reduction. Matches ``losses.elbo.bce_from_logits``
    + mean exactly."""
    return _bce_fwd_impl(logits, targets)


def _bce_fwd(logits, targets):
    return _bce_fwd_impl(logits, targets), (logits, targets)


def _bce_bwd(res, g):
    logits, targets = res
    l2, n = _flatten_pad(logits)
    t2, _ = _flatten_pad(targets)
    rows = l2.shape[0]
    block = min(_BCE_BLOCK_ROWS, rows)
    grid = pl.cdiv(rows, block)
    row_pad = grid * block - rows
    if row_pad:
        l2 = jnp.pad(l2, ((0, row_pad), (0, 0)))
        t2 = jnp.pad(t2, ((0, row_pad), (0, 0)))
    scaled_g = (g / n).reshape(1).astype(jnp.float32)
    grads2 = pl.pallas_call(
        _bce_grad_kernel,
        out_shape=jax.ShapeDtypeStruct(l2.shape, jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(l2, t2, scaled_g)
    d_logits = grads2.reshape(-1)[: logits.size].reshape(logits.shape).astype(logits.dtype)
    return d_logits, None


fused_bce_mean.defvjp(_bce_fwd, _bce_bwd)


# ========================================================== fused ELBO loss


@functools.partial(jax.jit, static_argnames=())
def fused_elbo_terms(logits, targets, mu, log_var, kld_weight):
    """Loss terms via the fused kernels: (loss, recon, kl).

    KL here recomputes from (mu, log_var) — cheap [B, D] math — while the
    reparameterization z comes from :func:`fused_reparam_kl` inside the
    model when ``fused=True``. Composition matches models.py:208-216.
    """
    recon = fused_bce_mean(logits, targets)
    mu32, lv32 = mu.astype(jnp.float32), log_var.astype(jnp.float32)
    kl = -0.5 * jnp.mean(jnp.sum(1.0 + lv32 - mu32**2 - jnp.exp(lv32), axis=-1))
    loss = recon + jnp.asarray(kld_weight, recon.dtype) * kl
    return loss, recon, kl
