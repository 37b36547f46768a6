"""Per-layer timing decomposition of the flagship train step on the TPU.

Times each encoder/decoder stage standalone (forward and forward+backward)
with value-materialization windows, plus the elementwise BN+LeakyReLU
epilogues, and compares against the compute roofline (197 TFLOP/s bf16)
and the HBM roofline (~819 GB/s) — so optimization effort goes where the
step actually spends its time instead of where the FLOPs nominally are
(round-2 finding: the s2d stem was MXU-motivated and measured neutral;
this script exists so the next idea is data-driven).

Usage: python benchmarks/layer_profile.py [--batch 512] [--iters 30]
"""

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

PEAK_TFLOPS = 197.0  # v5e bf16
PEAK_GBPS = 819.0


def timed(fn, *args, iters=30):
    """Median-of-3 windows, each closed by materializing a host value."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1, :1].astype(jnp.float32)))
        best.append((time.perf_counter() - t0) / iters)
    return sorted(best)[1]


def conv_case(name, b, hw, cin, cout, stride, transpose=False, dtype=jnp.bfloat16):
    """One conv layer: returns dict with fwd/fwd+bwd seconds and rooflines."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, hw, hw, cin), dtype)
    k = jax.random.normal(key, (3, 3, cin, cout), dtype)

    if transpose:
        def op(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", lhs_dilation=(stride, stride),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out_hw = hw * stride
        macs = b * hw * hw * 9 * cin * cout
    else:
        def op(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out_hw = -(-hw // stride)
        macs = b * out_hw * out_hw * 9 * cin * cout

    fwd = jax.jit(op)

    def loss(x, k):
        return jnp.sum(op(x, k).astype(jnp.float32))

    fb = jax.jit(jax.grad(loss, argnums=(0, 1)))

    t_fwd = timed(fwd, x, k)
    t_fb = timed(fb, x, k)
    bytes_moved = 2 * (x.size + out_hw * out_hw * cout * b + k.size)  # bf16 read+write, fwd
    return {
        "layer": name,
        "shape": f"{hw}x{hw}x{cin}->{out_hw}x{out_hw}x{cout}" + (" T" if transpose else ""),
        "fwd_ms": round(t_fwd * 1e3, 3),
        "fwd_bwd_ms": round(t_fb * 1e3, 3),
        "gflops": round(2 * macs / 1e9, 2),
        "mxu_util_fwd_pct": round(100 * (2 * macs / t_fwd) / (PEAK_TFLOPS * 1e12), 1),
        "hbm_bound_ms": round(1e3 * bytes_moved / (PEAK_GBPS * 1e9), 3),
        "flops_bound_ms": round(1e3 * 2 * macs / (PEAK_TFLOPS * 1e12), 3),
    }


def bn_leaky_case(name, b, hw, c, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, hw, hw, c), dtype)

    @jax.jit
    def op(x):
        m = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        v = jnp.var(x, axis=(0, 1, 2), keepdims=True)
        return jax.nn.leaky_relu((x - m) * jax.lax.rsqrt(v + 1e-5), 0.01)

    t = timed(op, x)
    bytes_moved = 2 * 2 * x.size  # read + write, bf16
    return {
        "layer": name,
        "shape": f"{hw}x{hw}x{c}",
        "fwd_ms": round(t * 1e3, 3),
        "hbm_bound_ms": round(1e3 * bytes_moved / (PEAK_GBPS * 1e9), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    b = args.batch

    cases = [
        conv_case("enc1", b, 128, 1, 32, 2),
        conv_case("enc2", b, 64, 32, 64, 2),
        conv_case("enc3", b, 32, 64, 128, 2),
        conv_case("enc4", b, 16, 128, 256, 2),
        conv_case("dec1_T", b, 8, 256, 128, 2, transpose=True),
        conv_case("dec2_T", b, 16, 128, 64, 2, transpose=True),
        conv_case("dec3_T", b, 32, 64, 32, 2, transpose=True),
        conv_case("final_T", b, 64, 32, 32, 2, transpose=True),
        conv_case("final_conv", b, 128, 32, 1, 1),
        bn_leaky_case("bn_leaky@64px32c", b, 64, 32),
        bn_leaky_case("bn_leaky@128px32c", b, 128, 32),
    ]
    total_fb = sum(c.get("fwd_bwd_ms", c["fwd_ms"]) for c in cases)
    for c in cases:
        print(json.dumps(c))
    print(json.dumps({"batch": b, "sum_fwd_bwd_ms": round(total_fb, 2),
                      "implied_samples_per_sec": round(b / (total_fb / 1e3), 1)}))


if __name__ == "__main__":
    main()
