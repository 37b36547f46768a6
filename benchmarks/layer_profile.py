"""Per-layer timing decomposition of the flagship train step on the TPU.

Times each encoder/decoder stage against the compute roofline
(197 TFLOP/s bf16) and the HBM roofline (~819 GB/s) so optimization
effort targets where the step actually spends time (round-2 finding:
the MXU-motivated s2d stem measured neutral; this script exists so the
next idea is data-driven).

Measurement notes (this environment):
- Per-call dispatch through the remote tunnel costs ~1-4 ms — more than
  most sub-ms layer times — so every op is timed INSIDE a ``lax.scan``
  (no host involvement between iterations), exactly like bench.py.
- XLA would hoist a loop-invariant op out of the scan; a data-dependent
  ``jnp.roll`` by a runtime-zero shift (opaque to the compiler) chains
  iterations. The roll adds one copy of ``x`` per iteration; its cost
  (x_bytes / 819 GB/s) is reported so readers can subtract it.
- Windows are closed by materializing a host value (block_until_ready
  can lie here — see RESULTS.md methodology).

Usage: python benchmarks/layer_profile.py [--batch 512] [--iters 50]
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


def _opaque_zero(s: jax.Array) -> jax.Array:
    """Runtime 0 the compiler cannot constant-fold (float scale + cast)."""
    return (s * 1e-38).astype(jnp.int32)


def timed_scanned(op, x, k, iters: int) -> float:
    """Median-of-3 windows of ``iters`` chained executions inside one scan."""

    def body(carry, _):
        xx, acc = carry
        out = op(xx, k)
        s = jnp.sum(out[:1, :1].astype(jnp.float32)) if out.ndim >= 2 else jnp.sum(out)
        xx = jnp.roll(xx, _opaque_zero(s), axis=0)  # chains the iterations
        return (xx, acc + s), None

    @jax.jit
    def run(x, k):
        (xx, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), None, length=iters)
        return acc

    float(run(x, k))  # compile + warm
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        acc = run(x, k)
        float(acc)  # value materialization closes the window
        samples.append((time.perf_counter() - t0) / iters)
    return sorted(samples)[1]


def conv_case(name, b, hw, cin, cout, stride, iters, transpose=False, ksize=3, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, hw, hw, cin), dtype)
    k = jax.random.normal(key, (ksize, ksize, cin, cout), dtype)

    if transpose:
        def op(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(stride, stride),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out_hw = hw * stride
        macs = b * hw * hw * ksize * ksize * cin * cout
    else:
        def op(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out_hw = -(-hw // stride)
        macs = b * out_hw * out_hw * ksize * ksize * cin * cout

    def fwd_bwd(x, k):
        def loss(x, k):
            return jnp.sum(op(x, k).astype(jnp.float32))
        dx, dk = jax.grad(loss, argnums=(0, 1))(x, k)
        return dx  # shape of x: feeds the roll chain

    t_fwd = timed_scanned(op, x, k, iters)
    t_fb = timed_scanned(fwd_bwd, x, k, iters)
    x_bytes = x.size * 2
    bytes_fwd = 2 * (x.size + b * out_hw * out_hw * cout + k.size)
    return {
        "layer": name,
        "shape": f"{hw}x{hw}x{cin}->{out_hw}x{out_hw}x{cout}" + (" T" if transpose else ""),
        "fwd_ms": round(t_fwd * 1e3, 3),
        "fwd_bwd_ms": round(t_fb * 1e3, 3),
        "gflops_fwd": round(2 * macs / 1e9, 2),
        "mxu_util_fwd_pct": round(100 * (2 * macs / t_fwd) / (PEAK_TFLOPS * 1e12), 1),
        "hbm_bound_ms": round(1e3 * bytes_fwd / (PEAK_GBPS * 1e9), 3),
        "flops_bound_ms": round(1e3 * 2 * macs / (PEAK_TFLOPS * 1e12), 3),
        "roll_overhead_ms": round(1e3 * x_bytes / (PEAK_GBPS * 1e9), 3),
    }


def bn_leaky_case(name, b, hw, c, iters, dtype=jnp.bfloat16):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, hw, hw, c), dtype)
    k = jnp.float32(0)  # unused

    def op(x, _):
        m = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        v = jnp.var(x, axis=(0, 1, 2), keepdims=True)
        return jax.nn.leaky_relu((x - m) * jax.lax.rsqrt(v + 1e-5), 0.01)

    t = timed_scanned(op, x, k, iters)
    x_bytes = x.size * 2
    return {
        "layer": name,
        "shape": f"{hw}x{hw}x{c}",
        "fwd_ms": round(t * 1e3, 3),
        "hbm_bound_ms": round(1e3 * 2 * 2 * x.size / (PEAK_GBPS * 1e9), 3),
        "roll_overhead_ms": round(1e3 * x_bytes / (PEAK_GBPS * 1e9), 3),
    }


def quantizer_case(name, b, s, d, codes, iters):
    """The VQ bottleneck: pairwise-distance matmul + argmin + one-hot
    gather over a [b·s·s, d] latent against a [codes, d] codebook — the
    only op the discrete family adds to the trunk."""
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (b, s, s, d), jnp.bfloat16)
    book = jax.random.normal(key, (codes, d), jnp.bfloat16)

    def op(z, book):
        flat = z.reshape(-1, d)
        # |z|^2 - 2 z.E^T + |E|^2, argmin over codes (distance matmul is
        # the MXU part; argmin/gather are VPU/HBM)
        d2 = (
            jnp.sum(flat * flat, 1, keepdims=True)
            - 2.0 * (flat @ book.T).astype(jnp.float32)
            + jnp.sum(book * book, 1)
        )
        idx = jnp.argmin(d2, axis=1)
        return jnp.take(book, idx, axis=0).reshape(z.shape)

    t = timed_scanned(op, z, book, iters)
    macs = b * s * s * d * codes
    return {
        "layer": name,
        "shape": f"{s}x{s}x{d} vs {codes} codes",
        "fwd_ms": round(t * 1e3, 3),
        "gflops_fwd": round(2 * macs / 1e9, 2),
        "mxu_util_fwd_pct": round(100 * (2 * macs / t) / (PEAK_TFLOPS * 1e12), 1),
        "hbm_bound_ms": round(1e3 * 2 * 2 * z.size / (PEAK_GBPS * 1e9), 3),
        "roll_overhead_ms": round(1e3 * z.size * 2 / (PEAK_GBPS * 1e9), 3),
    }


# the two-stage GENERATION flagship (quality_check.py `vq16_fold8`):
# s2d(8) stem -> every conv at 16^2 spatial, hidden (64,128,256), stride-1
# trunk, 16x16 code grid, depth-to-space(8) head. The round-4 claim "the
# decoder at 16^2 full channel width is the price" is what this
# decomposition tests (VERDICT round-4 weak #4).
def vq16_fold8_specs(b):
    return [
        ("enc1", (b, 16, 64, 64, 1), {}),
        ("enc2", (b, 16, 64, 128, 1), {}),
        ("enc3", (b, 16, 128, 256, 1), {}),
        ("to_latent_1x1", (b, 16, 256, 16, 1), {"ksize": 1}),
        ("from_latent_1x1", (b, 16, 16, 256, 1), {"ksize": 1}),
        ("dec1", (b, 16, 256, 128, 1), {}),
        ("dec2", (b, 16, 128, 64, 1), {}),
        ("head_conv", (b, 16, 64, 64, 1), {}),
        ("head_out_conv", (b, 16, 64, 64, 1), {}),  # 8^2*1 out channels
    ]


def splice_fine_grid(out: dict) -> None:
    """Rewrite the RESULTS.md AUTOGEN FINE GRID PROFILE block from the
    vq16-fold8 decomposition (same regenerate-in-session rule as every
    published table)."""
    import re

    results_md = os.path.join(os.path.dirname(os.path.abspath(__file__)), "RESULTS.md")
    begin = "<!-- BEGIN AUTOGEN FINE GRID PROFILE -->"
    end = "<!-- END AUTOGEN FINE GRID PROFILE -->"
    s = out["summary"]
    lines = [begin,
             "| layer | shape | fwd ms | fwd+bwd ms | GFLOP (fwd) | MXU util fwd | "
             "HBM-bound ms | FLOPs-bound ms |",
             "|---|---|---|---|---|---|---|---|"]
    for c in out["cases"]:
        lines.append(
            f"| {c['layer']} | {c['shape']} | {c['fwd_ms']} | "
            f"{c.get('fwd_bwd_ms', '—')} | {c.get('gflops_fwd', '—')} | "
            + (f"{c['mxu_util_fwd_pct']}% | " if "mxu_util_fwd_pct" in c else "— | ")
            + f"{c['hbm_bound_ms']} | {c.get('flops_bound_ms', '—')} |"
        )
    lines.append(
        f"\n(batch {s['batch']}, bf16, per-op `lax.scan` chained timing; sum fwd+bwd "
        f"**{s['sum_fwd_bwd_ms']} ms** → implied **{s['implied_samples_per_sec']:,.0f} "
        f"samples/s**, aggregate conv MFU **{s['aggregate_mfu_pct']}%**; regenerated by "
        f"`benchmarks/layer_profile.py --variant vq16-fold8 --splice` → "
        f"`layer_profile_vq16_fold8.json`)")
    lines.append(end)
    block = "\n".join(lines)
    with open(results_md) as f:
        text = f.read()
    pattern = re.compile(re.escape(begin) + r".*?" + re.escape(end), re.DOTALL)
    if not pattern.search(text):
        print(f"NOTE: RESULTS.md has no {begin} markers; skipping splice")
        return
    with open(results_md, "w") as f:
        f.write(pattern.sub(lambda _: block, text))
    print("rewrote RESULTS.md AUTOGEN FINE GRID PROFILE section")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--variant", default="flagship", choices=("flagship", "vq16-fold8"),
                    help="layer plan to decompose: the Gaussian training flagship "
                         "(fold8m geometry) or the two-stage generation flagship "
                         "(vq16_fold8: fold-8 stem, stride-1 16^2 trunk, VQ grid)")
    ap.add_argument("--splice", action="store_true",
                    help="vq16-fold8 only: rewrite the RESULTS.md AUTOGEN FINE GRID "
                         "PROFILE block (regenerate-in-session canon rule)")
    args = ap.parse_args()
    b, iters = args.batch, args.iters

    if args.variant == "vq16-fold8":
        cases = []
        for name, a, kw in vq16_fold8_specs(b):
            c = conv_case(name, *a, iters=iters, **kw)
            print(json.dumps(c), flush=True)
            cases.append(c)
        c = quantizer_case("quantizer", b, 16, 16, 512, iters)
        print(json.dumps(c), flush=True)
        cases.append(c)
        for name, hw, ch in [("bn_leaky@16px64c", 16, 64), ("bn_leaky@16px128c", 16, 128),
                             ("bn_leaky@16px256c", 16, 256)]:
            c = bn_leaky_case(name, b, hw, ch, iters=iters)
            print(json.dumps(c), flush=True)
            cases.append(c)
        total_fb = sum(c.get("fwd_bwd_ms", c["fwd_ms"]) for c in cases)
        # aggregate MFU over the decomposition: fwd+bwd FLOPs ~= 3x fwd
        # for the convs (grad wrt x and k are conv-shaped), 1x for the
        # fwd-only cases (quantizer/BN, excluded from the numerator)
        total_gflops_fb = sum(3 * c["gflops_fwd"] for c in cases
                              if "fwd_bwd_ms" in c and "gflops_fwd" in c)
        summary = {"variant": args.variant, "batch": b,
                   "sum_fwd_bwd_ms": round(total_fb, 2),
                   "implied_samples_per_sec": round(b / (total_fb / 1e3), 1),
                   "aggregate_mfu_pct": round(
                       100 * (total_gflops_fb / (total_fb / 1e3)) / (PEAK_TFLOPS * 1e3), 1)}
        print(json.dumps(summary), flush=True)
        out = {"cases": cases, "summary": summary}
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "layer_profile_vq16_fold8.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}", flush=True)
        if args.splice:
            splice_fine_grid(out)
        return

    specs = [
        ("enc1", (b, 128, 1, 32, 2), {}),
        ("enc2", (b, 64, 32, 64, 2), {}),
        ("enc3", (b, 32, 64, 128, 2), {}),
        ("enc4", (b, 16, 128, 256, 2), {}),
        ("dec1_T", (b, 8, 256, 128, 2), {"transpose": True}),
        ("dec2_T", (b, 16, 128, 64, 2), {"transpose": True}),
        ("dec3_T", (b, 32, 64, 32, 2), {"transpose": True}),
        ("final_T", (b, 64, 32, 32, 2), {"transpose": True}),
        ("final_conv", (b, 128, 32, 1, 1), {}),
        # s2d-equivalents of the stride-2 encoder convs: conv(k3,s2) on
        # [2h, 2h, c] == conv(k2,s1) on the s2d-folded [h, h, 4c] (a
        # superset function family) — is the folded layout faster?
        ("enc2_s2d_equiv", (b, 32, 128, 64, 1), {"ksize": 2}),
        ("enc3_s2d_equiv", (b, 16, 256, 128, 1), {"ksize": 2}),
        # head convs of the d2s head (the new flagship), for the record
        ("d2s_head_conv1", (b, 64, 32, 32, 1), {}),
        ("d2s_head_conv2", (b, 64, 32, 4, 1), {}),
    ]
    cases = []
    for name, a, kw in specs:
        c = conv_case(name, *a, iters=iters, **kw)
        print(json.dumps(c), flush=True)
        cases.append(c)
    for name, hw, ch in [("bn_leaky@64px32c", 64, 32), ("bn_leaky@128px32c", 128, 32)]:
        c = bn_leaky_case(name, b, hw, ch, iters=iters)
        print(json.dumps(c), flush=True)
        cases.append(c)
    total_fb = sum(c.get("fwd_bwd_ms", c["fwd_ms"]) for c in cases)
    print(json.dumps({"batch": b, "sum_fwd_bwd_ms": round(total_fb, 2),
                      "implied_samples_per_sec": round(b / (total_fb / 1e3), 1)}), flush=True)


if __name__ == "__main__":
    main()
