"""Trace-based attribution of the flagship train step (round-3 VERDICT #3).

Round 2 bounded the fold=8 backward only by argument ("the 10.8 ms step
is close to the ~3x forward one expects"); this captures an actual
``jax.profiler`` trace of the flagship step and attributes device time
per fused-op region, so the "where is the remaining headroom" section of
RESULTS.md cites trace numbers instead of arithmetic.

Methodology:
- the step runs exactly as ``bench.py`` runs it (same ``setup`` /
  ``make_train_step`` / on-device data), dispatched individually (not
  inside ``lax.scan``) so the trace shows one clean program execution
  per step;
- the trace is parsed in-process with ``jax.profiler.ProfileData`` (no
  TensorBoard round-trip): we take the device plane(s), aggregate event
  durations by XLA op/fusion name over the traced steps, and report the
  top regions with their share of total device time;
- a forward-only (eval-mode) trace is captured the same way so
  forward-attributable regions can be separated from backward-only ones.

Run on the TPU:

    python benchmarks/backward_profile.py [--steps 10] [--fold 8]

Writes ``benchmarks/backward_profile.json`` and prints the top table.
"""

import argparse
import collections
import glob
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

IMAGE_SIZE = 128


def _trace_dir_planes(trace_dir):
    """Parse every .xplane.pb under trace_dir into ProfileData objects."""
    import jax

    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    return [jax.profiler.ProfileData.from_file(f) for f in files]


def aggregate_device_ops(trace_dir):
    """(op_totals, module_totals, async_total_ns) from the device trace.

    TPU device planes carry distinct lines: ``XLA Ops`` (non-overlapping
    op-level events — THE attribution stream), ``XLA Modules`` (one event
    per executed program), and ``Async XLA Ops`` (overlapped DMA/copies,
    excluded from the critical-path total). CPU traces have no device
    plane; fall back to the ``*XLAPjRt*`` client line so the script still
    smokes there.
    """
    ops = collections.Counter()
    modules = collections.Counter()
    async_ns = 0
    saw_device = False
    for pd in _trace_dir_planes(trace_dir):
        for plane in pd.planes:
            pname = plane.name or ""
            plow = pname.lower()
            if not ("/device:tpu" in plow or "/device:gpu" in plow):
                continue
            saw_device = True
            for line in plane.lines:
                lname = line.name or ""
                if lname == "XLA Ops":
                    for e in line.events:
                        ops[e.name.split(" = ")[0]] += max(0, e.duration_ns)
                elif lname == "XLA Modules":
                    for e in line.events:
                        modules[e.name] += max(0, e.duration_ns)
                elif lname == "Async XLA Ops":
                    async_ns += sum(max(0, e.duration_ns) for e in line.events)
    if not saw_device:  # CPU fallback
        for pd in _trace_dir_planes(trace_dir):
            for plane in pd.planes:
                if plane.name != "/host:CPU":
                    continue
                for line in plane.lines:
                    if "xlapjrt" not in (line.name or "").lower():
                        continue
                    for e in line.events:
                        if not e.name.startswith("end: "):
                            ops[e.name] += max(0, e.duration_ns)
    return ops, modules, async_ns


def capture(fn, steps, trace_dir):
    import jax

    jax.profiler.start_trace(trace_dir)
    out = None
    for i in range(steps):
        with jax.profiler.StepTraceAnnotation("step", step_num=i):
            out = fn(i)
    # close the window with a materialized value (platform rule: a float
    # cannot lie — benchmarks/RESULTS.md "methodology")
    val = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    jax.profiler.stop_trace()
    return val


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--fold", type=int, default=8)
    ap.add_argument("--arch", default="FoldedVAE")
    ap.add_argument("--hidden-dims", type=int, nargs="+", default=[32, 64, 128, 256])
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from bench import setup
    from midi_vae_tpu.data.synthetic import make_pianoroll_batch

    print(f"backend: {jax.devices()[0].platform}", flush=True)
    ctx = setup(batch=args.batch, bf16=True, arch=args.arch, fold=args.fold,
                hidden_dims=tuple(args.hidden_dims))
    model, state, train_step = ctx["model"], ctx["state"], ctx["train_step"]
    x_sharding = ctx["x_sharding"]
    base_key = jax.random.PRNGKey(1)

    @jax.jit
    def make_x(i):
        x, _ = make_pianoroll_batch(jax.random.fold_in(base_key, i), ctx["total_batch"],
                                    pitches=IMAGE_SIZE, steps=IMAGE_SIZE)
        return jax.lax.with_sharding_constraint(x, x_sharding)

    @jax.jit
    def fwd_only(params, batch_stats, x, key):
        # args, not closure: the train step DONATES its state, so captured
        # buffers would be deleted after the first train dispatch
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, train=False, rngs={"reparam": key},
        )
        return out.logits.sum()

    # warm both programs (first TPU compile is minutes through the tunnel)
    x0 = make_x(0)
    st, lo, _ = train_step(state, x0, base_key)
    jax.block_until_ready(st.params)
    jax.block_until_ready(fwd_only(st.params, st.batch_stats, x0, base_key))
    print("warm; tracing...", flush=True)

    # pre-generate the inputs OUTSIDE the trace window so the op
    # attribution contains only the step under study, not the data
    # generator (~1.3 GB HBM for 10 f32 batches at 2048×128² — fine)
    xs = [jax.block_until_ready(make_x(i)) for i in range(args.steps)]
    state_holder = {"s": st}

    def step_full(i):
        s, lo, _ = train_step(state_holder["s"], xs[i], base_key)
        state_holder["s"] = s
        return lo.loss

    def step_fwd(i):
        s = state_holder["s"]
        return fwd_only(s.params, s.batch_stats, xs[i], jax.random.fold_in(base_key, i))

    results = {}
    for name, fn in (("train_step", step_full), ("forward_only", step_fwd)):
        trace_dir = tempfile.mkdtemp(prefix=f"profile_{name}_")
        t0 = time.perf_counter()
        capture(fn, args.steps, trace_dir)
        wall = time.perf_counter() - t0
        ops, modules, async_ns = aggregate_device_ops(trace_dir)
        total_ns = sum(ops.values())
        top = ops.most_common(args.top)
        results[name] = {
            "wall_s": round(wall, 3),
            "steps": args.steps,
            "device_op_total_ms": round(total_ns / 1e6, 3),
            "per_step_device_ms": round(total_ns / 1e6 / args.steps, 3),
            "async_copy_ms_total": round(async_ns / 1e6, 3),
            "modules_per_step_ms": {
                m: round(ns / 1e6 / args.steps, 3) for m, ns in modules.most_common(6)
            },
            "top_ops": [
                {
                    "op": op,
                    "total_ms": round(ns / 1e6, 3),
                    "per_step_us": round(ns / 1e3 / args.steps, 1),
                    "pct": round(100.0 * ns / total_ns, 2) if total_ns else 0.0,
                }
                for op, ns in top
            ],
        }
        print(f"\n== {name}: {total_ns / 1e6 / args.steps:.3f} ms device-op time/step "
              f"(wall {wall:.2f}s for {args.steps} steps; async copies "
              f"{async_ns / 1e6 / args.steps:.2f} ms/step overlapped) ==")
        for m, v in results[name]["modules_per_step_ms"].items():
            print(f"  module {v:8.3f} ms/step  {m[:70]}")
        for row in results[name]["top_ops"][:args.top]:
            print(f"  {row['pct']:6.2f}%  {row['per_step_us']:10.1f} us/step  {row['op'][:90]}")

    out_path = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)), "backward_profile.json")
    with open(out_path, "w") as f:
        json.dump({"batch": args.batch, "fold": args.fold, "arch": args.arch,
                   "hidden_dims": args.hidden_dims, **results}, f, indent=1)
    print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
