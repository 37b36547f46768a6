"""XLA compiler-option sweep over the flagship training benchmark.

The round-3 device trace (``backward_profile.py``) shows a flat op
profile — no single kernel worth a custom Pallas backward. The next
lever above individual ops is the COMPILER's schedule: scoped-VMEM
budget (bigger fusions vs more HBM spills) and the latency-hiding
scheduler.

Delivery mechanism matters on this platform: process-level ``XLA_FLAGS``
are parsed by the LOCAL XLA client — a CPU build that fatals
(``parse_flags_from_env``) on TPU-only flags, because compilation
happens on the far side of the axon tunnel. Per-compile
``jax.jit(compiler_options=...)`` rides the compile RPC instead and
reaches the remote TPU compiler, so each configuration runs ``bench.py``
in a fresh subprocess with ``MIDI_VAE_COMPILER_OPTIONS`` (a JSON dict
bench.py applies to its timed programs) and this script reduces the
results to one table.

Run on the TPU::

    python benchmarks/xla_flags_bench.py [--steps 300] [--repeats 1]

Writes ``benchmarks/xla_flags.json``. Expect each run to pay a full
remote compile (~1-7 min); an option string the compiler rejects is
reported as ``rejected``, not a crash.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# One entry per configuration: name -> compiler options (merged over the
# default compile). Scoped VMEM is the documented high-leverage knob for
# conv/fusion-heavy programs (jax.dev TPU flag guide); the latency-hiding
# scheduler default has flipped across libtpu releases, so both states
# are measured rather than assumed.
CONFIGS = {
    "baseline": {},
    "lhs_off": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
}


def run_config(name: str, options: dict, steps: int, timeout: int) -> dict:
    env = os.environ.copy()
    # never inherit a stale value from the caller's shell: the baseline
    # must bench the true default compile
    env.pop("MIDI_VAE_COMPILER_OPTIONS", None)
    if options:
        env["MIDI_VAE_COMPILER_OPTIONS"] = json.dumps(options)
    env["MIDI_VAE_BENCH_STEPS"] = str(steps)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"config": name, "options": options, "status": "timeout"}
    line = next((ln for ln in proc.stdout.splitlines() if ln.startswith("{")), None)
    if proc.returncode != 0 or line is None:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
        return {"config": name, "options": options, "status": "rejected", "tail": tail}
    out = json.loads(line)
    return {
        "config": name,
        "options": options,
        "status": "ok",
        "samples_per_sec_chip": out["value"],
        "final_loss": out.get("extra", {}).get("final_loss"),
    }


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--repeats", type=int, default=1,
                        help="measured windows per config (new process each; median reported)")
    parser.add_argument("--timeout", type=int, default=1800, help="per-run wall limit, seconds")
    parser.add_argument("--configs", nargs="*", default=list(CONFIGS),
                        help="subset of config names to run")
    args = parser.parse_args()

    results = []
    for name in args.configs:
        options = CONFIGS[name]
        runs = [run_config(name, options, args.steps, args.timeout) for _ in range(args.repeats)]
        ok = sorted(r["samples_per_sec_chip"] for r in runs if r["status"] == "ok")
        rec = dict(runs[0])
        if ok:
            rec["samples_per_sec_chip"] = ok[len(ok) // 2]
            rec["windows"] = ok
        results.append(rec)
        print(json.dumps(rec))

    base = next((r for r in results if r["config"] == "baseline" and r["status"] == "ok"), None)
    if base:
        print(f"\n{'config':<22} {'samples/s/chip':>15}  vs baseline")
        for r in results:
            if r["status"] != "ok":
                print(f"{r['config']:<22} {r['status']:>15}")
                continue
            rel = r["samples_per_sec_chip"] / base["samples_per_sec_chip"]
            print(f"{r['config']:<22} {r['samples_per_sec_chip']:>15,.0f}  {rel:.3f}x")

    with open(os.path.join(HERE, "xla_flags.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {os.path.join(HERE, 'xla_flags.json')}")


if __name__ == "__main__":
    main()
