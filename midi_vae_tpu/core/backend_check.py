"""Bounded liveness probe for the default JAX backend.

The axon TPU tunnel can go fully down for hours (an 8.7 h continuous
outage was observed 2026-08-18), and a dead tunnel makes the FIRST
device operation hang forever — there is no timeout anywhere in the
dispatch path, and a hung XLA call cannot be cancelled in-process. Any
unattended process that touches the device at startup (the HTTP server,
the benchmark, a cron-launched trainer) therefore wedges silently
instead of failing.

``backend_alive`` probes with a trivial matmul in a SUBPROCESS under a
deadline. Calibration for this platform: a healthy chip answers in
seconds, heavy tunnel congestion stretches the same probe to ~60 s
(memory: tpu-tunnel-measurement-pitfalls), a dead tunnel never answers —
so the default 300 s deadline with retries separates "slow" from "gone".
"""

from __future__ import annotations

import subprocess
import sys

_PROBE = (
    "import jax, jax.numpy as jnp; "
    "(jnp.ones((1024, 1024)) @ jnp.ones((1024, 1024))).block_until_ready(); print('ok')"
)


def backend_alive(timeout_s: float = 300.0, attempts: int = 3, verbose: bool = True) -> bool:
    """True once a trivial device op completes within the deadline."""
    for attempt in range(1, attempts + 1):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _PROBE], capture_output=True, text=True, timeout=timeout_s
            )
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if verbose:
            print(f"backend pre-flight attempt {attempt}/{attempts} failed", file=sys.stderr)
    return False
