"""Real multi-process SPMD tests (VERDICT round 1, item 2).

Spawns ACTUAL JAX processes (``jax.distributed.initialize`` with a local
coordinator, CPU backend) rather than simulating ``process_count``:

- 2 processes x 2 virtual devices and 1 process x 4 virtual devices run
  the same few-epoch training job over the same 4-device global mesh;
  final parameters and per-step losses must match. This proves the
  global-epoch-key replication contract, ``put_sharded``'s
  make_array_from_process_local_data branch, and the per-host batch
  slicing serve exactly the single-controller semantics.
- Inside each worker, the native RRD loader's multi-process slicing
  (``NativeDeviceLoader._multiproc_epoch_indices``) is checked
  batch-for-batch against the in-memory loader.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _write_rrd(tmp_path) -> str:
    from midi_vae_tpu.native.rrd import native_available, write_rrd

    if not native_available():
        return ""
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (64, 16, 16, 1), dtype=np.uint8)
    path = str(tmp_path / "mp.rrd")
    write_rrd(images, np.arange(64, dtype=np.int64), path)
    return path


def _run_topology(n_procs: int, devices_per_proc: int, out_base: str, rrd_path: str,
                  mesh_slices: int = 0):
    """Launch n_procs workers; return the npz written by process 0."""
    port = _free_port()
    env_base = os.environ.copy()
    env_base.pop("JAX_PLATFORMS", None)
    flags = env_base.get("XLA_FLAGS", "")
    flags = " ".join(f for f in flags.split() if "--xla_force_host_platform_device_count" not in f)
    env_base["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={devices_per_proc}"
    ).strip()

    procs = []
    for pid in range(n_procs):
        env = dict(
            env_base,
            MP_NUM_PROCESSES=str(n_procs),
            MP_PROCESS_ID=str(pid),
            MP_COORD=f"127.0.0.1:{port}",
            MP_GLOBAL_DEVICES=str(n_procs * devices_per_proc),
            MP_OUT=f"{out_base}_{n_procs}p.npz",
            MP_RRD_PATH=rrd_path,
            MP_MESH_SLICES=str(mesh_slices),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outputs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(f"--- process {pid} (rc={p.returncode}) ---\n{out}")
    assert all(p.returncode == 0 for p in procs), "\n".join(outputs)
    return np.load(f"{out_base}_{n_procs}p.npz")


@pytest.mark.slow
def test_two_processes_match_single_process(tmp_path):
    rrd_path = _write_rrd(tmp_path)
    out_base = str(tmp_path / "result")
    multi = _run_topology(2, 2, out_base, rrd_path)
    single = _run_topology(1, 4, out_base, rrd_path)

    # Same 4-device mesh, same partitioning, same data routing: per-step
    # losses agree to float32 noise. Parameters agree up to reduction-order
    # rounding — the cross-process psum (gRPC collective) and the
    # intra-process one sum shards in different orders, and Adam's
    # 1/sqrt(v) preconditioner amplifies the ulp-level gradient noise on
    # tiny-v entries over the 16 steps. A misrouted SAMPLE would move the
    # losses by ~1e-2; these bounds rule that out while tolerating rounding.
    np.testing.assert_allclose(multi["losses"], single["losses"], rtol=0, atol=1e-5)
    diff = np.abs(multi["params"] - single["params"])
    assert diff.max() < 5e-3, f"param drift {diff.max()} exceeds rounding-level bound"
    assert (diff > 1e-6).mean() < 0.05, f"{(diff > 1e-6).mean():.1%} of params drifted >1e-6"
    # The IWAE bound (device-side masked reductions) is topology-invariant:
    # 2-process and 1-process runs over the same mesh compute the same
    # held-out bound (this is the --final-iwae-on-pods contract). The
    # tolerance is set by the PARAM drift bounded above, not by the bound's
    # own reductions: each worker evaluates its own trained params, which
    # differ by up to 5e-3 (reduction order × Adam), and the bound inherits
    # that at roughly |∂bound/∂θ|·drift ~ 1e-3 on this model. A routing or
    # masking bug would move it by whole nats.
    np.testing.assert_allclose(multi["iwae"], single["iwae"], rtol=0, atol=2e-2)
    if rrd_path:
        assert str(multi["rrd_status"]) == "ok"
        assert str(single["rrd_status"]) == "ok"


@pytest.mark.slow
def test_multislice_two_processes_match_single_process(tmp_path):
    """Multislice mesh under real multi-controller SPMD, one process per
    slice — the deployment mapping where the slice axis IS the process
    (DCN) boundary. 2 procs x 2 devices and 1 proc x 4 devices both build
    the (2, 2) (slice, data) mesh; training must agree."""
    out_base = str(tmp_path / "ms")
    multi = _run_topology(2, 2, out_base, "", mesh_slices=2)
    single = _run_topology(1, 4, out_base, "", mesh_slices=2)
    np.testing.assert_allclose(multi["losses"], single["losses"], rtol=0, atol=1e-5)
    diff = np.abs(multi["params"] - single["params"])
    assert diff.max() < 5e-3, f"param drift {diff.max()} exceeds rounding-level bound"
    assert (diff > 1e-6).mean() < 0.05, f"{(diff > 1e-6).mean():.1%} of params drifted >1e-6"
