"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh
(``--xla_force_host_platform_device_count=8``), per SURVEY §4
"Distributed without a cluster": sharding/collective behavior is
validated without TPU hardware. Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize may have imported jax already and forced
# the TPU plugin platform; override after import, before backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
