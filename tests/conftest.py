"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding tests run on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), mirroring how the
driver dry-runs the multi-chip path. Must run before jax is imported.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Tests always run on the virtual CPU mesh (the driver benches on real TPU).
# The axon sitecustomize force-registers the TPU platform and overrides
# jax_platforms config, so we must override it back after import.
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module. A full-suite
    run accumulates hundreds of XLA:CPU executables in one process and
    has segfaulted inside backend_compile deep into the run (same spot
    twice); modules share almost no jits, so dropping the caches costs
    nothing and keeps the process footprint flat."""
    yield
    jax.clear_caches()
