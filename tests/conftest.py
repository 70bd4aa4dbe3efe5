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

# Persistent compile cache for the CPU test mesh: big-model test
# compiles dominate suite wall time on small hosts (a humanoid21 step
# alone compiles for minutes on 4 cores). The cache directory is
# repo-local and only ever used by this host's test runs, so the
# cross-host AOT/SIGILL concern that keeps the package-level cache
# TPU-only (humanoid_mujoco_tpu/__init__.py) does not apply. Delete
# .jax_cache_tests/ to invalidate; HMT_NO_COMPILE_CACHE=1 opts out.
if os.environ.get("HMT_NO_COMPILE_CACHE") != "1":
    _cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          os.pardir, ".jax_cache_tests")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(_cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          5.0)
    except Exception:
        pass
