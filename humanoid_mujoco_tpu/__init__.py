"""humanoid_mujoco_tpu — a TPU-native MPC, trajectory-optimization and RL framework.

A from-scratch rebuild of the capabilities of mcgill-robotics/Humanoid-MuJoCo
(MJPC planners + Gymnasium RL stack for a 12-DOF mini humanoid), designed
TPU-first:

  * physics: batched rigid-body dynamics written in pure JAX (vmap/lax.scan
    friendly, fixed shapes, branch-free contact solve) — not a port of the
    MuJoCo C core.
  * planners: predictive sampling, cross-entropy, MPPI, iLQG (Riccati scan),
    iLQS, gradient, robust and sample-gradient planners as pure functions of
    pytree state.
  * parallel: candidate-rollout fan-out over `jax.sharding.Mesh` with
    on-device elite reductions (psum/argmin over ICI).
  * rl: on-device lockstep environment batch with the reference's domain
    randomization + PPO/SAC in JAX.

Reference behavior citations point into mcgill-robotics/Humanoid-MuJoCo
(e.g. mjpc/planners/sampling/planner.cc) and are for parity bookkeeping only.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache. The tunneled TPU backend compiles
# 5-10x slower than local XLA (docs/NOTES.md), and every CLI entry point
# (bench, train, serving, experiments) re-jits the same physics modules;
# caching compiled executables across processes removes that cost.
# Opt out with HMT_NO_COMPILE_CACHE=1; relocate with HMT_COMPILE_CACHE.
# CPU runs skip the cache: XLA:CPU AOT executables are machine-feature
# specific (loading one compiled on a different host warns "could lead
# to execution errors such as SIGILL" and has produced hangs), and CPU
# compiles are fast anyway — the cache exists for the slow TPU tunnel.
if (_os.environ.get("HMT_NO_COMPILE_CACHE") != "1"
        and "cpu" not in _os.environ.get("JAX_PLATFORMS", "").lower()
        and _os.environ.get("JAX_PLATFORMS", "") != ""):
    # JAX_PLATFORMS unset means the default-backend fallback may be CPU
    # (no TPU plugin): skip the cache there too — only an explicitly
    # requested non-CPU platform benefits, and CPU AOT executables are
    # machine-feature specific (SIGILL risk, see above).
    import jax as _jax

    _cache = _os.environ.get(
        "HMT_COMPILE_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "hmt_xla"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
    except Exception:  # older jax without the knob: run uncached
        pass
