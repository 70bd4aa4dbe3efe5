"""RL env on the smooth-kernel path: on-chip sanity + throughput.

The env's ModelPatch leaves are per-env-batched; with per-lane param
streaming the fused smooth kernel now serves env_step too. Checks
10 scan-fused steps stay finite and reward-plausible, then times the
4096-env loop (bench.py's rl_env4096 config).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from humanoid_mujoco_tpu.rl.env import (EnvConfig, batch_reset, batch_step,
                                        rl_humanoid_model)
from humanoid_mujoco_tpu.utils.timing import fetch


def main():
    print("backend:", jax.default_backend(), flush=True)
    nenv = 4096
    base = rl_humanoid_model()
    cfg = EnvConfig(standup=True)
    es, obs0 = jax.jit(lambda k: batch_reset(
        cfg, base, jnp.asarray(0.5), k))(
            jax.random.split(jax.random.PRNGKey(0), nenv))
    acts = jnp.zeros((nenv, 12))

    @jax.jit
    def roll10(e):
        def body(e, _):
            e, o, r, t_, tr = batch_step(cfg, base, e, acts)
            return e, (r, o)
        e, (rs, os_) = jax.lax.scan(body, e, None, length=10)
        return e, rs, os_

    t0 = time.perf_counter()
    e2, rs, os_ = roll10(es)
    rs = np.asarray(rs)
    os_ = np.asarray(os_)
    print(f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    print("rewards finite:", bool(np.isfinite(rs).all()),
          " mean:", float(rs.mean()), " obs finite:",
          bool(np.isfinite(os_).all()))
    qp = np.asarray(e2.phys.qpos)
    print("qpos finite:", bool(np.isfinite(qp).all()),
          " root z range:", float(qp[:, 2].min()), float(qp[:, 2].max()))
    assert np.isfinite(rs).all() and np.isfinite(os_).all()
    assert np.isfinite(qp).all()

    @jax.jit
    def timed_roll(e):
        def body(e, _):
            e, o, r, t_, tr = batch_step(cfg, base, e, acts)
            return e, r
        e, rs = jax.lax.scan(body, e, None, length=10)
        return jnp.sum(e.phys.qpos) + jnp.sum(rs)

    fetch(timed_roll(es))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        fetch(timed_roll(es))
        best = min(best, time.perf_counter() - t0)
    print(f"rl_env4096 scan10: {best*1e3:.1f} ms "
          f"({nenv*10/best/1e3:.0f}k env-steps/s)", flush=True)


if __name__ == "__main__":
    main()
