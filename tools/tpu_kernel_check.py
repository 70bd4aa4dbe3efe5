"""On-chip validation + timing of the fused kernels (round-5 perf work).

1. Parity: one batched step through the smooth-kernel fast path vs the
   pure-JAX path (use_pallas=False) on realistic stand states.
2. Timing: the bench.py headline workload (1024 x 100 rollout).

Run on the TPU:  python tools/tpu_kernel_check.py [--time-only]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from humanoid_mujoco_tpu.physics import humanoid
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.physics.step import step
from humanoid_mujoco_tpu.utils.timing import fetch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--time-only", action="store_true")
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    m = humanoid.build_humanoid()
    s0 = make_state(m, qpos=humanoid.stand_qpos(m))
    B = args.batch
    key = jax.random.PRNGKey(0)
    qpos_b = jnp.tile(s0.qpos, (B, 1)).at[:, 7:].add(
        0.05 * jax.random.normal(key, (B, 12)))
    sb = jax.tree.map(lambda x: jnp.tile(x, (B,) + (1,) * x.ndim), s0)
    sb = sb.replace(qpos=qpos_b,
                    qvel=0.2 * jax.random.normal(jax.random.PRNGKey(1),
                                                 (B, 18)))
    ctrl = 0.3 * jax.random.normal(jax.random.PRNGKey(2), (B, 12))

    if not args.time_only:
        from humanoid_mujoco_tpu.physics import pallas_smooth, pallas_solver
        from humanoid_mujoco_tpu.physics.solver import (contact_dmask,
                                                        limit_rows_static)
        from humanoid_mujoco_tpu.physics.step import integrate_pos

        f_fast = jax.jit(jax.vmap(lambda s, c: step(m, s, c)))

        # exact oracle: the SAME selection-free pipeline in pure JAX
        lim_tab = limit_rows_static(m)
        dmask = contact_dmask(m)

        def ref_one(s, c):
            out = pallas_smooth.jax_smooth_single(m, s.qpos, s.qvel, c)
            (M, qfs, cdof, rel, nrm, dist, mu3, kc, bc, dc,
             lpos, kl, bl, dl) = out[:14]
            qacc, qvn, fslot, qfc = pallas_solver._jax_single_raw(
                M, qfs, s.qvel, cdof, rel, nrm, dist, mu3, dmask,
                kc, bc, dc, lpos, kl, bl, dl,
                jnp.asarray(m.dt) * m.dof_damping, jnp.asarray(m.dt),
                lim_tab=lim_tab, niter=8, ls_iter=16)
            qpos_new = integrate_pos(m, s.qpos, qvn, m.dt)
            return qpos_new, qvn, qacc, fslot

        f_ref = jax.jit(jax.vmap(ref_one))
        t0 = time.perf_counter()
        sf, inf_f = jax.tree.map(np.asarray, f_fast(sb, ctrl))
        print(f"fast-path compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        qpos_r, qvn_r, qacc_r, fslot_r = jax.tree.map(
            np.asarray, f_ref(sb, ctrl))
        print(f"oracle    compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        for name, a, b in (("qpos", sf.qpos, qpos_r),
                           ("qvel", sf.qvel, qvn_r),
                           ("qacc", inf_f.qacc, qacc_r),
                           ("contact_force", inf_f.contact_force,
                            fslot_r)):
            scale = np.max(np.abs(b)) + 1e-9
            err = np.max(np.abs(a - b))
            print(f"{name:14s} rel {err/scale:.3e} (scale {scale:.2e})",
                  flush=True)
            assert err / scale < 5e-4, name
        print("PARITY OK (selection-free oracle)", flush=True)

        # report-only: the legacy top-k path differs on knife-edge
        # states (docs/NOTES.md round-5) — documented, not asserted
        f_leg = jax.jit(jax.vmap(lambda s, c: step(m, s, c,
                                                   use_pallas=False)))
        sl, _ = jax.tree.map(np.asarray, f_leg(sb, ctrl))
        print(f"legacy top-k path qvel max|diff| "
              f"{np.max(np.abs(sl.qvel - sf.qvel)):.3e} (report only)",
              flush=True)

    # headline timing
    from humanoid_mujoco_tpu.rollout import rollout_spline
    from humanoid_mujoco_tpu.tasks import stand_task
    from humanoid_mujoco_tpu.planners.policy import init_policy
    from humanoid_mujoco_tpu.ops.spline import SplineOrder
    task = stand_task()
    pol = init_policy(m, 3)
    vb = jnp.tile(pol.values, (B, 1, 1)) + 0.02 * jax.random.normal(
        jax.random.PRNGKey(3), (B, 3, m.struct.nu))

    @jax.jit
    def run(sb, vb):
        def one(s, v):
            return rollout_spline(m, task, s, pol.times, v,
                                  SplineOrder.ZERO, 100).total_return
        return jnp.sum(jax.vmap(one)(sb, vb))

    t0 = time.perf_counter()
    fetch(run(sb, vb))
    print(f"rollout compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        fetch(run(sb, vb))
        best = min(best, time.perf_counter() - t0)
    print(f"rollout 1024x100: {best*1e3:.1f} ms  "
          f"({B*100/best/1e3:.0f}k steps/s)", flush=True)


if __name__ == "__main__":
    main()
