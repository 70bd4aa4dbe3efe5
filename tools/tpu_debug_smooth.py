"""Isolate TPU-vs-oracle divergence: compare each smooth-kernel output
and then the solve outputs on the chip."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from humanoid_mujoco_tpu.physics import humanoid, pallas_smooth
from humanoid_mujoco_tpu.physics.model import make_state

NAMES = ("M", "qfrc_smooth", "cdof", "rel", "nrm", "dist", "mu3",
         "kc", "bc", "dc", "lpos", "kl", "bl", "dl", "xpos", "xquat",
         "xipos", "bcv", "site_xpos", "anchor", "com_vel", "actf")


def main():
    m = humanoid.build_humanoid()
    B = 8
    q0 = humanoid.stand_qpos(m)
    key = jax.random.PRNGKey(0)
    qpos = jnp.tile(q0, (B, 1)).at[:, 7:].add(
        0.05 * jax.random.normal(key, (B, 12))).astype(jnp.float32)
    qvel = (0.2 * jax.random.normal(jax.random.PRNGKey(1), (B, 18))
            ).astype(jnp.float32)
    ctrl = (0.3 * jax.random.normal(jax.random.PRNGKey(2), (B, 12))
            ).astype(jnp.float32)

    params = pallas_smooth._pack_params(m)
    out = jax.jit(lambda a, b, c: pallas_smooth.smooth_batched(
        m.struct, a, b, c, None, params))(qpos, qvel, ctrl)
    ref = jax.jit(jax.vmap(lambda a, b, c:
                           pallas_smooth.jax_smooth_single(m, a, b, c)))(
        qpos, qvel, ctrl)
    worst = {}
    for name, r, o in zip(NAMES, ref, out):
        r = np.asarray(r, np.float64)
        o = np.asarray(o, np.float64)
        if name == "dist":
            sel = r < 1e8
            r, o = r[sel], o[sel]
        scale = np.max(np.abs(r)) + 1e-9
        err = np.max(np.abs(r - o)) if r.size else 0.0
        worst[name] = err / scale
        print(f"{name:12s} rel {err/scale:.3e}  scale {scale:.3e}",
              flush=True)

    # solve stage on top of the REFERENCE smooth outputs
    from humanoid_mujoco_tpu.physics import pallas_solver
    from humanoid_mujoco_tpu.physics.solver import (contact_dmask,
                                                    limit_rows_static)
    (M, qfs, cdof, rel, nrm, dist, mu3, kc, bc, dc,
     lpos, kl, bl, dl) = [np.asarray(x) for x in ref[:14]]
    dmask = contact_dmask(m)
    hd = np.broadcast_to(np.asarray(m.dt * m.dof_damping, np.float32),
                         (B, 18))
    dt = np.broadcast_to(np.asarray(m.dt, np.float32), (B,))
    kw = dict(lim_tab=limit_rows_static(m), niter=8)
    sout = jax.jit(lambda *a: pallas_solver.fused_rows_batched(
        *a, **kw))(M, qfs, qvel, cdof, rel, nrm, dist, mu3,
                   jnp.asarray(dmask), kc, bc, dc, lpos, kl, bl, dl,
                   hd, dt)
    sref = jax.jit(jax.vmap(lambda *a: pallas_solver._jax_single_raw(
        *a, lim_tab=limit_rows_static(m), niter=8, ls_iter=16)))(
        M, qfs, qvel, cdof, rel, nrm, dist, mu3,
        jnp.broadcast_to(jnp.asarray(dmask), (B,) + dmask.shape),
        kc, bc, dc, lpos, kl, bl, dl, hd, dt)
    for name, r, o in zip(("qacc", "qvel_new", "fslot", "qfc"),
                          sref, sout):
        r = np.asarray(r, np.float64)
        o = np.asarray(o, np.float64)
        scale = np.max(np.abs(r)) + 1e-9
        err = np.max(np.abs(r - o))
        print(f"solve {name:10s} rel {err/scale:.3e}  scale {scale:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
