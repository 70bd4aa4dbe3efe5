"""Fused-kernel (pallas_solver) tests.

The kernel itself targets TPU; on the CPU test platform it runs in
pallas interpret mode, which executes the same kernel program with jnp
semantics — validating the kernel logic (layout transposes, in-kernel
Cholesky/solves, Newton loop, linesearch, Euler fold-in) against the
pure-JAX path (solver.newton_solve + the step-level Euler solve).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from humanoid_mujoco_tpu.physics import humanoid, pallas_solver
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.physics.step import _prepare


@pytest.fixture(scope="module")
def batch_args():
    m = humanoid.build_humanoid()
    q0 = humanoid.stand_qpos(m)
    B = 5

    def prep_one(dq, dv):
        s = make_state(m, qpos=q0.at[7:].add(dq),
                       qvel=jnp.zeros(18).at[:].add(dv))
        _, _, M, qf, _, _, _, rows = _prepare(m, s, 0.2 * jnp.ones(12),
                                              None)
        return (M, qf, s.qvel, rows.J, rows.pos, rows.k, rows.b, rows.d)

    dqs = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (B, 12))
    dvs = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, 18))
    args = jax.vmap(prep_one)(dqs, dvs)
    args = tuple(a.astype(jnp.float32) for a in args)
    hdamp = jnp.broadcast_to(m.dt * m.dof_damping,
                             (B, 18)).astype(jnp.float32)
    dt = jnp.broadcast_to(m.dt, (B,)).astype(jnp.float32)
    return args + (hdamp, dt)


class TestFusedKernel:
    def test_interpret_matches_jax_path(self, batch_args):
        """Kernel program == JAX solver arithmetic, to f32 rounding."""
        ref = jax.vmap(lambda *a: pallas_solver._jax_single(
            *a, niter=8, ls_iter=16))(*batch_args)
        out = pallas_solver.fused_batched(*batch_args, interpret=True)
        names = ["qacc", "qvel_new", "f", "qfrc_constraint"]
        for name, r, o in zip(names, ref, out):
            scale = float(jnp.max(jnp.abs(r))) + 1e-9
            err = float(jnp.max(jnp.abs(r - o)))
            assert err / scale < 5e-5, (name, err, scale)

    def test_batch_padding(self, batch_args):
        """B=5 pads to one 128-lane tile; padding lanes must not leak."""
        out5 = pallas_solver.fused_batched(*batch_args, interpret=True)
        one = tuple(a[2:3] for a in batch_args)
        out1 = pallas_solver.fused_batched(*one, interpret=True)
        for a, b in zip(out5, out1):
            np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[0]),
                                       atol=1e-5)

    def test_disabled_off_tpu(self):
        """On the CPU test platform the dispatch must take the JAX path
        (enabled() false), keeping every jax transform available."""
        assert jax.default_backend() == "cpu"
        assert not pallas_solver.enabled()

    def test_rows_from_raw_matches_make_rows(self):
        """The raw-input row builder (the fused kernel's oracle) must
        reproduce make_rows exactly, modulo its edge-major row order."""
        from humanoid_mujoco_tpu.physics.solver import (
            contact_raw, limit_rows_data, limit_rows_static, make_rows,
            rows_from_raw)
        from humanoid_mujoco_tpu.physics.step import _prepare_smooth
        m = humanoid.build_humanoid()
        s = make_state(m, qpos=humanoid.stand_qpos(m).at[7:].add(
            0.05 * jax.random.normal(jax.random.PRNGKey(3), (12,))))
        kin, _, _, _, _, c, sel = _prepare_smooth(m, s, jnp.zeros(12),
                                                  None)
        rows = make_rows(m, kin, s.qpos, s.qvel, c, sel)
        dmask, rel, mu3, kc, bc, dc = contact_raw(m, kin, c, sel)
        lpos, kl, bl, dl = limit_rows_data(m, s.qpos)
        lim_tab = limit_rows_static(m)
        rows2 = rows_from_raw(kin.cdof, dmask, rel, c.normal, c.dist,
                              mu3, kc, bc, dc, lim_tab, lpos, kl, bl, dl)
        nlim = lpos.shape[0]
        K = c.dist.shape[0]
        np.testing.assert_allclose(np.asarray(rows.J[:nlim]),
                                   np.asarray(rows2.J[:nlim]), atol=1e-12)
        # contact-major (c*10+e) vs edge-major (e*K+c)
        J1 = np.asarray(rows.J[nlim:]).reshape(K, 10, -1).transpose(
            1, 0, 2)
        J2 = np.asarray(rows2.J[nlim:]).reshape(10, K, -1)
        np.testing.assert_allclose(J1, J2, atol=1e-5)
        for name in ("pos", "k", "b", "d"):
            a = np.asarray(getattr(rows, name)[nlim:]).reshape(K, 10).T
            b = np.asarray(getattr(rows2, name)[nlim:]).reshape(10, K)
            np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_rows_kernel_interpret_matches_jax_raw(self):
        """The row-BUILDING kernel program (interpret mode) == the pure
        JAX raw path, batched, both static and gathered dmask."""
        from humanoid_mujoco_tpu.physics.solver import (
            contact_raw, limit_rows_data, limit_rows_static)
        from humanoid_mujoco_tpu.physics.step import _prepare_smooth
        m = humanoid.build_humanoid()
        q0 = humanoid.stand_qpos(m)
        B = 4
        lim_tab = limit_rows_static(m)

        def prep_one(dq):
            s = make_state(m, qpos=q0.at[7:].add(dq))
            kin, _, M, qf, _, c, sel = _prepare_smooth(
                m, s, 0.1 * jnp.ones(12), None)
            dmask, rel, mu3, kc, bc, dc = contact_raw(m, kin, c, sel)
            lpos, kl, bl, dl = limit_rows_data(m, s.qpos)
            return (M, qf, s.qvel, kin.cdof, rel, c.normal, c.dist, mu3,
                    dmask, kc, bc, dc, lpos, kl, bl, dl)

        dqs = 0.04 * jax.random.normal(jax.random.PRNGKey(7), (B, 12))
        args = [a.astype(jnp.float32) for a in jax.vmap(prep_one)(dqs)]
        hd = jnp.broadcast_to(m.dt * m.dof_damping, (B, 18)).astype(
            jnp.float32)
        dt = jnp.full((B,), m.dt, jnp.float32)
        full = args + [hd, dt]
        ref = jax.vmap(lambda *a: pallas_solver._jax_single_raw(
            *a, lim_tab=lim_tab, niter=8, ls_iter=16))(*full)
        out = pallas_solver.fused_rows_batched(*full, lim_tab=lim_tab,
                                               interpret=True)
        for name, r, o in zip(["qacc", "qvn", "fslot", "qfc"], ref, out):
            scale = float(jnp.max(jnp.abs(r))) + 1e-9
            err = float(jnp.max(jnp.abs(r - o)))
            assert err / scale < 5e-4, ("dynamic", name, err, scale)

        # static-dmask variant needs selection OFF (with top-k each env
        # orders slots differently; the shared table is only valid for
        # the canonical slot layout)
        import dataclasses as dc
        m0 = dc.replace(m, struct=dc.replace(m.struct, max_contacts=0))

        def prep_nosel(dq):
            s = make_state(m0, qpos=q0.at[7:].add(dq))
            kin, _, M, qf, _, c, sel = _prepare_smooth(
                m0, s, 0.1 * jnp.ones(12), None)
            assert sel is None
            dmask, rel, mu3, kc, bc, dc_ = contact_raw(m0, kin, c, sel)
            lpos, kl, bl, dl = limit_rows_data(m0, s.qpos)
            return (M, qf, s.qvel, kin.cdof, rel, c.normal, c.dist, mu3,
                    dmask, kc, bc, dc_, lpos, kl, bl, dl)

        args0 = [a.astype(jnp.float32)
                 for a in jax.vmap(prep_nosel)(dqs)]
        full0 = args0 + [hd, dt]
        ref0 = jax.vmap(lambda *a: pallas_solver._jax_single_raw(
            *a, lim_tab=lim_tab, niter=8, ls_iter=16))(*full0)
        full0[8] = full0[8][0]           # shared static (K, nv) table
        out0 = pallas_solver.fused_rows_batched(*full0, lim_tab=lim_tab,
                                                interpret=True)
        for name, r, o in zip(["qacc", "qvn", "fslot", "qfc"], ref0,
                              out0):
            scale = float(jnp.max(jnp.abs(r))) + 1e-9
            err = float(jnp.max(jnp.abs(r - o)))
            assert err / scale < 5e-4, ("static", name, err, scale)

    def test_step_jvp_works_on_cpu(self):
        """jacfwd through step (ift=False) still works off-TPU — the
        dispatcher must not wrap the JAX path in custom_vmap there."""
        from humanoid_mujoco_tpu.physics.step import step
        m = humanoid.build_humanoid()
        s = make_state(m, qpos=humanoid.stand_qpos(m))

        def f(u):
            s2, _ = step(m, s, u)
            return s2.qvel

        jac = jax.jacfwd(f)(jnp.zeros(12))
        assert np.all(np.isfinite(np.asarray(jac)))
