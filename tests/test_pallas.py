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
