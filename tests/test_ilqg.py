"""iLQG tests: tangent-space maps, AD-vs-FD Jacobians, analytic LQR
oracle for the Riccati backward pass (the reference's test strategy,
mjpc/test/lqr.cc + ilqg_planner/backward_pass_test.cc), and
cost-decrease planner checks on the pendulum.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mujoco_tpu.physics import humanoid
from humanoid_mujoco_tpu.physics.model import (ActuatorType, JointType,
                                               ModelBuilder, State,
                                               make_state)
from humanoid_mujoco_tpu.physics.tangent import (qpos_diff, state_add,
                                                 state_diff)
from humanoid_mujoco_tpu.planners.derivatives import (Derivatives,
                                                      step_tangent_jacobians,
                                                      trajectory_derivatives)
from humanoid_mujoco_tpu.planners.ilqg import (ILQGConfig, backward_pass,
                                               ilqg_action, ilqg_init,
                                               ilqg_plan)
from humanoid_mujoco_tpu.tasks.base import TermSpec, make_task
from humanoid_mujoco_tpu.ops.norms import NormType

F64 = jnp.float64


def pendulum_model(dt=0.01):
    b = ModelBuilder(dt=dt)
    b.has_floor = False
    body = b.add_body("pend", -1, mass=1.0, ipos=(0, 0, -0.5),
                      inertia=(0.05, 0.05, 0.001))
    jnt = b.add_joint("hinge", body, JointType.HINGE, axis=(0, 1, 0),
                      damping=0.1)
    b.add_actuator(jnt, ActuatorType.MOTOR, gear=1.0, ctrlrange=(-10, 10),
                   forcerange=(-10, 10))
    return b.finalize(dtype=F64)


def pendulum_task():
    # drive the joint to angle pi (upright) with small control
    def residual(m, task, state, info, ctrl):
        return jnp.concatenate([
            jnp.asarray([state.qpos[0] - task.params[0],
                         state.qvel[0]]), ctrl])

    terms = (TermSpec("angle", 1, NormType.QUADRATIC),
             TermSpec("vel", 1, NormType.QUADRATIC),
             TermSpec("ctrl", 1, NormType.QUADRATIC))
    return make_task("pend-swing", terms, residual, (10.0, 0.1, 0.01),
                     params=(np.pi,), param_names=("target",), dtype=F64)


class TestTangent:
    def test_add_diff_roundtrip_humanoid(self):
        m = humanoid.build_humanoid(dtype=F64)
        rng = np.random.default_rng(3)
        q0 = jnp.asarray(np.array(humanoid.stand_qpos(m)))
        dq = jnp.asarray(rng.uniform(-0.1, 0.1, size=m.nv))
        q1 = state_add(m, q0, dq)
        back = qpos_diff(m, q1, q0)
        np.testing.assert_allclose(np.array(back), np.array(dq), atol=1e-12)

    def test_diff_add_roundtrip(self):
        m = humanoid.build_humanoid(dtype=F64)
        rng = np.random.default_rng(4)
        q0 = jnp.asarray(np.array(humanoid.stand_qpos(m)))
        q1 = state_add(m, q0, jnp.asarray(rng.uniform(-0.2, 0.2, m.nv)))
        dq = qpos_diff(m, q1, q0)
        q1b = state_add(m, q0, dq)
        np.testing.assert_allclose(np.array(q1b), np.array(q1), atol=1e-12)


class TestJacobians:
    def test_ad_jacobian_matches_fd_pendulum(self):
        m = pendulum_model()
        s = make_state(m, qpos=jnp.asarray([0.7], dtype=F64),
                       qvel=jnp.asarray([0.3], dtype=F64))
        u = jnp.asarray([0.2], dtype=F64)
        from humanoid_mujoco_tpu.physics.step import step
        s1, _ = step(m, s, u)
        A, B = step_tangent_jacobians(m, s.qpos, s.qvel, u, s.time,
                                      s1.qpos, s1.qvel)
        # FD reference
        eps = 1e-6

        def f(qp, qv, uu):
            s2, _ = step(m, State(qp, qv, s.time), uu)
            return np.concatenate([np.array(s2.qpos), np.array(s2.qvel)])

        A_fd = np.zeros((2, 2))
        base = f(s.qpos, s.qvel, u)
        A_fd[:, 0] = (f(s.qpos + eps, s.qvel, u) - base) / eps
        A_fd[:, 1] = (f(s.qpos, s.qvel + eps, u) - base) / eps
        B_fd = ((f(s.qpos, s.qvel, u + eps) - base) / eps).reshape(2, 1)
        np.testing.assert_allclose(np.array(A), A_fd, atol=1e-5)
        np.testing.assert_allclose(np.array(B), B_fd, atol=1e-5)


    def test_ift_jacobian_matches_fd_humanoid_in_contact(self):
        """IFT derivatives through the contact Newton solve (VERDICT
        round-1 lead): jacfwd with ift=True must match central finite
        differences of the fully-converged step at the stand pose, where
        both feet are in contact."""
        from humanoid_mujoco_tpu.physics.step import step
        from humanoid_mujoco_tpu.physics.tangent import state_add

        m = humanoid.build_humanoid(dtype=F64)
        m = m.replace(dt=jnp.asarray(0.02, dtype=F64))
        qpos = humanoid.stand_qpos(m)
        qvel = jnp.zeros(m.nv, dtype=F64)
        u = jnp.zeros(m.nu, dtype=F64)
        t0 = jnp.asarray(0.0, dtype=F64)
        s1, _ = step(m, State(qpos, qvel, t0), u, solver_iters=30)

        A, B = step_tangent_jacobians(m, qpos, qvel, u, t0,
                                      s1.qpos, s1.qvel,
                                      solver_iters=12, ift=True)

        nv, nu = m.nv, m.nu
        fd_step = jax.jit(lambda dx, du: step(
            m, State(state_add(m, qpos, dx[:nv]), qvel + dx[nv:], t0),
            u + du, solver_iters=30))

        def fd_col(dx, du):
            (sp, _), (sm, _) = fd_step(dx, du), fd_step(-dx, -du)
            d = state_diff(m, sp.qpos, sp.qvel, sm.qpos, sm.qvel)
            return np.asarray(d) / (2 * 1e-6)

        rng = np.random.default_rng(0)
        cols = rng.choice(2 * nv, size=6, replace=False)
        for i in cols:
            dx = np.zeros(2 * nv)
            dx[i] = 1e-6
            np.testing.assert_allclose(
                np.asarray(A[:, i]), fd_col(jnp.asarray(dx),
                                            jnp.zeros(nu, dtype=F64)),
                atol=5e-4, err_msg=f"A col {i}")
        for i in rng.choice(nu, size=3, replace=False):
            du = np.zeros(nu)
            du[i] = 1e-6
            np.testing.assert_allclose(
                np.asarray(B[:, i]),
                fd_col(jnp.zeros(2 * nv, dtype=F64), jnp.asarray(du)),
                atol=5e-4, err_msg=f"B col {i}")


class TestBackwardPassLQR:
    def test_matches_numpy_riccati(self):
        # random stable linear system + quadratic cost: K, du from
        # backward_pass must equal the textbook finite-horizon LQR
        rng = np.random.default_rng(0)
        T, nx, nu = 12, 4, 2
        A = np.stack([np.eye(nx) + 0.05 * rng.standard_normal((nx, nx))
                      for _ in range(T)])
        B = np.stack([0.1 * rng.standard_normal((nx, nu))
                      for _ in range(T)])
        Q = np.eye(nx) * 0.5
        R = np.eye(nu) * 0.2
        q = rng.standard_normal((T, nx)) * 0.1
        r = rng.standard_normal((T, nu)) * 0.1

        derivs = Derivatives(
            A=jnp.asarray(A), B=jnp.asarray(B),
            cx=jnp.asarray(q), cu=jnp.asarray(r),
            cxx=jnp.asarray(np.tile(Q, (T, 1, 1))),
            cxu=jnp.zeros((T, nx, nu), dtype=F64),
            cuu=jnp.asarray(np.tile(R, (T, 1, 1))))
        du, K, dV = backward_pass(derivs, jnp.asarray(0.0, dtype=F64))

        # numpy oracle
        Vx = np.zeros(nx)
        Vxx = np.zeros((nx, nx))
        K_ref = np.zeros((T, nu, nx))
        du_ref = np.zeros((T, nu))
        for t in reversed(range(T)):
            Qx = q[t] + A[t].T @ Vx
            Qu = r[t] + B[t].T @ Vx
            Qxx = Q + A[t].T @ Vxx @ A[t]
            Qux = B[t].T @ Vxx @ A[t]
            Quu = R + B[t].T @ Vxx @ B[t]
            Kt = -np.linalg.solve(Quu, Qux)
            dut = -np.linalg.solve(Quu, Qu)
            K_ref[t] = Kt
            du_ref[t] = dut
            Vx = Qx + Kt.T @ (Quu @ dut + Qu) + Qux.T @ dut
            Vxx = Qxx + Kt.T @ (Quu @ Kt + Qux) + Qux.T @ Kt
            Vxx = 0.5 * (Vxx + Vxx.T)

        np.testing.assert_allclose(np.array(K), K_ref, atol=1e-9)
        np.testing.assert_allclose(np.array(du), du_ref, atol=1e-9)


class TestILQGPendulum:
    def test_cost_decreases_and_reaches_target(self):
        m = pendulum_model(dt=0.05)
        task = pendulum_task()
        s0 = make_state(m)
        cfg = ILQGConfig(horizon=30, n_linesearch=6, solver_iters=2,
                         deriv_solver_iters=2)
        ps = ilqg_init(m, cfg, s0)
        plan = jax.jit(lambda ps, s: ilqg_plan(m, task, cfg, ps, s))
        returns = []
        nominal0 = None
        for _ in range(12):
            ps, info = plan(ps, s0)
            if nominal0 is None:
                nominal0 = float(info.nominal_return)
            returns.append(float(info.best_return))
        # large reduction vs the zero-policy nominal (measured 1480 -> 274)
        assert returns[-1] < nominal0 * 0.25
        # near-monotone: accepted iterations never increase best return
        # beyond numerical wiggle
        assert returns[-1] <= min(returns) * 1.01
        # final nominal trajectory approaches the target angle
        final_angle = float(ps.policy.qpos_nom[-1, 0])
        assert abs(final_angle - np.pi) < 0.5

    def test_feedback_action_rejects_perturbation(self):
        m = pendulum_model(dt=0.05)
        task = pendulum_task()
        s0 = make_state(m)
        cfg = ILQGConfig(horizon=30, n_linesearch=6, solver_iters=2,
                         deriv_solver_iters=2)
        ps = ilqg_init(m, cfg, s0)
        plan = jax.jit(lambda ps, s: ilqg_plan(m, task, cfg, ps, s))
        for _ in range(8):
            ps, _ = plan(ps, s0)
        pol = ps.policy
        u = np.asarray(pol.u_nom).ravel()
        K = np.asarray(pol.K).reshape(len(u), -1)
        # boxQP semantics (backward_pass.cc:158-196): gains are ZEROED on
        # knots where the control is clamped at its limit...
        saturated = np.abs(u) >= 10.0 - 1e-6
        assert saturated[:3].all()  # swing-up starts saturated
        np.testing.assert_allclose(K[saturated], 0.0, atol=1e-9)
        # ...and a perturbed state must produce a corrective action on the
        # unsaturated segment (feedback active on free dimensions). Gains
        # correspond to the PREVIOUS nominal's clamp pattern (one-iteration
        # lag, same as the reference), so probe the strongest free knot.
        free = np.nonzero(~saturated)[0]
        assert free.size > 0
        assert np.abs(K[free]).sum() > 1.0
        i = int(free[np.argmax(np.abs(K[free]).sum(axis=1))])
        u_nom = ilqg_action(m, pol, pol.qpos_nom[i], pol.qvel_nom[i],
                            pol.times[i])
        u_pert = ilqg_action(m, pol, pol.qpos_nom[i] + 0.2,
                             pol.qvel_nom[i] + 0.5, pol.times[i])
        assert not np.allclose(np.array(u_nom), np.array(u_pert),
                               atol=1e-6)


class TestBoxQP:
    """mju_boxQP analog (ops/boxqp.py) — KKT-exact on enumerable
    problems, and limit-aware gains in the backward pass
    (backward_pass.cc:158-196)."""

    def _random_spd(self, rng, n, scale=1.0):
        M = rng.standard_normal((n, n))
        return M @ M.T * scale + np.eye(n) * 0.5

    def test_unconstrained_matches_cholesky(self):
        from humanoid_mujoco_tpu.ops.boxqp import box_qp
        rng = np.random.default_rng(1)
        H = jnp.asarray(self._random_spd(rng, 5))
        g = jnp.asarray(rng.standard_normal(5))
        res = box_qp(H, g, jnp.full(5, -1e6), jnp.full(5, 1e6))
        np.testing.assert_allclose(np.array(res.x),
                                   -np.linalg.solve(H, np.array(g)),
                                   atol=1e-8)
        assert np.all(np.array(res.free) == 1.0)

    def test_kkt_vs_active_set_enumeration(self):
        from humanoid_mujoco_tpu.ops.boxqp import box_qp
        rng = np.random.default_rng(2)
        n = 3
        for trial in range(25):
            H = self._random_spd(rng, n)
            g = rng.standard_normal(n) * 2.0
            lo = -np.abs(rng.standard_normal(n)) * 0.5
            hi = np.abs(rng.standard_normal(n)) * 0.5

            # oracle: enumerate all 3^n clamp patterns, pick the KKT one
            best = None
            import itertools
            for pat in itertools.product((0, 1, 2), repeat=n):
                x = np.zeros(n)
                fr = [i for i in range(n) if pat[i] == 0]
                for i in range(n):
                    if pat[i] == 1:
                        x[i] = lo[i]
                    elif pat[i] == 2:
                        x[i] = hi[i]
                if fr:
                    Hff = H[np.ix_(fr, fr)]
                    rhs = g[fr] + H[np.ix_(fr, range(n))] @ x
                    rhs -= Hff @ x[fr]
                    x[fr] = -np.linalg.solve(Hff, rhs)
                if np.any(x < lo - 1e-9) or np.any(x > hi + 1e-9):
                    continue
                grad = g + H @ x
                ok = True
                for i in range(n):
                    if pat[i] == 1 and grad[i] < -1e-9:
                        ok = False
                    if pat[i] == 2 and grad[i] > 1e-9:
                        ok = False
                    if pat[i] == 0 and abs(grad[i]) > 1e-7:
                        ok = False
                if ok:
                    best = x
                    break
            assert best is not None, f"trial {trial}: no KKT point found"

            res = box_qp(jnp.asarray(H), jnp.asarray(g), jnp.asarray(lo),
                         jnp.asarray(hi), iters=12)
            np.testing.assert_allclose(np.array(res.x), best, atol=1e-7,
                                       err_msg=f"trial {trial}")

    def test_backward_pass_zero_gains_on_saturated_axes(self):
        # LQR with a huge linear control cost on axis 0: the optimal du
        # pins axis 0 at its bound, and its feedback row must be ZERO
        rng = np.random.default_rng(3)
        T, nx, nu = 6, 4, 3
        A = np.stack([np.eye(nx) + 0.05 * rng.standard_normal((nx, nx))
                      for _ in range(T)])
        B = np.stack([0.5 * rng.standard_normal((nx, nu))
                      for _ in range(T)])
        q = rng.standard_normal((T, nx)) * 0.1
        r = np.tile(np.asarray([50.0, 0.01, 0.01]), (T, 1))  # push axis 0
        derivs = Derivatives(
            A=jnp.asarray(A), B=jnp.asarray(B),
            cx=jnp.asarray(q), cu=jnp.asarray(r),
            cxx=jnp.asarray(np.tile(np.eye(nx) * 0.5, (T, 1, 1))),
            cxu=jnp.zeros((T, nx, nu), dtype=F64),
            cuu=jnp.asarray(np.tile(np.eye(nu) * 0.2, (T, 1, 1))))
        u_nom = jnp.zeros((T, nu), dtype=F64)
        ctrlrange = jnp.asarray(np.tile([-1.0, 1.0], (nu, 1)))
        du, K, dV = backward_pass(derivs, jnp.asarray(0.0, dtype=F64),
                                  u_nom=u_nom, ctrlrange=ctrlrange,
                                  boxqp_iters=12)
        du_np, K_np = np.array(du), np.array(K)
        assert np.all(du_np >= -1.0 - 1e-9) and np.all(du_np <= 1.0 + 1e-9)
        # axis 0 saturates at the lower bound (big positive linear cost)
        assert np.all(du_np[:, 0] == pytest.approx(-1.0, abs=1e-9))
        np.testing.assert_allclose(K_np[:, 0, :], 0.0, atol=1e-12)
        # free axes carry nonzero feedback
        assert np.any(np.abs(K_np[:, 1:, :]) > 1e-3)

    def test_backward_pass_wide_limits_matches_unconstrained(self):
        rng = np.random.default_rng(4)
        T, nx, nu = 8, 4, 2
        A = np.stack([np.eye(nx) + 0.05 * rng.standard_normal((nx, nx))
                      for _ in range(T)])
        B = np.stack([0.1 * rng.standard_normal((nx, nu))
                      for _ in range(T)])
        q = rng.standard_normal((T, nx)) * 0.1
        r = rng.standard_normal((T, nu)) * 0.1
        derivs = Derivatives(
            A=jnp.asarray(A), B=jnp.asarray(B),
            cx=jnp.asarray(q), cu=jnp.asarray(r),
            cxx=jnp.asarray(np.tile(np.eye(nx) * 0.5, (T, 1, 1))),
            cxu=jnp.zeros((T, nx, nu), dtype=F64),
            cuu=jnp.asarray(np.tile(np.eye(nu) * 0.2, (T, 1, 1))))
        du0, K0, dV0 = backward_pass(derivs, jnp.asarray(0.0, dtype=F64))
        du1, K1, dV1 = backward_pass(
            derivs, jnp.asarray(0.0, dtype=F64),
            u_nom=jnp.zeros((T, nu), dtype=F64),
            ctrlrange=jnp.asarray(np.tile([-1e5, 1e5], (nu, 1))))
        np.testing.assert_allclose(np.array(du1), np.array(du0), atol=1e-7)
        np.testing.assert_allclose(np.array(K1), np.array(K0), atol=1e-7)

    def test_reg_schemes_run_and_agree_at_zero_reg(self):
        from humanoid_mujoco_tpu.planners.ilqg import (
            REG_CONTROL, REG_NONE, REG_STATE_CONTROL, REG_VALUE)
        rng = np.random.default_rng(5)
        T, nx, nu = 5, 3, 2
        A = np.stack([np.eye(nx) + 0.05 * rng.standard_normal((nx, nx))
                      for _ in range(T)])
        B = np.stack([0.1 * rng.standard_normal((nx, nu))
                      for _ in range(T)])
        derivs = Derivatives(
            A=jnp.asarray(A), B=jnp.asarray(B),
            cx=jnp.asarray(rng.standard_normal((T, nx)) * 0.1),
            cu=jnp.asarray(rng.standard_normal((T, nu)) * 0.1),
            cxx=jnp.asarray(np.tile(np.eye(nx), (T, 1, 1))),
            cxu=jnp.zeros((T, nx, nu), dtype=F64),
            cuu=jnp.asarray(np.tile(np.eye(nu) * 0.3, (T, 1, 1))))
        outs = []
        for rt in (REG_CONTROL, REG_STATE_CONTROL, REG_VALUE, REG_NONE):
            du, K, _ = backward_pass(derivs, jnp.asarray(0.0, dtype=F64),
                                     reg_type=rt)
            outs.append((np.array(du), np.array(K)))
        for du, K in outs[1:]:
            np.testing.assert_allclose(du, outs[0][0], atol=1e-8)
            np.testing.assert_allclose(K, outs[0][1], atol=1e-8)
        # with reg > 0 each scheme stays finite and damps the step
        for rt in (REG_CONTROL, REG_STATE_CONTROL, REG_VALUE):
            du, K, _ = backward_pass(derivs, jnp.asarray(10.0, dtype=F64),
                                     reg_type=rt)
            assert np.all(np.isfinite(np.array(du)))
            assert np.linalg.norm(np.array(du)) < np.linalg.norm(
                outs[0][0])
