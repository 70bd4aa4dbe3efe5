"""Physics engine correctness tests.

Modeled on the reference's test strategy (SURVEY.md §4): analytic oracles
(pendulum period, free-fall, momentum/energy conservation), FD-vs-analytic
derivative checks, and small-fixture statics — without a MuJoCo oracle in
the image, conservation laws + closed-form mechanics are the ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mujoco_tpu.physics import engine, humanoid
from humanoid_mujoco_tpu.physics.model import (ActuatorType, JointType,
                                               Model, ModelBuilder,
                                               make_state)
from humanoid_mujoco_tpu.physics.step import forward, step, step_rk4

F64 = jnp.float64


def pendulum(damping=0.0, dtype=F64, dt=1e-3):
    b = ModelBuilder(dt=dt)
    b.has_floor = False
    body = b.add_body("pend", -1, mass=1.0, ipos=(0, 0, -0.5),
                      inertia=(0.05, 0.05, 0.001))
    b.add_joint("hinge", body, JointType.HINGE, axis=(0, 1, 0),
                damping=damping)
    return b.finalize(dtype=dtype)


def free_body(dtype=F64, dt=1e-3, inertia=(0.1, 0.2, 0.3)):
    b = ModelBuilder(dt=dt)
    b.has_floor = False
    body = b.add_body("box", -1, mass=2.0, inertia=inertia)
    b.add_joint("free", body, JointType.FREE)
    return b.finalize(dtype=dtype)


def ball_on_floor(dtype=F64, dt=2e-3, friction=1.0):
    b = ModelBuilder(dt=dt)
    b.floor_z = 0.0
    b.floor_friction = friction
    body = b.add_body("ball", -1, mass=1.0, inertia=(4e-4, 4e-4, 4e-4))
    b.add_joint("free", body, JointType.FREE)
    b.add_sphere(body, pos=(0, 0, 0), radius=0.1, friction=friction)
    return b.finalize(dtype=dtype)


def total_energy(m, s):
    kin = engine.fwd_position(m, s.qpos)
    vel = engine.fwd_velocity(m, kin, s.qvel)
    M = engine.crb_mass_matrix(m, kin)
    ke = 0.5 * s.qvel @ M @ s.qvel
    pe = -jnp.sum(m.body_mass * (kin.xipos @ m.gravity))
    return ke + pe


def rollout(m, s, n, ctrl=None, stepper=step):
    ctrl = jnp.zeros(m.nu, dtype=s.qpos.dtype) if ctrl is None else ctrl

    def body(s, _):
        s, info = stepper(m, s, ctrl)
        return s, info.diverged

    s, div = jax.lax.scan(body, s, None, length=n)
    return s, div


class TestConservation:
    def test_pendulum_energy_rk4(self):
        m = pendulum()
        s = make_state(m, qpos=jnp.asarray([1.2], dtype=F64))
        e0 = total_energy(m, s)
        s_end, _ = jax.jit(lambda s: rollout(m, s, 2000, stepper=step_rk4))(s)
        e1 = total_energy(m, s_end)
        assert abs(float(e1 - e0)) < 1e-8

    def test_pendulum_small_oscillation_period(self):
        # T = 2*pi*sqrt(I_total / (m g l)) ; I = 0.05 + 1*0.5^2 = 0.3
        m = pendulum(dt=5e-4)
        amp = 0.02
        s = make_state(m, qpos=jnp.asarray([amp], dtype=F64))

        def body(s, _):
            s, _ = step_rk4(m, s, jnp.zeros(0, dtype=F64))
            return s, s.qpos[0]

        _, qs = jax.jit(lambda s: jax.lax.scan(body, s, None, 4000))(s)
        qs = np.array(qs)
        # first zero crossing (downward) = quarter period
        cross = np.argmax(qs < 0.0)
        T_meas = 4 * cross * 5e-4
        T_true = 2 * np.pi * np.sqrt(0.3 / (1.0 * 9.81 * 0.5))
        assert abs(T_meas - T_true) / T_true < 0.01

    def test_free_fall(self):
        m = free_body()
        s = make_state(m)
        qacc, _, _, _ = forward(m, s, jnp.zeros(0, dtype=F64))
        np.testing.assert_allclose(np.array(qacc),
                                   [0, 0, -9.81, 0, 0, 0], atol=1e-10)

    def test_tumbling_angular_momentum(self):
        # torque-free asymmetric top: |L_world| conserved (gravity off)
        m = free_body().replace(gravity=jnp.zeros(3, dtype=F64))
        qvel = jnp.asarray([0, 0, 0, 3.0, 0.2, 0.1], dtype=F64)
        s = make_state(m, qvel=qvel)

        def L_world(s):
            kin = engine.fwd_position(m, s.qpos)
            vel = engine.fwd_velocity(m, kin, s.qvel)
            Iv = jnp.einsum("bij,bj->bi", kin.cinert, vel.cvel)
            return jnp.sum(Iv[:, :3], axis=0)

        L0 = np.array(L_world(s))
        s_end, _ = jax.jit(lambda s: rollout(m, s, 2000,
                                             stepper=step_rk4))(s)
        L1 = np.array(L_world(s_end))
        # O(h^2) manifold-integration drift, measured ~4e-8 at h=1e-3
        np.testing.assert_allclose(L1, L0, atol=1e-6)

    def test_power_balance_with_actuation(self):
        # dE/dt == actuator power for a frictionless actuated pendulum
        b = ModelBuilder(dt=1e-4)
        b.has_floor = False
        body = b.add_body("pend", -1, mass=1.0, ipos=(0, 0, -0.5),
                          inertia=(0.05, 0.05, 0.001))
        jnt = b.add_joint("hinge", body, JointType.HINGE, axis=(0, 1, 0))
        b.add_actuator(jnt, ActuatorType.MOTOR, gear=1.0,
                       ctrlrange=(-5, 5), forcerange=(-5, 5))
        m = b.finalize(dtype=F64)
        s = make_state(m, qpos=jnp.asarray([0.3], dtype=F64))
        ctrl = jnp.asarray([0.7], dtype=F64)
        e0 = float(total_energy(m, s))
        work = 0.0
        for _ in range(200):
            qvel_mid = s.qvel
            s, _ = step_rk4(m, s, ctrl)
            work += 0.7 * float(s.qvel[0] + qvel_mid[0]) / 2 * 1e-4
        e1 = float(total_energy(m, s))
        assert abs((e1 - e0) - work) < 1e-6


class TestJacobians:
    def test_point_jacobian_vs_autodiff(self):
        m = humanoid.build_humanoid(dtype=F64)
        rng = np.random.default_rng(0)
        q = np.array(humanoid.stand_qpos(m))
        q[7:] += rng.uniform(-0.3, 0.3, size=12)
        qpos = jnp.asarray(q)
        bid = m.struct.body_id("left_knee_pitch_link")
        point_local = jnp.asarray([0.0, -0.15, 0.0], dtype=F64)

        def fk_point(q_joints):
            qfull = qpos.at[7:].set(q_joints)
            kin = engine.fwd_position(m, qfull)
            return kin.xpos[bid] + engine.pm.quat_rotate(
                kin.xquat[bid], point_local)

        J_ad = jax.jacfwd(fk_point)(qpos[7:])          # (3, 12)
        kin = engine.fwd_position(m, qpos)
        pt = fk_point(qpos[7:])
        J = engine.point_jacobian(m, kin, bid, pt)     # (3, nv)
        np.testing.assert_allclose(np.array(J[:, 6:]), np.array(J_ad),
                                   atol=1e-9)

    def test_mass_matrix_vs_energy_hessian(self):
        # M must equal the Hessian of kinetic energy in qvel
        m = humanoid.build_humanoid(dtype=F64)
        q = humanoid.stand_qpos(m)
        kin = engine.fwd_position(m, q)
        M = engine.crb_mass_matrix(m, kin)

        def ke(qvel):
            vel = engine.fwd_velocity(m, kin, qvel)
            Iv = jnp.einsum("bij,bj->bi", kin.cinert, vel.cvel)
            return (0.5 * jnp.sum(vel.cvel * Iv)
                    + 0.5 * jnp.sum(m.dof_armature * qvel * qvel))

        H = jax.hessian(ke)(jnp.zeros(m.nv, dtype=F64))
        np.testing.assert_allclose(np.array(M), np.array(H), atol=1e-10)
        # symmetric positive definite
        w = np.linalg.eigvalsh(np.array(M))
        assert w.min() > 0

    def test_bias_vs_autodiff_lagrangian(self):
        # qfrc_bias == Mdot qvel - d(KE)/dq + dPE/dq  (Lagrange), checked
        # via FD on a hinge chain (no quaternions -> plain FD valid)
        b = ModelBuilder(dt=1e-3)
        b.has_floor = False
        b1 = b.add_body("l1", -1, mass=1.0, ipos=(0, 0, -0.3),
                        inertia=(0.02, 0.02, 0.001))
        b.add_joint("j1", b1, JointType.HINGE, axis=(0, 1, 0))
        b2 = b.add_body("l2", b1, pos=(0, 0, -0.6), mass=0.7,
                        ipos=(0, 0, -0.2), inertia=(0.01, 0.01, 0.001))
        b.add_joint("j2", b2, JointType.HINGE, axis=(1, 0, 0))
        m = b.finalize(dtype=F64)

        qpos = jnp.asarray([0.4, -0.7], dtype=F64)
        qvel = jnp.asarray([1.3, -0.5], dtype=F64)

        def lagrangian_acc(qpos, qvel):
            def ke_fn(q, v):
                kin = engine.fwd_position(m, q)
                vel = engine.fwd_velocity(m, kin, v)
                Iv = jnp.einsum("bij,bj->bi", kin.cinert, vel.cvel)
                return 0.5 * jnp.sum(vel.cvel * Iv)

            def pe_fn(q):
                kin = engine.fwd_position(m, q)
                return -jnp.sum(m.body_mass * (kin.xipos @ m.gravity))

            Mq = jax.hessian(ke_fn, argnums=1)(qpos, qvel)
            # Euler-Lagrange: M qacc + dM/dq . v v - dKE/dq + dPE/dq = 0
            dKEdq = jax.grad(ke_fn, argnums=0)(qpos, qvel)
            dPEdq = jax.grad(pe_fn)(qpos)
            dMdq = jax.jacfwd(
                lambda q: jax.hessian(ke_fn, argnums=1)(q, qvel))(qpos)
            coriolis = jnp.einsum("ijk,k,j->i", dMdq, qvel, qvel) \
                - dKEdq + dPEdq
            return jnp.linalg.solve(Mq, -coriolis)

        s = make_state(m, qpos=qpos, qvel=qvel)
        qacc, _, _, _ = forward(m, s, jnp.zeros(0, dtype=F64))
        np.testing.assert_allclose(np.array(qacc),
                                   np.array(lagrangian_acc(qpos, qvel)),
                                   rtol=1e-8, atol=1e-8)


class TestContacts:
    def test_resting_ball_supports_weight(self):
        m = ball_on_floor()
        s = make_state(m, qpos=jnp.asarray([0, 0, 0.0999, 1, 0, 0, 0],
                                           dtype=F64))
        s_end, div = jax.jit(lambda s: rollout(m, s, 1000))(s)
        assert not bool(div.any())
        # settled: small penetration, nearly zero velocity
        z = float(s_end.qpos[2])
        assert 0.09 < z < 0.1001
        assert float(jnp.abs(s_end.qvel).max()) < 1e-3
        # normal force ~ weight
        _, _, _, info = forward(m, s_end, jnp.zeros(0, dtype=F64))
        np.testing.assert_allclose(float(info.contact_force.sum()), 9.81,
                                   rtol=0.05)

    def test_bouncing_ball_does_not_gain_energy(self):
        m = ball_on_floor()
        s = make_state(m, qpos=jnp.asarray([0, 0, 0.5, 1, 0, 0, 0],
                                           dtype=F64))
        s_end, div = jax.jit(lambda s: rollout(m, s, 1500))(s)
        assert not bool(div.any())
        assert float(s_end.qpos[2]) < 0.55

    @staticmethod
    def _slider_block(friction):
        # rotation-free block: x + z slide joints, sphere contact geom
        b = ModelBuilder(dt=2e-3)
        b.floor_z = 0.0
        b.floor_friction = friction
        body = b.add_body("block", -1, mass=1.0, inertia=(0.01, 0.01, 0.01))
        b.add_joint("x", body, JointType.SLIDE, axis=(1, 0, 0))
        b.add_joint("z", body, JointType.SLIDE, axis=(0, 0, 1))
        b.add_sphere(body, pos=(0, 0, 0), radius=0.1, friction=friction)
        return b.finalize(dtype=F64)

    def _push(self, m, fx, n):
        s = make_state(m, qpos=jnp.asarray([0, 0.0995], dtype=F64))
        xfrc = jnp.zeros((m.struct.nbody, 6), dtype=F64).at[0, 0].set(fx)

        def body(s, _):
            s, _ = step(m, s, jnp.zeros(0, dtype=F64), xfrc=xfrc)
            return s, None

        return jax.jit(lambda s: jax.lax.scan(body, s, None, n))(s)[0]

    def test_static_friction_holds(self):
        m = self._slider_block(friction=1.0)
        # 3 N < mu*m*g = 9.81 N: must stick
        s_end = self._push(m, 3.0, 1000)
        assert abs(float(s_end.qpos[0])) < 0.02

    def test_kinetic_sliding_when_pushed_hard(self):
        m = self._slider_block(friction=0.3)
        # 8 N > mu*m*g = 2.94 N: slides, a ~ (F - mu m g)/m = 5.06 m/s^2
        s_end = self._push(m, 8.0, 500)
        x = float(s_end.qpos[0])
        x_pred = 0.5 * 5.06 * 1.0 ** 2
        assert 0.7 * x_pred < x < 1.3 * x_pred

    def test_rolling_without_slipping(self):
        # free ball pushed below the slip threshold rolls: a = F/(m + I/r^2),
        # omega = v/r (validates the contact tangential coupling)
        m = ball_on_floor(friction=1.0)
        s = make_state(m, qpos=jnp.asarray([0, 0, 0.0995, 1, 0, 0, 0],
                                           dtype=F64))
        xfrc = jnp.zeros((m.struct.nbody, 6), dtype=F64).at[0, 0].set(3.0)

        def body(s, _):
            s, _ = step(m, s, jnp.zeros(0, dtype=F64), xfrc=xfrc)
            return s, None

        s_end, _ = jax.jit(lambda s: jax.lax.scan(body, s, None, 1000))(s)
        a_pred = 3.0 / (1.0 + 4e-4 / 0.1 ** 2)  # 2.885 m/s^2
        vx = float(s_end.qvel[0])
        assert abs(vx - a_pred * 2.0) / (a_pred * 2.0) < 0.05
        # rolling constraint: omega_y = vx / r
        assert abs(float(s_end.qvel[4]) - vx / 0.1) / (vx / 0.1) < 0.05

    def test_joint_limits_hold(self):
        # torque pushing past the limit: joint must stop near the limit
        b = ModelBuilder(dt=2e-3)
        b.has_floor = False
        body = b.add_body("link", -1, mass=0.5, ipos=(0, 0, -0.2),
                          inertia=(0.01, 0.01, 0.001))
        jnt = b.add_joint("j", body, JointType.HINGE, axis=(0, 1, 0),
                          jrange=(-0.5, 0.5), limited=True, damping=0.05)
        b.add_actuator(jnt, ActuatorType.MOTOR, gear=1.0,
                       ctrlrange=(-3, 3), forcerange=(-3, 3))
        m = b.finalize(dtype=F64)
        s = make_state(m)
        ctrl = jnp.asarray([2.0], dtype=F64)
        s_end, div = jax.jit(lambda s: rollout(m, s, 1500, ctrl=ctrl))(s)
        assert not bool(div.any())
        assert float(s_end.qpos[0]) < 0.56


class TestHumanoid:
    def test_passive_rollout_stable_f32(self):
        m = humanoid.build_humanoid(dtype=jnp.float32)
        s = make_state(m, qpos=humanoid.stand_qpos(m))
        s_end, div = jax.jit(lambda s: rollout(m, s, 300))(s)
        assert not bool(div.any())
        assert float(s_end.qpos[2]) > -0.6  # has not collapsed through floor

    def test_feet_carry_weight_at_stand(self):
        m = humanoid.build_humanoid(dtype=F64)
        s = make_state(m, qpos=humanoid.stand_qpos(m))
        # settle briefly, then check total normal force ~ total weight
        s_end, _ = jax.jit(lambda s: rollout(m, s, 200))(s)
        _, _, _, info = forward(m, s_end, jnp.zeros(m.nu, dtype=F64))
        total = float(info.contact_force.sum())
        weight = float(jnp.sum(m.body_mass)) * 9.81
        assert 0.5 * weight < total < 1.5 * weight

    def test_standup_pose_rests_on_ground(self):
        m = humanoid.build_humanoid(dtype=jnp.float32)
        s = make_state(m, qpos=humanoid.standup_qpos(m))
        s_end, div = jax.jit(lambda s: rollout(m, s, 300))(s)
        assert not bool(div.any())
        # lying: root stays near the floor, does not tunnel through
        assert -0.75 < float(s_end.qpos[2]) < -0.5
