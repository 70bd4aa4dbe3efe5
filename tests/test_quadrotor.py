"""Quadrotor task tests — the SITE_THRUST actuator (site transmission)
plus the waypoint-circuit transition (mjpc/tasks/quadrotor/quadrotor.cc).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from humanoid_mujoco_tpu import mpc
from humanoid_mujoco_tpu.ops.spline import SplineOrder
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.physics.step import forward, step
from humanoid_mujoco_tpu.planners import (SamplingConfig, init_policy,
                                          sampling_plan)
from humanoid_mujoco_tpu.tasks.quadrotor import (_GRAVITY, _MASS, _WAYPOINTS,
                                                 _waypoint_transition,
                                                 quadrotor_home_qpos,
                                                 quadrotor_model,
                                                 quadrotor_task)

HOVER = _MASS * _GRAVITY / 4.0


def _run(m, s, u, n):
    def body(s, _):
        s2, info = step(m, s, u)
        return s2, info.diverged
    return jax.lax.scan(body, s, None, length=n)


class TestThrustActuator:
    def test_hover_equilibrium(self):
        """ctrl = mg/4 per rotor holds position exactly (quadrotor.cc:52
        hover thrust)."""
        m = quadrotor_model()
        s = make_state(m, qpos=quadrotor_home_qpos(m))
        s2, div = jax.jit(lambda s: _run(m, s, jnp.full(4, HOVER), 200))(s)
        assert not bool(jnp.any(div))
        np.testing.assert_allclose(np.asarray(s2.qpos[:3]), [0, 0, 0.3],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(s2.qvel), 0.0, atol=1e-5)

    def test_differential_thrust_pitches(self):
        """Boosting the rear (-x) rotors pitches the nose down (+y
        angular velocity) and accelerates upward."""
        m = quadrotor_model()
        s = make_state(m, qpos=quadrotor_home_qpos(m))
        u = jnp.full(4, HOVER).at[0].add(0.3).at[1].add(0.3)
        s2, div = jax.jit(lambda s: _run(m, s, u, 50))(s)
        assert not bool(jnp.any(div))
        assert float(s2.qvel[4]) > 0.1          # pitch rate about +y
        assert abs(float(s2.qvel[3])) < 1e-6    # no roll (symmetric in y)

    def test_yaw_drag_torque(self):
        """Boosting the +drag pair (rotors 2,3) vs the -drag pair spins
        the craft about +z via the gear6 torque component."""
        m = quadrotor_model()
        s = make_state(m, qpos=quadrotor_home_qpos(m))
        u = jnp.array([HOVER - 0.5, HOVER + 0.5, HOVER + 0.5, HOVER - 0.5])
        s2, _ = jax.jit(lambda s: _run(m, s, u, 50))(s)
        assert float(s2.qvel[5]) > 1e-3, float(s2.qvel[5])

    def test_thrust_force_is_body_frame(self):
        """Rolled 90 deg about +x, total rotor thrust points along -y
        (world): the craft accelerates in -y, not +z."""
        m = quadrotor_model(dtype=jnp.float64)
        q = quadrotor_home_qpos(m)
        q = q.at[2].set(1.0)
        # quat for +90deg about x: (cos45, sin45, 0, 0)
        q = q.at[3:7].set(jnp.array([np.cos(np.pi / 4), np.sin(np.pi / 4),
                                     0.0, 0.0]))
        s = make_state(m, qpos=q)
        s2, _ = jax.jit(lambda s: _run(m, s, jnp.full(4, HOVER), 5))(s)
        assert float(s2.qvel[1]) < -1e-3          # pushed along -y
        assert float(s2.qvel[2]) < 0.0            # gravity wins in z

    def test_ctrlrange_clips_at_zero(self):
        """Rotors can't pull: negative ctrl clips to 0 (ctrlrange
        0..13), so the craft free-falls (checked before it reaches the
        floor: 0.2 s from z=0.3)."""
        m = quadrotor_model()
        s = make_state(m, qpos=quadrotor_home_qpos(m))
        s2, _ = jax.jit(lambda s: _run(m, s, jnp.full(4, -5.0), 20))(s)
        assert float(s2.qvel[2]) < -1.0


class TestQuadrotorTask:
    def test_residual_dims_and_hover_cost_zero(self):
        m = quadrotor_model()
        task = quadrotor_task()
        s = make_state(m, qpos=quadrotor_home_qpos(m))
        _, _, _, info = forward(m, s, jnp.full(4, HOVER))
        res = task.residual(m, s, info, jnp.full(4, HOVER))
        assert res.shape == (task.nres,)
        # at the goal with hover thrust, vel/ctrl residuals vanish
        np.testing.assert_allclose(np.asarray(res[3:]), 0.0, atol=1e-5)

    def test_waypoint_transition_advances_and_wraps(self):
        """Within 0.5 m the goal steps to the next keyframe; mode wraps
        mod 12 (quadrotor.cc:73-88)."""
        m = quadrotor_model()
        task = quadrotor_task()
        q = quadrotor_home_qpos(m)
        q = q.at[:3].set(jnp.asarray(_WAYPOINTS[0]))
        s = make_state(m, qpos=q)
        _, _, _, info = forward(m, s, jnp.full(4, HOVER))
        t2 = _waypoint_transition(task, m, s, info)
        assert int(t2.mode) == 1
        np.testing.assert_allclose(np.asarray(t2.mocap_pos[0]),
                                   _WAYPOINTS[1], atol=1e-6)
        # far away: no advance
        t3 = _waypoint_transition(task, m, make_state(
            m, qpos=quadrotor_home_qpos(m)), info)
        # (info.xpos reflects the waypoint state; rebuild for home)
        _, _, _, info_home = forward(m, make_state(
            m, qpos=quadrotor_home_qpos(m)), jnp.full(4, HOVER))
        t3 = _waypoint_transition(task, m, s, info_home)
        assert int(t3.mode) == 0
        # wrap: mode 11 at its waypoint -> 0
        t11 = dataclasses.replace(
            task, mode=jnp.asarray(11, jnp.int32),
            mocap_pos=task.mocap_pos.at[0].set(
                jnp.asarray(_WAYPOINTS[11], task.mocap_pos.dtype)))
        q11 = quadrotor_home_qpos(m).at[:3].set(jnp.asarray(_WAYPOINTS[11]))
        _, _, _, info11 = forward(m, make_state(m, qpos=q11),
                                  jnp.full(4, HOVER))
        t12 = _waypoint_transition(t11, m, make_state(m, qpos=q11), info11)
        assert int(t12.mode) == 0

    def test_sampling_mpc_flies_toward_goal(self):
        """Predictive-sampling MPC closes most of the distance to the
        first waypoint within 1.5 s (task.xml: 32 trajectories, 5 spline
        points, horizon 0.5 s)."""
        m = quadrotor_model()
        task = quadrotor_task()
        s0 = make_state(m, qpos=quadrotor_home_qpos(m))
        pm_ = mpc.make_plan_model(m, 0.02)
        # exploration 0.05 ~= 0.33 N noise std: rotor-thrust scale, not
        # the full 13 N ctrlrange (the reference's exploration slider is
        # similarly task-tuned, task.xml sampling_exploration)
        cfg = SamplingConfig(nsample=64, nknots=5, horizon=25,
                             order=SplineOrder.LINEAR, solver_iters=2,
                             exploration=jnp.asarray(0.05))
        pol = init_policy(m, cfg.nknots)
        # warm-start exploration around hover, not zero
        pol = dataclasses.replace(
            pol, values=jnp.full_like(pol.values, HOVER))

        goal = jnp.asarray(_WAYPOINTS[0])
        d0 = float(jnp.linalg.norm(s0.qpos[:3] - goal))

        res = jax.jit(lambda s, p, k: mpc.mpc_rollout(
            m, pm_, task, lambda mm, tt, pp, ss, kk: sampling_plan(
                mm, tt, cfg, pp, ss, kk),
            p, s, k, ncycle=40, steps_per_plan=5,
            action_fn=mpc.spline_action_fn(cfg.order),
            sim_solver_iters=2))(s0, pol, jax.random.PRNGKey(0))

        assert jnp.all(jnp.isfinite(res.costs))
        d1 = float(jnp.linalg.norm(res.final_state.qpos[:3] - goal))
        assert d1 < 0.4 * d0, (d0, d1)
