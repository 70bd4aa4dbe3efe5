"""Direct optimizer + serving state-estimation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mujoco_tpu.direct import DirectConfig, direct_optimize
from humanoid_mujoco_tpu.estimators import default_sensor_model, measure
from humanoid_mujoco_tpu.physics import humanoid
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.physics.step import step
from humanoid_mujoco_tpu.serving.state_estimation import (
    find_ideal_root_height, set_robot_state)

F64 = jnp.float64


@pytest.fixture(scope="module")
def setup():
    m = humanoid.build_humanoid(dtype=F64)
    s0 = make_state(m, qpos=humanoid.stand_qpos(m))
    sensor = default_sensor_model(m, dtype=F64)
    return m, s0, sensor


class TestDirect:
    def test_denoises_configuration_trajectory(self, setup):
        m, s0, sensor = setup
        T = 10
        ctrl = jnp.zeros(m.nu, dtype=F64)
        qs, ys = [np.array(s0.qpos)], []
        s = s0
        step_j = jax.jit(lambda s: step(m, s, ctrl))
        key = jax.random.PRNGKey(0)
        ys.append(np.array(measure(m, s.qpos, s.qvel)))
        for _ in range(T - 1):
            s, _ = step_j(s)
            qs.append(np.array(s.qpos))
            ys.append(np.array(measure(m, s.qpos, s.qvel)))
        qs = jnp.asarray(np.stack(qs))
        ys = jnp.asarray(np.stack(ys))
        # corrupt the initial guess
        key, k = jax.random.split(key)
        q_noisy = qs.at[:, 7:].add(
            0.03 * jax.random.normal(k, (T, 12), dtype=F64))
        cfg = DirectConfig(gn_iters=3)
        res = jax.jit(lambda q0: direct_optimize(
            m, cfg, sensor, q0, ys, jnp.zeros((T, m.nu), dtype=F64),
            float(m.dt)))(q_noisy)
        err_before = float(jnp.abs(q_noisy[1:-1, 7:]
                                   - qs[1:-1, 7:]).mean())
        err_after = float(jnp.abs(res.qpos[1:-1, 7:]
                                  - qs[1:-1, 7:]).mean())
        assert float(res.cost) < float(res.cost_initial)
        assert err_after < 0.7 * err_before


class TestStateEstimation:
    def test_height_recovered_for_stand_pose(self, setup):
        m, s0, sensor = setup
        z = find_ideal_root_height(
            m, s0.qpos[7:], s0.qpos[3:7], 100, (-0.6, -0.25))
        # true standing root height is -0.375 (feet touching)
        assert abs(float(z) - (-0.375)) < 0.03

    def test_set_robot_state_roundtrip(self, setup):
        m, s0, sensor = setup
        st = set_robot_state(m, s0.qpos[7:], jnp.zeros(12, dtype=F64),
                             jnp.zeros(3, dtype=F64), s0.qpos[3:7])
        np.testing.assert_allclose(np.array(st.qpos[7:]),
                                   np.array(s0.qpos[7:]), atol=1e-9)
        assert abs(float(st.qpos[2]) - float(s0.qpos[2])) < 0.03


class TestDirectContactAndParams:
    def test_contact_force_residual_small_at_truth(self, setup):
        """With feet in contact, the full-model force residual (incl.
        constraint forces, direct.cc:136,504-506) vanishes on the true
        trajectory where the smooth-only residual sees unbalanced
        gravity."""
        from humanoid_mujoco_tpu.direct.optimizer import direct_residuals
        m, s0, sensor = setup
        T = 8
        ctrl = jnp.zeros(m.nu, dtype=F64)
        step_j = jax.jit(lambda s: step(m, s, ctrl))
        qs, ys = [np.array(s0.qpos)], [np.array(measure(m, s0.qpos,
                                                        s0.qvel))]
        s = s0
        for _ in range(T - 1):
            s, _ = step_j(s)
            qs.append(np.array(s.qpos))
            ys.append(np.array(measure(m, s.qpos, s.qvel)))
        qs = jnp.asarray(np.stack(qs))
        ys = jnp.asarray(np.stack(ys))
        us = jnp.zeros((T, m.nu), dtype=F64)
        th = jnp.zeros((0,), F64)
        ny = (T - 2) * 30

        cfg_c = DirectConfig(contact_forces=True)
        cfg_s = DirectConfig(contact_forces=False)
        rc = direct_residuals(m, cfg_c, sensor, qs, ys, us,
                              float(m.dt), th)[ny:]
        rs = direct_residuals(m, cfg_s, sensor, qs, ys, us,
                              float(m.dt), th)[ny:]
        assert float(jnp.linalg.norm(rc)) < 0.2 * float(
            jnp.linalg.norm(rs))

    def test_mass_scale_recovered_from_actuated_flight(self, setup):
        """Global mass scale is identifiable when actuation (not
        mass-proportional) drives the motion: simulate airborne with
        ctrl torques and a 15% heavier model, then estimate
        (direct/model_parameters.cc analog)."""
        m, s0, sensor = setup
        m_true = m.replace(body_mass=m.body_mass * 1.15)
        T = 10
        # airborne: lift the root well above the floor
        q0 = s0.qpos.at[2].set(1.0)
        s = make_state(m_true, qpos=q0)
        ctrl = jnp.full((m.nu,), 0.4, dtype=F64)
        step_j = jax.jit(lambda s: step(m_true, s, ctrl))
        qs, ys = [np.array(s.qpos)], [np.array(measure(m_true, s.qpos,
                                                       s.qvel))]
        for _ in range(T - 1):
            s, _ = step_j(s)
            qs.append(np.array(s.qpos))
            ys.append(np.array(measure(m_true, s.qpos, s.qvel)))
        qs = jnp.asarray(np.stack(qs))
        ys = jnp.asarray(np.stack(ys))
        us = jnp.tile(ctrl, (T, 1))
        # full-model force residual: joint-limit constraint forces are
        # active in this window, so the contact/constraint-aware path is
        # required for the equation to close (and the discrete-consistent
        # residual makes the cost minimum land exactly at the true mass)
        cfg = DirectConfig(gn_iters=6, estimate_params=("mass_scale",),
                           contact_forces=True,
                           force_weight=jnp.asarray(1e-2))
        res = jax.jit(lambda q: direct_optimize(
            m, cfg, sensor, q, ys, us, float(m.dt)))(qs)
        assert float(res.cost) < float(res.cost_initial)
        assert abs(float(res.mass_scale) - 1.15) < 0.05, float(
            res.mass_scale)
