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
