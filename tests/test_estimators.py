"""Estimator tests (EKF/UKF/batch on known systems) — the reference's
test strategy (mjpc/test/estimator/*, filters on box/particle models)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mujoco_tpu.estimators import (BatchConfig, EKFConfig,
                                            UKFConfig, batch_init,
                                            batch_update,
                                            default_sensor_model, ekf_init,
                                            ekf_update, measure, ukf_init,
                                            ukf_update)
from humanoid_mujoco_tpu.estimators.sensors import SensorModel
from humanoid_mujoco_tpu.physics import humanoid
from humanoid_mujoco_tpu.physics.model import State, make_state
from humanoid_mujoco_tpu.physics.step import step

F64 = jnp.float64


@pytest.fixture(scope="module")
def setup():
    m = humanoid.build_humanoid(dtype=F64)
    s0 = make_state(m, qpos=humanoid.stand_qpos(m))
    sensor = default_sensor_model(m, dtype=F64)
    return m, s0, sensor


def simulate_measurements(m, s0, n, key, noise_scale=0.01):
    """True rollout + noisy measurements."""
    states, ys = [], []
    s = s0
    ctrl = jnp.zeros(m.nu, dtype=F64)
    step_j = jax.jit(lambda s: step(m, s, ctrl))
    for i in range(n):
        s, _ = step_j(s)
        y = measure(m, s.qpos, s.qvel)
        key, k = jax.random.split(key)
        ys.append(y + noise_scale * jax.random.normal(k, y.shape,
                                                      dtype=F64))
        states.append(s)
    return states, ys, ctrl


class TestEKF:
    def test_tracks_true_state_from_wrong_init(self, setup):
        m, s0, sensor = setup
        states, ys, ctrl = simulate_measurements(
            m, s0, 30, jax.random.PRNGKey(0))
        # init with perturbed joints
        bad_q = s0.qpos.at[7:].add(0.1)
        cfg = EKFConfig()
        ekf = ekf_init(m, cfg, State(bad_q, s0.qvel, s0.time))
        upd = jax.jit(lambda e, y: ekf_update(m, cfg, sensor, e, ctrl, y))
        err0 = float(jnp.linalg.norm(ekf.state.qpos[7:]
                                     - states[0].qpos[7:]))
        for y in ys:
            ekf, innov = upd(ekf, y)
        err = float(jnp.linalg.norm(ekf.state.qpos[7:]
                                    - states[-1].qpos[7:]))
        assert err < 0.3 * err0
        assert bool(jnp.all(jnp.isfinite(ekf.cov)))

    def test_covariance_stays_bounded(self, setup):
        m, s0, sensor = setup
        states, ys, ctrl = simulate_measurements(
            m, s0, 10, jax.random.PRNGKey(1))
        cfg = EKFConfig()
        ekf = ekf_init(m, cfg, s0)
        upd = jax.jit(lambda e, y: ekf_update(m, cfg, sensor, e, ctrl, y))
        for y in ys:
            ekf, _ = upd(ekf, y)
        w = np.linalg.eigvalsh(np.array(ekf.cov))
        assert w.max() < 1.0
        assert w.min() > -1e-9


class TestUKF:
    def test_tracks_true_state(self, setup):
        m, s0, sensor = setup
        states, ys, ctrl = simulate_measurements(
            m, s0, 20, jax.random.PRNGKey(2))
        bad_q = s0.qpos.at[7:].add(0.08)
        cfg = UKFConfig()
        ukf = ukf_init(m, cfg, State(bad_q, s0.qvel, s0.time))
        upd = jax.jit(lambda e, y: ukf_update(m, cfg, sensor, e, ctrl, y))
        err0 = float(jnp.linalg.norm(bad_q[7:] - states[0].qpos[7:]))
        for y in ys:
            ukf, _ = upd(ukf, y)
        err = float(jnp.linalg.norm(ukf.state.qpos[7:]
                                    - states[-1].qpos[7:]))
        assert err < 0.5 * err0


class TestBatch:
    def test_window_estimate_improves_on_prediction(self, setup):
        m, s0, sensor = setup
        states, ys, ctrl = simulate_measurements(
            m, s0, 12, jax.random.PRNGKey(3), noise_scale=0.005)
        cfg = BatchConfig(window=4, gn_iters=1)
        bs = batch_init(m, cfg, s0)
        upd = jax.jit(lambda b, y: batch_update(m, cfg, sensor, b, ctrl,
                                                y))
        for y in ys:
            bs, est = upd(bs, y)
        err = float(jnp.linalg.norm(est.qpos[7:] - states[-1].qpos[7:]))
        assert err < 0.05
        assert bool(jnp.all(jnp.isfinite(est.qpos)))
