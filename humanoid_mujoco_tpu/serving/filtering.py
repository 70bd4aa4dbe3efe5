"""Cross-request state filtering for robot serving.

The reference runs an estimator in its own thread feeding the planner
(mjpc/app.cc:151-205) and exposes it as a standalone `filter_server`
binary (mjpc/grpc/CMakeLists.txt:281, grpc/filter_service.cc). The
round-1 serving path instead rebuilt the state per request with zeroed
root linear velocity and no memory between requests.

`ServingFilter` closes that gap: an EKF (estimators/kalman.py) that
persists across requests. The first observation initializes the state
via the partial-state height scan (set_robot_state); every later
observation runs predict-with-last-applied-ctrl + measurement update,
so root linear velocity and height are *tracked* rather than re-guessed
— exactly what the per-request rebuild cannot do.

`FilterService` mirrors the filter.proto verb surface (Init / Update /
State / Covariance / Noise / Reset) in-process, the same relationship
agent.py has to agent.proto.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..estimators.kalman import EKFConfig, EKFState, ekf_init, ekf_update
from ..estimators.sensors import SensorModel, default_sensor_model
from ..physics import math as pm
from ..physics.model import Model, State
from .state_estimation import set_robot_state


def robot_measurement(joint_pos, joint_vel, ang_vel, quat,
                      dtype=jnp.float32) -> jax.Array:
    """Pack the robot report into the 30-D measurement vector of
    estimators/sensors.py::measure (joint pos, joint vel, gyro, IMU
    gravity direction from the reported quaternion)."""
    quat = jnp.asarray(quat, dtype=dtype)
    gravity = pm.quat_rotate_inv(
        pm.quat_normalize(quat),
        jnp.asarray([0.0, 0.0, -1.0], dtype=dtype))
    return jnp.concatenate([
        jnp.asarray(joint_pos, dtype=dtype),
        jnp.asarray(joint_vel, dtype=dtype),
        jnp.asarray(ang_vel, dtype=dtype),
        gravity,
    ])


class ServingFilter:
    """EKF that persists across serving requests (app.cc:151-205
    estimator-thread semantics, in the request path)."""

    def __init__(self, m: Model, cfg: Optional[EKFConfig] = None,
                 sensor: Optional[SensorModel] = None):
        self.m = m
        self.cfg = cfg or EKFConfig()
        self.sensor = sensor or default_sensor_model(m)
        self.ekf: Optional[EKFState] = None
        self.innovation = 0.0
        self._update = jax.jit(
            lambda ekf, ctrl, y: ekf_update(
                self.m, self.cfg, self.sensor, ekf, ctrl, y))

    def reset(self):
        self.ekf = None
        self.innovation = 0.0

    def update(self, joint_pos, joint_vel, ang_vel, quat,
               last_ctrl=None) -> State:
        """Fold one robot observation in; returns the filtered State.

        `last_ctrl` is the action applied since the previous request
        (Estimator::Update(ctrl, sensor), estimators/estimator.h:66).
        """
        dtype = self.m.body_pos.dtype
        if self.ekf is None:
            s0 = set_robot_state(self.m, joint_pos, joint_vel, ang_vel,
                                 quat)
            self.ekf = ekf_init(self.m, self.cfg, s0)
            return self.ekf.state
        if last_ctrl is None:
            last_ctrl = jnp.zeros(self.m.nu, dtype=dtype)
        y = robot_measurement(joint_pos, joint_vel, ang_vel, quat,
                              dtype=dtype)
        self.ekf, innov = self._update(
            self.ekf, jnp.asarray(last_ctrl, dtype=dtype), y)
        self.innovation = float(innov)
        return self.ekf.state

    @property
    def state(self) -> Optional[State]:
        return None if self.ekf is None else self.ekf.state

    @property
    def covariance(self):
        return None if self.ekf is None else self.ekf.cov


class FilterService:
    """In-process analog of the `filter_server` gRPC surface
    (grpc/filter.proto: Init / Reset / Update / State / Covariance /
    Noise), built on ServingFilter."""

    def __init__(self, m: Model, cfg: Optional[EKFConfig] = None):
        self._f = ServingFilter(m, cfg)

    def init(self, qpos, qvel=None):
        m = self._f.m
        dtype = m.body_pos.dtype
        qpos = jnp.asarray(qpos, dtype=dtype)
        qvel = (jnp.zeros(m.nv, dtype=dtype) if qvel is None
                else jnp.asarray(qvel, dtype=dtype))
        s = State(qpos=qpos, qvel=qvel,
                  time=jnp.asarray(0.0, dtype=dtype))
        self._f.ekf = ekf_init(m, self._f.cfg, s)

    def reset(self):
        self._f.reset()

    def update(self, ctrl, sensor_y):
        """Raw Estimator::Update — ctrl applied + measurement vector."""
        if self._f.ekf is None:
            raise RuntimeError("filter not initialized (call init)")
        self._f.ekf, innov = self._f._update(
            self._f.ekf,
            jnp.asarray(ctrl, dtype=self._f.m.body_pos.dtype),
            jnp.asarray(sensor_y, dtype=self._f.m.body_pos.dtype))
        return float(innov)

    def state(self):
        s = self._f.state
        if s is None:
            return None
        return dict(qpos=np.asarray(s.qpos), qvel=np.asarray(s.qvel))

    def covariance(self):
        c = self._f.covariance
        return None if c is None else np.asarray(c)

    def noise(self):
        return np.asarray(self._f.sensor.noise)
