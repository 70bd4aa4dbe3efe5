"""Measurement model shared by the estimators.

The reference estimators consume MuJoCo sensor vectors (estimators/
kalman.cc measurement updates). Here the measurement model mirrors what
the real robot reports to controllers/mpc_server.py:32-50 — joint
positions (12), joint velocities (12), torso angular velocity (3, local)
and the IMU gravity direction (3, local) — and is differentiable, so the
EKF's H comes from jax.jacfwd in tangent coordinates.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..physics import math as pm
from ..physics.engine import fwd_position
from ..physics.humanoid import ACTUATED_JOINT_ORDER
from ..physics.model import Model
from ..physics.tangent import state_add


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SensorModel:
    """Measurement spec: which signals + noise scales (R diagonal)."""

    noise: jax.Array          # (ny,) measurement noise std


def _is_robot_model(m: Model) -> bool:
    """True for the 12-DOF humanoid whose joints/IMU the robot reports
    (controllers/mpc_server.py:32-50); other models fall back to a
    generic full-state measurement so the estimator/direct services
    work for any registry task."""
    names = set(m.struct.jnt_names)
    return all(n in names for n in ACTUATED_JOINT_ORDER)


def default_sensor_model(m: Model, dtype=jnp.float32) -> SensorModel:
    if _is_robot_model(m):
        noise = jnp.concatenate([
            jnp.full((12,), 0.035, dtype=dtype),  # ~2 deg joint angle
            jnp.full((12,), 0.087, dtype=dtype),  # ~5 deg/s joint vel
            jnp.full((3,), 0.035, dtype=dtype),   # gyro
            jnp.full((3,), 0.05, dtype=dtype),    # gravity direction
        ])
    else:
        s = m.struct
        noise = jnp.concatenate([
            jnp.full((s.nq,), 0.01, dtype=dtype),
            jnp.full((s.nv,), 0.05, dtype=dtype),
        ])
    return SensorModel(noise=noise)


def measure(m: Model, qpos: jax.Array, qvel: jax.Array) -> jax.Array:
    """h(x): the 30-D robot measurement (joint order = actuator order),
    or generic (qpos, qvel) for non-humanoid models."""
    s = m.struct
    if not _is_robot_model(m):
        return jnp.concatenate([qpos, qvel])
    jids = [s.jnt_id(n) for n in ACTUATED_JOINT_ORDER]
    qadr = jnp.asarray([s.jnt_qadr[j] for j in jids], dtype=jnp.int32)
    vadr = jnp.asarray([s.jnt_vadr[j] for j in jids], dtype=jnp.int32)
    quat = pm.quat_normalize(qpos[3:7])
    gravity = pm.quat_rotate_inv(
        quat, jnp.asarray([0.0, 0.0, -1.0], dtype=qpos.dtype))
    return jnp.concatenate([qpos[qadr], qvel[vadr], qvel[3:6], gravity])


def measurement_jacobian(m: Model, qpos: jax.Array, qvel: jax.Array
                         ) -> jax.Array:
    """H (ny, 2nv): jacfwd of h in tangent coordinates."""
    nv = m.nv

    def h(dx):
        qp = state_add(m, qpos, dx[:nv])
        return measure(m, qp, qvel + dx[nv:])

    return jax.jacfwd(h)(jnp.zeros(2 * nv, dtype=qpos.dtype))
