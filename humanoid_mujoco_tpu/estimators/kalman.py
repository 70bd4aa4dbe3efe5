"""Extended Kalman filter on the tangent-space state.

Rebuild of the reference EKF (mjpc/estimators/kalman.cc:188-292):
predict with the full nonlinear step + covariance propagation through the
tangent Jacobian A (the mjd_transitionFD replacement from
planners/derivatives.py), then a standard innovation update with a
Cholesky solve. State covariance lives in the 2*nv tangent space;
configuration updates go through the quaternion ⊞.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import linalg
from ..physics.model import Model, State
from ..physics.step import step
from ..physics.tangent import state_add
from ..planners.derivatives import step_tangent_jacobians
from .sensors import SensorModel, measure, measurement_jacobian


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EKFConfig:
    process_noise_pos: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-5))
    process_noise_vel: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-3))
    init_cov: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-4))
    solver_iters: int = dataclasses.field(default=4,
                                          metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EKFState:
    state: State
    cov: jax.Array      # (2nv, 2nv)


def ekf_init(m: Model, cfg: EKFConfig, state: State) -> EKFState:
    n = 2 * m.nv
    dtype = state.qpos.dtype
    return EKFState(state=state,
                    cov=cfg.init_cov * jnp.eye(n, dtype=dtype))


def ekf_update(m: Model, cfg: EKFConfig, sensor: SensorModel,
               ekf: EKFState, ctrl: jax.Array, y: jax.Array
               ) -> Tuple[EKFState, jax.Array]:
    """One predict + measurement update (Estimator::Update analog,
    estimators/estimator.h:33-97). Returns (state', innovation norm)."""
    nv = m.nv
    dtype = y.dtype
    st = ekf.state

    # ---- predict ----
    s_pred, _ = step(m, st, ctrl, solver_iters=cfg.solver_iters)
    A, _ = step_tangent_jacobians(
        m, st.qpos, st.qvel, ctrl, st.time, s_pred.qpos, s_pred.qvel,
        solver_iters=cfg.solver_iters)
    Q = jnp.diag(jnp.concatenate([
        jnp.full((nv,), cfg.process_noise_pos, dtype=dtype),
        jnp.full((nv,), cfg.process_noise_vel, dtype=dtype)]))
    P = A @ ekf.cov @ A.T + Q

    # ---- update ----
    H = measurement_jacobian(m, s_pred.qpos, s_pred.qvel)
    y_pred = measure(m, s_pred.qpos, s_pred.qvel)
    innov = y - y_pred
    R = jnp.diag(sensor.noise ** 2)
    S = H @ P @ H.T + R
    # K = P H^T S^-1 via Cholesky (kalman.cc:212,232 mju_cholFactor/Solve)
    Ls = linalg.chol_factor(S)
    K = linalg.chol_solve(Ls, H @ P).T          # (2nv, ny)
    dx = K @ innov
    qpos = state_add(m, s_pred.qpos, dx[:nv])
    qvel = s_pred.qvel + dx[nv:]
    n2 = 2 * nv
    P_new = (jnp.eye(n2, dtype=dtype) - K @ H) @ P
    P_new = 0.5 * (P_new + P_new.T)

    new = EKFState(state=State(qpos=qpos, qvel=qvel, time=s_pred.time),
                   cov=P_new)
    return new, jnp.linalg.norm(innov)
