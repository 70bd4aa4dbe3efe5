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
    # match the sim path's contact iterations (physics/step.py default 8)
    # so the predict model agrees with the simulated plant
    solver_iters: int = dataclasses.field(default=8,
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
    # the contact Jacobian is stiff (||A|| ~ 1e3 at a grazing contact
    # with solref 0.015 @ 2 ms), so A P A^T carries f32 rounding on the
    # order of 1e-2: symmetrize here and jitter S below or the Cholesky
    # sees an indefinite matrix and the filter NaNs (f32 TPU path; the
    # reference runs f64 where this never surfaces)
    P = 0.5 * (P + P.T)

    # ---- update ----
    H = measurement_jacobian(m, s_pred.qpos, s_pred.qvel)
    y_pred = measure(m, s_pred.qpos, s_pred.qvel)
    innov = y - y_pred
    R = jnp.diag(sensor.noise ** 2)
    ny = y.shape[0]
    S = H @ P @ H.T + R
    # In f32 the S assembly at ||P|| ~ 1e2-1e3 carries rounding ~1e-2,
    # enough to leave S slightly indefinite — a Cholesky (the
    # kalman.cc:212,232 mju_cholFactor/Solve route, valid in the
    # reference's f64) emits NaN. LU solve + relative jitter is robust
    # at the same cost for ny=30.
    S = 0.5 * (S + S.T) + (
        1e-5 * jnp.trace(S) / ny + 1e-9) * jnp.eye(ny, dtype=dtype)
    K = jnp.linalg.solve(S, H @ P).T            # (2nv, ny)
    dx = K @ innov
    qpos = state_add(m, s_pred.qpos, dx[:nv])
    qvel = s_pred.qvel + dx[nv:]
    n2 = 2 * nv
    # Joseph form keeps P_new PSD under f32 rounding
    IKH = jnp.eye(n2, dtype=dtype) - K @ H
    P_new = IKH @ P @ IKH.T + K @ R @ K.T
    P_new = 0.5 * (P_new + P_new.T)

    new = EKFState(state=State(qpos=qpos, qvel=qvel, time=s_pred.time),
                   cov=P_new)
    return new, jnp.linalg.norm(innov)
