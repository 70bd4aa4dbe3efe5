"""Unscented Kalman filter with quaternion-aware sigma points.

Rebuild of the reference UKF (mjpc/estimators/unscented.h:51-60,178-202):
2*ndx + 1 sigma points generated in the TANGENT space (ndx = 2*nv),
mapped onto the configuration manifold with ⊞, propagated through the
full nonlinear step (one vmap — the sigma-point loop becomes a batch),
and recombined with tangent-space means/covariances.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import linalg
from ..physics.model import Model, State
from ..physics.step import step
from ..physics.tangent import qpos_diff, state_add
from .sensors import SensorModel, measure


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class UKFConfig:
    alpha: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-1))
    beta: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(2.0))
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
class UKFState:
    state: State
    cov: jax.Array


def ukf_init(m: Model, cfg: UKFConfig, state: State) -> UKFState:
    n = 2 * m.nv
    return UKFState(state=state,
                    cov=cfg.init_cov * jnp.eye(n, dtype=state.qpos.dtype))


def ukf_update(m: Model, cfg: UKFConfig, sensor: SensorModel,
               ukf: UKFState, ctrl: jax.Array, y: jax.Array
               ) -> Tuple[UKFState, jax.Array]:
    nv = m.nv
    n = 2 * nv
    dtype = y.dtype
    st = ukf.state
    lam = cfg.alpha ** 2 * n - n
    c = n + lam
    w_mean0 = lam / c
    w_cov0 = lam / c + (1 - cfg.alpha ** 2 + cfg.beta)
    w_i = 1.0 / (2 * c)

    # sigma points in tangent space: 0, ±sqrt(c P)
    L = linalg.chol_factor(ukf.cov + 1e-12 * jnp.eye(n, dtype=dtype))
    scale = jnp.sqrt(c)
    deltas = jnp.concatenate([
        jnp.zeros((1, n), dtype=dtype),
        scale * L.T[None, :, :].reshape(n, n),   # rows of sqrt(c)L^T
        -scale * L.T[None, :, :].reshape(n, n),
    ], axis=0)                                   # (2n+1, n)

    def propagate(dx):
        qp = state_add(m, st.qpos, dx[:nv])
        qv = st.qvel + dx[nv:]
        s2, _ = step(m, State(qp, qv, st.time), ctrl,
                     solver_iters=cfg.solver_iters)
        return s2.qpos, s2.qvel

    qps, qvs = jax.vmap(propagate)(deltas)       # (2n+1, nq/nv)

    # tangent mean: anchor at the central point, average the differences
    anchor_q, anchor_v = qps[0], qvs[0]
    dqs = jax.vmap(lambda q: qpos_diff(m, q, anchor_q))(qps)
    dvs = qvs - anchor_v
    dtan = jnp.concatenate([dqs, dvs], axis=-1)  # (2n+1, n)
    w = jnp.concatenate([jnp.asarray([w_mean0], dtype=dtype),
                         jnp.full((2 * n,), w_i, dtype=dtype)])
    wc = jnp.concatenate([jnp.asarray([w_cov0], dtype=dtype),
                          jnp.full((2 * n,), w_i, dtype=dtype)])
    mean_t = w @ dtan
    qpos_pred = state_add(m, anchor_q, mean_t[:nv])
    qvel_pred = anchor_v + mean_t[nv:]
    dd = dtan - mean_t
    Q = jnp.diag(jnp.concatenate([
        jnp.full((nv,), cfg.process_noise_pos, dtype=dtype),
        jnp.full((nv,), cfg.process_noise_vel, dtype=dtype)]))
    P = jnp.einsum("i,ij,ik->jk", wc, dd, dd) + Q

    # measurement sigma points
    ys = jax.vmap(lambda qp, qv: measure(m, qp, qv))(qps, qvs)
    y_mean = w @ ys
    dy = ys - y_mean
    R = jnp.diag(sensor.noise ** 2)
    S = jnp.einsum("i,ij,ik->jk", wc, dy, dy) + R
    Pxy = jnp.einsum("i,ij,ik->jk", wc, dd, dy)

    Ls = linalg.chol_factor(S)
    K = linalg.chol_solve(Ls, Pxy.T).T
    innov = y - y_mean
    dx = K @ innov
    qpos = state_add(m, qpos_pred, dx[:nv])
    qvel = qvel_pred + dx[nv:]
    P_new = P - K @ S @ K.T
    P_new = 0.5 * (P_new + P_new.T) + 1e-12 * jnp.eye(n, dtype=dtype)

    new = UKFState(state=State(qpos=qpos, qvel=qvel,
                               time=st.time + m.dt), cov=P_new)
    return new, jnp.linalg.norm(innov)
