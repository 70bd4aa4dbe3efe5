"""Batch (moving-horizon) estimator.

Rebuild of the reference's recursive sliding-window MLE
(mjpc/estimators/batch.h:39-78, built on the direct optimizer): keep a
fixed window of the last W (state, ctrl, measurement) triples; estimate
tangent corrections to the whole window by Gauss-Newton on

    sum_t |y_t - h(x_t)|^2_Rinv  +  sum_t |x_{t+1} ⊖ f(x_t)|^2_Qinv
    + |x_0 ⊖ prior|^2_Pinv

The reference factorizes a banded Hessian with band Cholesky
(batch/direct.cc:504-506); at W*2nv <= a few hundred a dense solve in
XLA's native Cholesky is faster on TPU than managing bands, so the
structure-exploiting step is left to the compiler.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import linalg
from ..physics.model import Model, State
from ..physics.step import step
from ..physics.tangent import state_add, state_diff
from ..planners.derivatives import step_tangent_jacobians
from .sensors import SensorModel, measure, measurement_jacobian


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BatchConfig:
    window: int = dataclasses.field(default=8, metadata=dict(static=True))
    gn_iters: int = dataclasses.field(default=2, metadata=dict(static=True))
    solver_iters: int = dataclasses.field(default=4,
                                          metadata=dict(static=True))
    process_noise_pos: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-4))
    process_noise_vel: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-2))
    prior_cov: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-2))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BatchState:
    qpos_win: jax.Array    # (W, nq) window of state estimates
    qvel_win: jax.Array    # (W, nv)
    ctrl_win: jax.Array    # (W, nu) controls applied at each window step
    y_win: jax.Array       # (W, ny) measurements
    time: jax.Array
    filled: jax.Array      # () int32 number of valid entries


def batch_init(m: Model, cfg: BatchConfig, state: State,
               ny: int = 30) -> BatchState:
    W = cfg.window
    dtype = state.qpos.dtype
    return BatchState(
        qpos_win=jnp.tile(state.qpos, (W, 1)),
        qvel_win=jnp.tile(state.qvel, (W, 1)),
        ctrl_win=jnp.zeros((W, m.nu), dtype=dtype),
        y_win=jnp.tile(measure(m, state.qpos, state.qvel), (W, 1)),
        time=state.time, filled=jnp.asarray(1, jnp.int32))


def batch_update(m: Model, cfg: BatchConfig, sensor: SensorModel,
                 bs: BatchState, ctrl: jax.Array, y: jax.Array
                 ) -> Tuple[BatchState, State]:
    """Shift the window, append (ctrl, y), re-optimize all window states.

    Returns (new batch state, current MAP state estimate)."""
    W = cfg.window
    nv = m.nv
    n = 2 * nv
    dtype = y.dtype

    # shift in: predict the newest state from the last estimate
    last = State(bs.qpos_win[-1], bs.qvel_win[-1], bs.time)
    pred, _ = step(m, last, ctrl, solver_iters=cfg.solver_iters)
    qpos_win = jnp.concatenate([bs.qpos_win[1:], pred.qpos[None]])
    qvel_win = jnp.concatenate([bs.qvel_win[1:], pred.qvel[None]])
    ctrl_win = jnp.concatenate([bs.ctrl_win[1:], ctrl[None]])
    y_win = jnp.concatenate([bs.y_win[1:], y[None]])

    Rinv = 1.0 / (sensor.noise ** 2)
    Qinv = jnp.concatenate([
        jnp.full((nv,), 1.0 / cfg.process_noise_pos, dtype=dtype),
        jnp.full((nv,), 1.0 / cfg.process_noise_vel, dtype=dtype)])
    Pinv = jnp.full((n,), 1.0 / cfg.prior_cov, dtype=dtype)
    prior_q, prior_v = qpos_win[0], qvel_win[0]

    def gn_iter(carry, _):
        qp, qv = carry

        # measurement residuals + jacobians per window step
        def meas(qpi, qvi, yi):
            r = yi - measure(m, qpi, qvi)
            H = measurement_jacobian(m, qpi, qvi)
            return r, H

        r_y, H = jax.vmap(meas)(qp, qv, y_win)          # (W,ny),(W,ny,n)

        # dynamics residuals r_d[t] = x_{t+1} ⊖ f(x_t), jacobian A_t
        def dyn(qpi, qvi, ui, qpn, qvn):
            s2, _ = step(m, State(qpi, qvi, jnp.asarray(0.0, dtype)), ui,
                         solver_iters=cfg.solver_iters)
            r = state_diff(m, qpn, qvn, s2.qpos, s2.qvel)
            A, _ = step_tangent_jacobians(m, qpi, qvi, ui,
                                          jnp.asarray(0.0, dtype),
                                          s2.qpos, s2.qvel,
                                          solver_iters=cfg.solver_iters)
            return r, A

        r_d, A = jax.vmap(dyn)(qp[:-1], qv[:-1], ctrl_win[1:],
                               qp[1:], qv[1:])          # (W-1,n),(W-1,n,n)

        # assemble dense H_gn (W*n, W*n) and g (W*n,)
        Hgn = jnp.zeros((W * n, W * n), dtype=dtype)
        g = jnp.zeros((W * n,), dtype=dtype)
        for t in range(W):
            sl = slice(t * n, (t + 1) * n)
            Ht = H[t]
            Hgn = Hgn.at[sl, sl].add(Ht.T @ (Rinv[:, None] * Ht))
            g = g.at[sl].add(-Ht.T @ (Rinv * r_y[t]))
        # prior on the oldest state
        Hgn = Hgn.at[:n, :n].add(jnp.diag(Pinv))
        dx0 = state_diff(m, qp[0], qv[0], prior_q, prior_v)
        g = g.at[:n].add(Pinv * dx0)
        # dynamics coupling: r_d[t] = x_{t+1} ⊖ f(x_t);
        # d r/d x_t = -A_t, d r/d x_{t+1} = I
        for t in range(W - 1):
            s0 = slice(t * n, (t + 1) * n)
            s1 = slice((t + 1) * n, (t + 2) * n)
            At = A[t]
            WQ = Qinv[:, None]
            Hgn = Hgn.at[s0, s0].add(At.T @ (Qinv[:, None] * At))
            Hgn = Hgn.at[s1, s1].add(jnp.diag(Qinv))
            Hgn = Hgn.at[s0, s1].add(-At.T * Qinv[None, :])
            Hgn = Hgn.at[s1, s0].add((-At.T * Qinv[None, :]).T)
            # J_t = -A_t, J_{t+1} = I: grad += J^T (Qinv ∘ r_d)
            g = g.at[s0].add(-At.T @ (Qinv * r_d[t]))
            g = g.at[s1].add(Qinv * r_d[t])

        Hgn = Hgn + 1e-8 * jnp.eye(W * n, dtype=dtype)
        with linalg.native_scope():
            dx = -linalg.solve_psd(Hgn, g)

        def apply(qpi, qvi, d):
            return state_add(m, qpi, d[:nv]), qvi + d[nv:]

        qp2, qv2 = jax.vmap(apply)(qp, qv, dx.reshape(W, n))
        return (qp2, qv2), None

    (qp, qv), _ = jax.lax.scan(gn_iter, (qpos_win, qvel_win), None,
                               length=cfg.gn_iters)

    new = BatchState(qpos_win=qp, qvel_win=qv, ctrl_win=ctrl_win,
                     y_win=y_win, time=bs.time + m.dt,
                     filled=jnp.minimum(bs.filled + 1, W))
    est = State(qpos=qp[-1], qvel=qv[-1], time=new.time)
    return new, est
