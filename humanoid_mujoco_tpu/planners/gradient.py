"""Gradient (first-order shooting) planner.

Rebuild of mjpc/planners/gradient/: linearize along the nominal
(derivatives.py), run the backward COST-GRADIENT recursion
(Gradient::GradientStep, gradient/gradient.h:44), map the action-space
gradient into spline-knot space through the interpolation weight matrix
(the SplineMapping analog, gradient/spline_mapping.cc:1-208 — for
linear-in-knots interpolants, du_knots = W^T du_actions exactly), then
line-search over log-spaced steps with vmapped rollouts
(gradient_num_trajectory default 32, gradient/planner.cc:61).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.spline import SplineOrder
from ..physics.model import Model, State
from ..rollout import rollout_spline
from ..tasks.base import Task
from .derivatives import trajectory_derivatives
from .policy import SplinePolicy, resample_policy
from .sampling import PlanInfo


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GradientConfig:
    nknots: int = dataclasses.field(default=5, metadata=dict(static=True))
    horizon: int = dataclasses.field(default=17, metadata=dict(static=True))
    order: int = dataclasses.field(default=SplineOrder.LINEAR,
                                   metadata=dict(static=True))
    n_linesearch: int = dataclasses.field(default=12,
                                          metadata=dict(static=True))
    solver_iters: int = dataclasses.field(default=8,
                                          metadata=dict(static=True))
    deriv_solver_iters: int = dataclasses.field(default=3,
                                               metadata=dict(static=True))
    step_max: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1.0))


def interp_weights(times: jax.Array, knot_times: jax.Array, order: int
                   ) -> jax.Array:
    """W (T, K) with u(t_i) = sum_k W[i, k] knot_k for zero/linear
    interpolation (the linear-in-knots spline mapping)."""
    T = times.shape[0]
    K = knot_times.shape[0]
    idx = jnp.clip(jnp.searchsorted(knot_times, times, side="right") - 1,
                   0, K - 1)
    if order == SplineOrder.ZERO:
        return jax.nn.one_hot(idx, K, dtype=times.dtype)
    lo = jnp.clip(idx, 0, K - 2)
    hi = lo + 1
    h = jnp.maximum(knot_times[hi] - knot_times[lo], 1e-9)
    s = jnp.clip((times - knot_times[lo]) / h, 0.0, 1.0)
    return (jax.nn.one_hot(lo, K, dtype=times.dtype) * (1 - s)[:, None]
            + jax.nn.one_hot(hi, K, dtype=times.dtype) * s[:, None])


def gradient_plan(m: Model, task: Task, cfg: GradientConfig,
                  policy: SplinePolicy, state: State, rng: jax.Array
                  ) -> Tuple[SplinePolicy, PlanInfo]:
    dtype = state.qpos.dtype
    horizon_s = cfg.horizon * m.dt
    nominal = resample_policy(policy, state.time, horizon_s, cfg.nknots,
                              cfg.order)

    # nominal rollout (records states for linearization)
    def nom_roll():
        from ..physics.step import step
        from ..ops.spline import spline_sample
        lo, hi = m.act_ctrlrange[:, 0], m.act_ctrlrange[:, 1]

        def body(s, _):
            u = jnp.clip(spline_sample(nominal.times, nominal.values,
                                       s.time, cfg.order), lo, hi)
            s2, _ = step(m, s, u, solver_iters=cfg.solver_iters)
            return s2, (s.qpos, s.qvel, u, s.time)

        s_end, (qp, qv, u, tt) = jax.lax.scan(body, state, None,
                                              length=cfg.horizon)
        qp = jnp.concatenate([qp, s_end.qpos[None]])
        qv = jnp.concatenate([qv, s_end.qvel[None]])
        tt = jnp.concatenate([tt, s_end.time[None]])
        return qp, qv, u, tt

    qp, qv, u_nom, times = nom_roll()
    derivs = trajectory_derivatives(
        m, task, qp, qv, u_nom, times,
        solver_iters=cfg.deriv_solver_iters)

    # backward gradient recursion: Qu_t = cu_t + B_t^T Vx_{t+1};
    # Vx_t = cx_t + A_t^T Vx_{t+1}  (gradient/gradient.h:44)
    def back(Vx, inp):
        A, B, cx, cu = inp
        Qu = cu + B.T @ Vx
        Vx_new = cx + A.T @ Vx
        return Vx_new, Qu

    nx = derivs.cx.shape[1]
    _, Qu = jax.lax.scan(back, jnp.zeros(nx, dtype=dtype),
                         (derivs.A, derivs.B, derivs.cx, derivs.cu),
                         reverse=True)                     # (T, nu)

    # map to knot space through the interpolation weights
    W = interp_weights(times[:-1], nominal.times, cfg.order)  # (T, K)
    g_knots = W.T @ Qu                                        # (K, nu)
    gnorm = jnp.sqrt(jnp.sum(g_knots ** 2) + 1e-12)
    g_dir = g_knots / gnorm

    # line search over log-spaced steps (incl. the nominal at step 0)
    steps = cfg.step_max * jnp.concatenate(
        [jnp.zeros((1,), dtype=dtype),
         jnp.logspace(-4, 0, cfg.n_linesearch - 1).astype(dtype)])

    def run(alpha):
        values = jnp.clip(nominal.values - alpha * g_dir,
                          m.act_ctrlrange[:, 0], m.act_ctrlrange[:, 1])
        r = rollout_spline(m, task, state, nominal.times, values,
                           cfg.order, cfg.horizon,
                           solver_iters=cfg.solver_iters)
        return r.total_return, values

    returns, cand_values = jax.vmap(run)(steps)
    winner = jnp.argmin(returns)
    new_policy = SplinePolicy(times=nominal.times,
                              values=cand_values[winner])
    info = PlanInfo(returns=returns, winner=winner,
                    best_return=returns[winner],
                    nominal_return=returns[0],
                    improvement=returns[0] - returns[winner])
    return new_policy, info
