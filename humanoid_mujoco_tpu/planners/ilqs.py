"""iLQS planner: alternating Sampling and iLQG.

Rebuild of mjpc/planners/ilqs/planner.cc:86-248 — run a predictive-
sampling iteration, convert its winning spline into an iLQG nominal
(open-loop warm start), run an iLQG iteration, convert the refined
action trajectory BACK to a spline by least squares (the normal-equation
spline fit at ilqs/planner.cc:115-170 — here W^T W knots = W^T u with
the interpolation weight matrix), and keep whichever policy achieved the
lower return (`active_policy` switch).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import linalg
from ..ops.spline import SplineOrder, spline_sample
from ..physics.model import Model, State
from ..rollout import rollout_spline
from ..tasks.base import Task
from .gradient import interp_weights
from .ilqg import ILQGConfig, ILQGState, ilqg_init, ilqg_plan
from .policy import SplinePolicy
from .sampling import PlanInfo, SamplingConfig, sampling_plan


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ILQSConfig:
    sampling: SamplingConfig = dataclasses.field(
        default_factory=SamplingConfig)
    ilqg: ILQGConfig = dataclasses.field(default_factory=ILQGConfig)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ILQSState:
    spline: SplinePolicy
    ilqg: ILQGState
    active_ilqg: jax.Array    # () bool: which policy won last iteration


def ilqs_init(m: Model, cfg: ILQSConfig, state: State,
              spline: SplinePolicy) -> ILQSState:
    return ILQSState(spline=spline,
                     ilqg=ilqg_init(m, cfg.ilqg, state),
                     active_ilqg=jnp.asarray(False))


def spline_fit(u: jax.Array, times: jax.Array, knot_times: jax.Array,
               order: int) -> jax.Array:
    """Least-squares spline fit: knots = argmin |W knots - u|^2
    (ilqs/planner.cc:115-170 normal equations + Cholesky)."""
    W = interp_weights(times, knot_times, order)          # (T, K)
    K = knot_times.shape[0]
    A = W.T @ W + 1e-6 * jnp.eye(K, dtype=u.dtype)
    return linalg.solve_psd(A, W.T @ u)                   # (K, nu)


def ilqs_plan(m: Model, task: Task, cfg: ILQSConfig, ps: ILQSState,
              state: State, rng: jax.Array) -> Tuple[ILQSState, PlanInfo]:
    # 1. sampling iteration on the spline policy
    spline, s_info = sampling_plan(m, task, cfg.sampling, ps.spline,
                                   state, rng)

    # 2. seed iLQG's nominal with the sampling winner (open loop)
    T = cfg.ilqg.horizon
    dtype = state.qpos.dtype
    times = state.time + m.dt * jnp.arange(T + 1, dtype=dtype)
    u_seed = jnp.clip(
        spline_sample(spline.times, spline.values, times[:-1],
                      cfg.sampling.order),
        m.act_ctrlrange[:, 0], m.act_ctrlrange[:, 1])
    warm_policy = ps.ilqg.policy.replace(
        times=times, u_nom=u_seed,
        K=jnp.zeros_like(ps.ilqg.policy.K))
    ilqg_state = dataclasses.replace(ps.ilqg, policy=warm_policy)

    # 3. iLQG iteration
    ilqg_state, g_info = ilqg_plan(m, task, cfg.ilqg, ilqg_state, state)

    # 4. convert the refined trajectory back to spline via LS fit and
    #    keep the better policy
    fitted = spline_fit(ilqg_state.policy.u_nom, times[:-1],
                        spline.times, cfg.sampling.order)
    fitted = jnp.clip(fitted, m.act_ctrlrange[:, 0],
                      m.act_ctrlrange[:, 1])
    ilqg_better = g_info.best_return < s_info.best_return
    new_spline = SplinePolicy(
        times=spline.times,
        values=jnp.where(ilqg_better, fitted, spline.values))

    best = jnp.minimum(g_info.best_return, s_info.best_return)
    info = PlanInfo(returns=s_info.returns, winner=s_info.winner,
                    best_return=best,
                    nominal_return=s_info.nominal_return,
                    improvement=s_info.nominal_return - best)
    return ILQSState(spline=new_spline, ilqg=ilqg_state,
                     active_ilqg=ilqg_better), info
