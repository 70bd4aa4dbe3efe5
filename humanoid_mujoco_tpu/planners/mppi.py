"""MPPI (model-predictive path integral) planner.

Not present in the reference's C++ planner set, but named in this repo's
benchmark configs ("MPPI-style 4k rollouts", BASELINE.md) and a natural
TPU planner: same sampling machinery as predictive sampling, but the
update is the exponentially-weighted average of ALL candidates
    w_i = softmax(-(J_i - min J) / lambda),  u = sum_i w_i u_i
instead of the argmin — smoother plans at large N.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.spline import SplineOrder
from ..physics.model import Model, State
from ..rollout import MAX_RETURN, rollout_spline
from ..tasks.base import Task
from .policy import SplinePolicy, resample_policy
from .sampling import PlanInfo, SamplingConfig, sample_candidates


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MPPIConfig(SamplingConfig):
    temperature: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1.0))


def mppi_plan(m: Model, task: Task, cfg: MPPIConfig, policy: SplinePolicy,
              state: State, rng: jax.Array
              ) -> Tuple[SplinePolicy, PlanInfo]:
    horizon_s = cfg.horizon * m.dt
    nominal = resample_policy(policy, state.time, horizon_s, cfg.nknots,
                              cfg.order)
    cands = sample_candidates(m, cfg, nominal.values, rng)

    def run(values):
        r = rollout_spline(m, task, state, nominal.times, values, cfg.order,
                           cfg.horizon, solver_iters=cfg.solver_iters)
        return r.total_return

    returns = jax.vmap(run)(cands)
    best = jnp.min(returns)
    # diverged rollouts (1e6) get ~zero weight automatically
    w = jax.nn.softmax(-(returns - best) / cfg.temperature)
    values = jnp.einsum("n,nku->ku", w, cands)
    values = jnp.clip(values, m.act_ctrlrange[:, 0], m.act_ctrlrange[:, 1])

    winner = jnp.argmin(returns)
    info = PlanInfo(returns=returns, winner=winner, best_return=best,
                    nominal_return=returns[0],
                    improvement=returns[0] - best)
    return SplinePolicy(times=nominal.times, values=values), info
