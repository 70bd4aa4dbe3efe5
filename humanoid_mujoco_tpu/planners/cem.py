"""Cross-entropy method planner.

Rebuild of the reference's CrossEntropyPlanner
(mjpc/planners/cross_entropy/planner.cc): sample around the mean plan,
keep n_elite = max(N/10, 2) (planner.cc:63-65), refit per-knot Gaussian
mean/variance over the elites (220-260), sampling std = max(sqrt(var),
std_min) (343-366). The elite reduction is a `lax.top_k` on device.
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
from .policy import SplinePolicy, resample_policy
from .sampling import PlanInfo


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CEMConfig:
    nsample: int = dataclasses.field(default=64, metadata=dict(static=True))
    nknots: int = dataclasses.field(default=3, metadata=dict(static=True))
    horizon: int = dataclasses.field(default=17, metadata=dict(static=True))
    order: int = dataclasses.field(default=SplineOrder.ZERO,
                                   metadata=dict(static=True))
    solver_iters: int = dataclasses.field(default=8,
                                          metadata=dict(static=True))
    n_elite: int = dataclasses.field(default=6, metadata=dict(static=True))
    std_initial: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.1))
    std_min: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.01))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CEMState:
    """Per-knot sampling variance carried across plan iterations
    (variance_ in cross_entropy/planner.h)."""

    std: jax.Array   # (K, nu)


def cem_init(m: Model, cfg: CEMConfig) -> CEMState:
    dtype = m.body_pos.dtype
    return CEMState(std=jnp.full((cfg.nknots, m.nu), cfg.std_initial,
                                 dtype=dtype))


def cem_plan(m: Model, task: Task, cfg: CEMConfig, policy: SplinePolicy,
             cem_state: CEMState, state: State, rng: jax.Array
             ) -> Tuple[SplinePolicy, CEMState, PlanInfo]:
    horizon_s = cfg.horizon * m.dt
    nominal = resample_policy(policy, state.time, horizon_s, cfg.nknots,
                              cfg.order)
    half_range = 0.5 * (m.act_ctrlrange[:, 1] - m.act_ctrlrange[:, 0])
    std = jnp.maximum(cem_state.std, cfg.std_min * half_range)

    noise = jax.random.normal(
        rng, (cfg.nsample, cfg.nknots, m.nu), dtype=nominal.values.dtype)
    cands = nominal.values[None] + noise * std[None]
    cands = cands.at[0].set(nominal.values)
    cands = jnp.clip(cands, m.act_ctrlrange[:, 0], m.act_ctrlrange[:, 1])

    def run(values):
        r = rollout_spline(m, task, state, nominal.times, values, cfg.order,
                           cfg.horizon, solver_iters=cfg.solver_iters)
        return r.total_return

    returns = jax.vmap(run)(cands)
    # elites: lowest-cost n_elite (planner.cc:220-260)
    neg_top, elite_idx = jax.lax.top_k(-returns, cfg.n_elite)
    elites = cands[elite_idx]                       # (E, K, nu)
    mean = jnp.mean(elites, axis=0)
    var = jnp.mean((elites - mean) ** 2, axis=0)
    new_std = jnp.sqrt(var)

    winner = elite_idx[0]
    new_policy = SplinePolicy(times=nominal.times, values=mean)
    info = PlanInfo(returns=returns, winner=winner,
                    best_return=returns[winner], nominal_return=returns[0],
                    improvement=returns[0] - returns[winner])
    return new_policy, CEMState(std=new_std), info
