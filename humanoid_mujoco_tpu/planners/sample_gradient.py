"""Sample-gradient planner.

Rebuild of mjpc/planners/sample_gradient/planner.h:146-162: augment the
random sampling candidates with candidates stepped along a GRADIENT
ESTIMATE recovered from the previous iteration's samples (zero-order /
evolution-strategies estimate), at log-spaced step sizes, with a
low-pass filter on the gradient across iterations.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..physics.model import Model, State
from ..rollout import rollout_spline
from ..tasks.base import Task
from .policy import SplinePolicy, resample_policy
from .sampling import PlanInfo, SamplingConfig, sample_candidates


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SampleGradientConfig:
    sampling: SamplingConfig = dataclasses.field(
        default_factory=SamplingConfig)
    n_gradient: int = dataclasses.field(default=8,
                                        metadata=dict(static=True))
    filter_coef: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.5))
    step_max: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.5))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SampleGradientState:
    grad: jax.Array    # (nknots, nu) filtered gradient estimate


def sample_gradient_init(m: Model, cfg: SampleGradientConfig
                         ) -> SampleGradientState:
    return SampleGradientState(
        grad=jnp.zeros((cfg.sampling.nknots, m.nu),
                       dtype=m.body_pos.dtype))


def sample_gradient_plan(m: Model, task: Task, cfg: SampleGradientConfig,
                         policy: SplinePolicy, gs: SampleGradientState,
                         state: State, rng: jax.Array
                         ) -> Tuple[SplinePolicy, SampleGradientState,
                                    PlanInfo]:
    sc = cfg.sampling
    dtype = state.qpos.dtype
    horizon_s = sc.horizon * m.dt
    nominal = resample_policy(policy, state.time, horizon_s, sc.nknots,
                              sc.order)
    cands = sample_candidates(m, sc, nominal.values, rng)   # (N, K, nu)

    # gradient-direction candidates at log-spaced steps
    gnorm = jnp.sqrt(jnp.sum(gs.grad ** 2) + 1e-12)
    gdir = gs.grad / gnorm
    steps = (cfg.step_max
             * jnp.logspace(-3, 0, cfg.n_gradient).astype(dtype))
    gcands = jnp.clip(nominal.values[None] - steps[:, None, None] * gdir,
                      m.act_ctrlrange[:, 0], m.act_ctrlrange[:, 1])
    all_cands = jnp.concatenate([cands, gcands], axis=0)

    def run(values):
        return rollout_spline(m, task, state, nominal.times, values,
                              sc.order, sc.horizon,
                              solver_iters=sc.solver_iters).total_return

    returns = jax.vmap(run)(all_cands)
    winner = jnp.argmin(returns)

    # ES-style gradient estimate from the random samples
    # g ~ mean_i (J_i - J_nom) * (cand_i - nominal) / sigma^2
    half_range = 0.5 * (m.act_ctrlrange[:, 1] - m.act_ctrlrange[:, 0])
    sigma2 = jnp.maximum((sc.exploration * half_range) ** 2, 1e-8)
    dr = returns[1:sc.nsample] - returns[0]                 # (N-1,)
    dc = cands[1:] - nominal.values[None]                   # (N-1, K, nu)
    g_new = jnp.einsum("n,nku->ku", dr, dc) / (
        (sc.nsample - 1) * sigma2[None, :])
    # guard: diverged rollouts (1e6 returns) poison the estimate
    g_new = jnp.where(jnp.max(jnp.abs(dr)) > 1e5,
                      jnp.zeros_like(g_new), g_new)
    grad = cfg.filter_coef * gs.grad + (1 - cfg.filter_coef) * g_new

    new_policy = SplinePolicy(times=nominal.times,
                              values=all_cands[winner])
    info = PlanInfo(returns=returns, winner=winner,
                    best_return=returns[winner],
                    nominal_return=returns[0],
                    improvement=returns[0] - returns[winner])
    return new_policy, SampleGradientState(grad=grad), info
