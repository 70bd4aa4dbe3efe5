"""Robust planner (meta-planner over a sampling delegate).

Rebuild of mjpc/planners/robust/robust_planner.cc:46-130: take the
delegate's top-K candidate plans, re-roll each with R Ornstein-Uhlenbeck
random-wrench perturbation sequences (NoisyRollout,
mjpc/trajectory.cc:100-210), and pick the candidate with the best
AVERAGE perturbed return — robustness by Monte-Carlo averaging instead
of a single nominal rollout.

Defaults match the reference: repetitions=5, xfrc scale=0.1,
xfrc rate=0.1 (robust_planner.cc:46-57).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..physics.model import Model, State
from ..rollout import ou_wrench_sequence, rollout_spline
from ..tasks.base import Task
from .policy import SplinePolicy, resample_policy
from .sampling import PlanInfo, SamplingConfig, sample_candidates


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RobustConfig:
    sampling: SamplingConfig = dataclasses.field(
        default_factory=SamplingConfig)
    n_best: int = dataclasses.field(default=4, metadata=dict(static=True))
    repetitions: int = dataclasses.field(default=5,
                                         metadata=dict(static=True))
    xfrc_std: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.1))
    xfrc_rate: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.1))


def robust_plan(m: Model, task: Task, cfg: RobustConfig,
                policy: SplinePolicy, state: State, rng: jax.Array
                ) -> Tuple[SplinePolicy, PlanInfo]:
    sc = cfg.sampling
    horizon_s = sc.horizon * m.dt
    nominal = resample_policy(policy, state.time, horizon_s, sc.nknots,
                              sc.order)
    k_cand, k_ou = jax.random.split(rng)
    cands = sample_candidates(m, sc, nominal.values, k_cand)

    def run_clean(values):
        return rollout_spline(m, task, state, nominal.times, values,
                              sc.order, sc.horizon,
                              solver_iters=sc.solver_iters).total_return

    returns = jax.vmap(run_clean)(cands)                   # (N,)
    # top-K candidates by clean return (RobustPlanner's ranked delegate)
    _, top_idx = jax.lax.top_k(-returns, cfg.n_best)
    top = cands[top_idx]                                   # (K, knots, nu)

    # OU wrench sequences shared across candidates (same perturbations
    # for a fair comparison)
    nbody = m.struct.nbody
    dtype = state.qpos.dtype
    ou_keys = jax.random.split(k_ou, cfg.repetitions)
    seqs = jax.vmap(lambda k: ou_wrench_sequence(
        k, sc.horizon, nbody, cfg.xfrc_std, cfg.xfrc_rate, m.dt,
        dtype=dtype))(ou_keys)                             # (R, T, nbody, 6)

    def run_noisy(values, seq):
        return rollout_spline(m, task, state, nominal.times, values,
                              sc.order, sc.horizon, xfrc_seq=seq,
                              solver_iters=sc.solver_iters).total_return

    noisy = jax.vmap(lambda v: jax.vmap(
        lambda s_: run_noisy(v, s_))(seqs))(top)            # (K, R)
    avg = jnp.mean(noisy, axis=-1)
    best_k = jnp.argmin(avg)
    winner_idx = top_idx[best_k]

    new_policy = SplinePolicy(times=nominal.times, values=top[best_k])
    info = PlanInfo(returns=returns, winner=winner_idx,
                    best_return=avg[best_k],
                    nominal_return=returns[0],
                    improvement=returns[0] - returns[winner_idx])
    return new_policy, info
