"""Predictive-sampling planner (zero-order random search).

TPU-native rebuild of the reference's SamplingPlanner
(mjpc/planners/sampling/planner.cc:151-380) fused with the MJX
predictive-sampling design it also ships
(python/mujoco_mpc/mjx/predictive_sampling.py:84-110):

  resample nominal to now -> N-1 Gaussian knot perturbations + nominal
  -> vmapped lockstep rollouts -> argmin winner.

Everything is one jit region; the candidate axis is shardable over a
device mesh (parallel/plan.py) with an argmin reduction over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.spline import SplineOrder
from ..physics.model import Model, State
from ..rollout import rollout_spline
from ..tasks.base import Task
from .policy import SplinePolicy, knot_times, resample_policy

_STD2_PROPORTION = 0.2  # hardcoded 2nd-std mixture share (planner.cc:325)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    # static structure
    nsample: int = dataclasses.field(
        default=64, metadata=dict(static=True))      # candidates incl nominal
    nknots: int = dataclasses.field(
        default=3, metadata=dict(static=True))       # sampling_spline_points
    horizon: int = dataclasses.field(
        default=17, metadata=dict(static=True))      # steps of plan-model dt
    order: int = dataclasses.field(
        default=SplineOrder.ZERO, metadata=dict(static=True))
    solver_iters: int = dataclasses.field(default=8,
                                          metadata=dict(static=True))
    # tunables (leaves)
    exploration: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.05))   # sampling_exploration
    exploration2: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.0))    # 2nd std (0 = off)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PlanInfo:
    returns: jax.Array        # (N,)
    winner: jax.Array         # () index
    best_return: jax.Array    # ()
    nominal_return: jax.Array  # () return of the unperturbed candidate
    improvement: jax.Array    # () nominal - best


def sample_candidates(m: Model, cfg: SamplingConfig, nominal: jax.Array,
                      rng: jax.Array) -> jax.Array:
    """(N, K, nu) candidates: index 0 = nominal, rest = Gaussian knots
    scaled by exploration * ctrlrange half-width (planner.cc:313-339),
    with an optional 20% two-std mixture."""
    N, K, nu = cfg.nsample, cfg.nknots, nominal.shape[-1]
    half_range = 0.5 * (m.act_ctrlrange[:, 1] - m.act_ctrlrange[:, 0])
    k_noise, k_mix = jax.random.split(rng)
    std = cfg.exploration
    use2 = jnp.logical_and(
        cfg.exploration2 > 0,
        jax.random.uniform(k_mix, (N,)) < _STD2_PROPORTION)
    std_per = jnp.where(use2, cfg.exploration2, std)     # (N,)
    noise = jax.random.normal(k_noise, (N, K, nu), dtype=nominal.dtype)
    noise = noise * std_per[:, None, None] * half_range
    noise = noise.at[0].set(0.0)
    cands = nominal[None] + noise
    return jnp.clip(cands, m.act_ctrlrange[:, 0], m.act_ctrlrange[:, 1])


def sampling_plan(m: Model, task: Task, cfg: SamplingConfig,
                  policy: SplinePolicy, state: State, rng: jax.Array
                  ) -> Tuple[SplinePolicy, PlanInfo]:
    """One OptimizePolicy iteration (planner.cc:190-208)."""
    horizon_s = cfg.horizon * m.dt
    nominal = resample_policy(policy, state.time, horizon_s, cfg.nknots,
                              cfg.order)
    cands = sample_candidates(m, cfg, nominal.values, rng)

    def run(values):
        r = rollout_spline(m, task, state, nominal.times, values, cfg.order,
                           cfg.horizon, solver_iters=cfg.solver_iters)
        return r.total_return

    returns = jax.vmap(run)(cands)                       # (N,)
    winner = jnp.argmin(returns)
    new_policy = SplinePolicy(times=nominal.times, values=cands[winner])
    info = PlanInfo(returns=returns, winner=winner,
                    best_return=returns[winner],
                    nominal_return=returns[0],
                    improvement=returns[0] - returns[winner])
    return new_policy, info
