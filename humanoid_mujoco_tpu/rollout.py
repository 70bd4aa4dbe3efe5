"""Batched rollout engine — the Trajectory/rollout analog.

The reference fans N rollouts across a thread pool with one mjData per
worker (mjpc/trajectory.cc:92-210, sampling/planner.cc:342-380). Here a
rollout is a `lax.scan` over the physics step, and the candidate batch is
a leading `vmap` axis — thousands of lockstep trajectories per chip, with
the batch axis shardable over a device mesh (parallel/).

Divergence guard: kMaxReturnValue = 1e6 for any rollout whose physics
diverged (trajectory.cc:29,168-187).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .ops.spline import spline_sample
from .physics.model import Model, State
from .physics.step import step
from .tasks.base import Task, cost_value

MAX_RETURN = 1e6


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RolloutResult:
    total_return: jax.Array   # () sum of per-step costs (1e6 if diverged)
    costs: jax.Array          # (T,) per-step cost
    residuals: jax.Array      # (T, nres)
    final_state: State
    diverged: jax.Array       # () any step diverged


def rollout_spline(m: Model, task: Task, s0: State, times: jax.Array,
                   values: jax.Array, order: int, horizon: int,
                   xfrc_seq: Optional[jax.Array] = None,
                   solver_iters: int = 8) -> RolloutResult:
    """Roll a spline policy for `horizon` steps of m.dt.

    times: (K,), values: (K, nu); xfrc_seq: optional (horizon, nbody, 6)
    per-step external wrenches (OU perturbations for robust planning,
    mjpc/trajectory.cc:147-155).
    """
    lo = m.act_ctrlrange[:, 0]
    hi = m.act_ctrlrange[:, 1]

    def body(s, x):
        xfrc = x
        ctrl = jnp.clip(spline_sample(times, values, s.time, order), lo, hi)
        s_new, info = step(m, s, ctrl, xfrc=xfrc, solver_iters=solver_iters)
        res = task.residual(m, s, info, ctrl)
        return s_new, (res, info.diverged)

    xs = xfrc_seq if xfrc_seq is not None else None
    s_end, (residuals, diverged) = jax.lax.scan(
        body, s0, xs, length=None if xfrc_seq is not None else horizon)

    costs = cost_value(task, residuals)
    # normalize by horizon (UpdateReturn, mjpc/trajectory.cc:325)
    total = jnp.sum(costs) / jnp.maximum(costs.shape[0], 1)
    bad = jnp.logical_or(jnp.any(diverged), ~jnp.isfinite(total))
    total = jnp.where(bad, MAX_RETURN, total)
    return RolloutResult(total_return=total, costs=costs,
                         residuals=residuals, final_state=s_end,
                         diverged=jnp.any(diverged))


def rollout_actions(m: Model, task: Task, s0: State, actions: jax.Array,
                    solver_iters: int = 8) -> RolloutResult:
    """Roll an explicit action sequence (T, nu) — RolloutDiscrete analog
    (mjpc/trajectory.cc:213), used by iLQG line-search rollouts."""
    lo = m.act_ctrlrange[:, 0]
    hi = m.act_ctrlrange[:, 1]

    def body(s, ctrl):
        ctrl = jnp.clip(ctrl, lo, hi)
        s_new, info = step(m, s, ctrl, solver_iters=solver_iters)
        res = task.residual(m, s, info, ctrl)
        return s_new, (res, info.diverged)

    s_end, (residuals, diverged) = jax.lax.scan(body, s0, actions)
    costs = cost_value(task, residuals)
    # normalize by horizon (UpdateReturn, mjpc/trajectory.cc:325)
    total = jnp.sum(costs) / jnp.maximum(costs.shape[0], 1)
    bad = jnp.logical_or(jnp.any(diverged), ~jnp.isfinite(total))
    total = jnp.where(bad, MAX_RETURN, total)
    return RolloutResult(total_return=total, costs=costs,
                         residuals=residuals, final_state=s_end,
                         diverged=jnp.any(diverged))


def ou_wrench_sequence(rng: jax.Array, horizon: int, nbody: int,
                       scale: jax.Array, rate: float, dt: float,
                       dtype=jnp.float32) -> jax.Array:
    """Ornstein-Uhlenbeck random wrench sequence (horizon, nbody, 6) —
    the NoisyRollout perturbation model (mjpc/trajectory.cc:147-155)."""
    theta = 1.0 / jnp.maximum(rate, 1e-6)
    noise = jax.random.normal(rng, (horizon, nbody, 6), dtype=dtype)

    def body(x, w):
        x = x + theta * (0.0 - x) * dt + scale * jnp.sqrt(2 * theta * dt) * w
        return x, x

    _, seq = jax.lax.scan(body, jnp.zeros((nbody, 6), dtype=dtype), noise)
    return seq
