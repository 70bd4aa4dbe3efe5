"""Closed-loop MPC driver: plan -> act cycles as one jit region.

The analog of both the reference Agent's asynchronous plan loop
(mjpc/agent.cc:270-329, synchronous flavor as in testspeed.cc:44-129)
and the MJX mpc_rollout (python/mujoco_mpc/mjx/predictive_sampling.py:
133-178): an outer `lax.scan` over plan cycles; each cycle runs one
planner iteration on the PLANNING model (coarse timestep, the reference's
agent_timestep=0.02) and then advances the SIMULATION model (fine
timestep) under the updated policy.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .physics.model import Model, State
from .physics.step import step
from .planners.policy import SplinePolicy, policy_action
from .tasks.base import Task, cost_value

# plan_fn: (plan_model, task, policy, state, rng) -> (policy, info)
PlanFn = Callable


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MPCResult:
    final_state: State
    final_policy: SplinePolicy
    states: jax.Array       # (ncycle, steps_per_plan, nq) qpos trace
    ctrls: jax.Array        # (ncycle, steps_per_plan, nu)
    costs: jax.Array        # (ncycle, steps_per_plan) sim-model step costs
    plan_returns: jax.Array  # (ncycle,) best return per plan iteration
    final_task: object = None  # when run_transition: task after the run
    #   (goal mocap moved / mode advanced — Task::Transition state)


def spline_action_fn(order: int):
    """action_fn for spline policies (sampling/CEM/MPPI)."""
    def fn(m, policy, s):
        return policy_action(m, policy, s.time, order)
    return fn


def ilqg_action_fn(m, policy, s):
    """action_fn for iLQG feedback policies (closes the K(t) loop at the
    sim rate, like the reference physics thread, app.cc:90-93)."""
    from .planners.ilqg import ilqg_action
    return ilqg_action(m, policy, s.qpos, s.qvel, s.time)


def mpc_rollout(sim_model: Model, plan_model: Model, task: Task,
                plan_fn: PlanFn, policy, state: State,
                rng: jax.Array, ncycle: int, steps_per_plan: int,
                action_fn, sim_solver_iters: int = 8,
                run_transition: bool = False) -> MPCResult:
    """Run `ncycle` plan->act cycles; fully jittable (jit over static
    ncycle/steps_per_plan). `action_fn(m, policy, state) -> ctrl` queries
    the policy at the sim rate (feedback policies see the live state).

    `run_transition` threads the Task pytree through the loop and calls
    Task::Transition after every sim step (mjpc/app.cc:280 runs it in
    the physics loop) — waypoint circuits / goal respawns advance live;
    the planner then plans against the updated goal each cycle."""

    def cycle(carry, key):
        state, policy, tsk = carry
        policy, info = plan_fn(plan_model, tsk, policy, state, key)

        def sim_step(c, _):
            s, t = c
            ctrl = action_fn(sim_model, policy, s)
            s_new, step_info = step(sim_model, s, ctrl,
                                    solver_iters=sim_solver_iters)
            res = t.residual(sim_model, s, step_info, ctrl)
            t_new = (t.transition(sim_model, s_new, step_info)
                     if run_transition else t)
            return (s_new, t_new), (s.qpos, ctrl, cost_value(t, res))

        (state, tsk), (qpos, ctrls, costs) = jax.lax.scan(
            sim_step, (state, tsk), None, length=steps_per_plan)
        return (state, policy, tsk), (qpos, ctrls, costs,
                                      info.best_return)

    keys = jax.random.split(rng, ncycle)
    (state, policy, task), (qpos, ctrls, costs, best) = jax.lax.scan(
        cycle, (state, policy, task), keys)
    return MPCResult(final_state=state, final_policy=policy, states=qpos,
                     ctrls=ctrls, costs=costs, plan_returns=best,
                     final_task=task if run_transition else None)


def make_plan_model(m: Model, plan_dt: float) -> Model:
    """Planning model = sim model at the agent timestep
    (agent_timestep, task.xml:13)."""
    return m.replace(dt=jnp.asarray(plan_dt, dtype=m.body_pos.dtype))
