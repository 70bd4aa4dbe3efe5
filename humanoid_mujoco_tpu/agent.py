"""Agent orchestrator — the mjpc::Agent + gRPC Agent service surface.

The reference exposes MPC through a gRPC service wrapping one Agent
(grpc/agent.proto:19-60, python/mujoco_mpc/agent.py bindings that spawn
an agent_server subprocess). TPU-native equivalent: an IN-PROCESS object
with the same API verbs — no process boundary, no serialization; the
planner step is one jit call. A thin TCP server for robot serving sits
on top (serving/server.py), and the C++ async runtime (native/) can run
the plan loop on a background thread like the reference's plan thread
(agent.cc:318-329).

API parity map (agent.proto -> here):
  Init               -> Agent(model, task, planner=...)
  SetState           -> set_state(qpos=..., qvel=..., time=...)
  GetState           -> get_state()
  PlannerStep        -> planner_step()
  GetAction          -> get_action(time=None, averaging_duration=0)
  Step               -> step() (ActionFromPolicy + sim step server-side)
  Reset              -> reset()
  SetTaskParameters  -> set_task_parameter(name, value)
  SetCostWeights     -> set_cost_weights({name: w})
  GetResiduals       -> get_residuals()
  GetCostValuesAndWeights -> get_cost_term_values()
  GetBestTrajectory  -> best_trajectory()
  SetMode/GetMode    -> set_mode(mode) / get_mode()
  SetMocap (binding set_mocap) -> set_mocap(name, pos, quat)
  SetAnything        -> set_anything(model=..., state=..., task=...)
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mpc import make_plan_model
from .ops.spline import SplineOrder
from .physics.model import Model, State, make_state
from .physics.step import forward, step
from .planners import (ILQGConfig, SamplingConfig, ilqg_action, ilqg_init,
                       ilqg_plan, init_policy, policy_action, sampling_plan)
from .planners import cem, mppi
from .tasks.base import Task, cost_terms

PLANNERS = ("sampling", "ilqg", "cem", "mppi")


class Agent:
    """Synchronous in-process agent (thread-safe enough for the serving
    loop; the async plan thread lives in native/runtime)."""

    def __init__(self, model: Model, task, planner: str = "ilqg",
                 plan_dt: float = 0.02, horizon: int = 17,
                 nsample: int = 64, seed: int = 0):
        if planner not in PLANNERS:
            raise ValueError(f"unknown planner {planner!r}; "
                             f"options: {PLANNERS}")
        if isinstance(task, str):
            # Init-by-task-id parity (grpc Init task_id, agent.proto:21)
            from .tasks.registry import get_task
            task = get_task(task)
        self.model = model
        self.plan_dt = plan_dt
        self.plan_model = make_plan_model(model, plan_dt)
        self.task = task
        self.planner = planner
        self.state = make_state(model)
        self.rng = jax.random.PRNGKey(seed)
        self._last_info = None

        if planner == "ilqg":
            self.cfg = ILQGConfig(horizon=horizon)
            self.pstate = ilqg_init(self.plan_model, self.cfg, self.state)
        elif planner == "sampling":
            self.cfg = SamplingConfig(nsample=nsample, horizon=horizon)
            self.pstate = init_policy(model, self.cfg.nknots)
        elif planner == "cem":
            self.cfg = cem.CEMConfig(nsample=nsample, horizon=horizon)
            self.pstate = init_policy(model, self.cfg.nknots)
            self.cem_state = cem.cem_init(model, self.cfg)
        elif planner == "mppi":
            self.cfg = mppi.MPPIConfig(nsample=nsample, horizon=horizon)
            self.pstate = init_policy(model, self.cfg.nknots)
        self._build_jit()

    def _build_jit(self):
        """Jitted closures. The Task is a TRACED argument (weights /
        params / risk are pytree leaves, term structure is static aux),
        so set_cost_weights / set_task_parameter are free: no retrace,
        no state reset — unlike the reference's per-request gRPC hop
        (grpc/agent.proto:34-36)."""
        if self.planner == "ilqg":
            self._plan = jax.jit(
                lambda task, ps, s: ilqg_plan(self.plan_model, task,
                                              self.cfg, ps, s))
            self._action = jax.jit(
                lambda pol, qp, qv, t: ilqg_action(self.model, pol, qp,
                                                   qv, t))
        elif self.planner == "sampling":
            self._plan = jax.jit(
                lambda task, p, s, k: sampling_plan(self.plan_model, task,
                                                    self.cfg, p, s, k))
            self._action = jax.jit(
                lambda pol, t: policy_action(self.model, pol, t,
                                             self.cfg.order))
        elif self.planner == "cem":
            self._plan = jax.jit(
                lambda task, p, c, s, k: cem.cem_plan(
                    self.plan_model, task, self.cfg, p, c, s, k))
            self._action = jax.jit(
                lambda pol, t: policy_action(self.model, pol, t,
                                             self.cfg.order))
        elif self.planner == "mppi":
            self._plan = jax.jit(
                lambda task, p, s, k: mppi.mppi_plan(self.plan_model, task,
                                                     self.cfg, p, s, k))
            self._action = jax.jit(
                lambda pol, t: policy_action(self.model, pol, t,
                                             self.cfg.order))

        self._step = jax.jit(lambda s, u: step(self.model, s, u))
        self._forward = jax.jit(
            lambda s, u: forward(self.model, s, u)[3])
        from .planners.derivatives import _light_info
        self._transition = jax.jit(
            lambda task, s: task.transition(self.model, s,
                                            _light_info(self.model, s)))

    # ---- state ----
    def set_state(self, qpos=None, qvel=None, time=None):
        """SetState + Task::Transition (the reference runs the task
        transition on every state publish: agent_service.cc:158-173,
        app.cc:280)."""
        s = self.state
        if qpos is not None:
            s = s.replace(qpos=jnp.asarray(qpos, dtype=s.qpos.dtype))
        if qvel is not None:
            s = s.replace(qvel=jnp.asarray(qvel, dtype=s.qvel.dtype))
        if time is not None:
            s = s.replace(time=jnp.asarray(time, dtype=s.qpos.dtype))
        self.state = s
        if self.task.transition_fn is not None:
            self.task = self._transition(self.task, self.state)

    def get_state(self):
        return dict(qpos=np.asarray(self.state.qpos),
                    qvel=np.asarray(self.state.qvel),
                    time=float(self.state.time))

    def reset(self):
        self.state = make_state(self.model)
        if self.planner == "ilqg":
            self.pstate = ilqg_init(self.plan_model, self.cfg, self.state)
        else:
            self.pstate = init_policy(self.model, self.cfg.nknots)
            if self.planner == "cem":
                self.cem_state = cem.cem_init(self.model, self.cfg)

    # ---- planning ----
    def planner_step(self):
        """One planner iteration against the current state
        (Agent::PlanIteration, agent.cc:270-315)."""
        self.rng, key = jax.random.split(self.rng)
        if self.planner == "ilqg":
            self.pstate, info = self._plan(self.task, self.pstate,
                                           self.state)
        elif self.planner == "cem":
            self.pstate, self.cem_state, info = self._plan(
                self.task, self.pstate, self.cem_state, self.state, key)
        else:
            self.pstate, info = self._plan(self.task, self.pstate,
                                           self.state, key)
        self._last_info = info
        return float(info.best_return)

    def get_action(self, time=None, averaging_duration: float = 0.0,
                   nominal_action: bool = False):
        """Query the policy (GetAction; averaging per
        grpc_agent_util.cc:166-197: mean action over a short rollout;
        `nominal_action=True` skips the feedback term like the proto's
        nominal_action flag — for iLQG that zeroes the K·dx correction,
        grpc_agent_util.cc GetAction nominal path)."""
        t = self.state.time if time is None else jnp.asarray(
            time, dtype=self.state.qpos.dtype)
        if averaging_duration > 0:
            n = max(1, int(round(float(averaging_duration)
                                 / float(self.model.dt))))
            s = self.state
            acts = []
            for _ in range(n):
                u = self._policy_action(s, t, nominal_action)
                acts.append(u)
                s, _ = self._step(s, u)
                t = s.time
            return np.mean(np.stack(acts), axis=0)
        return np.asarray(self._policy_action(self.state, t,
                                              nominal_action))

    def _policy_action(self, s: State, t, nominal: bool = False):
        if self.planner == "ilqg":
            pol = self.pstate.policy
            if nominal:
                pol = pol.replace(
                    k_scale=jnp.zeros_like(pol.k_scale))
            return self._action(pol, s.qpos, s.qvel, t)
        return self._action(self.pstate, t)

    def step(self):
        """ActionFromPolicy + advance the server-side sim (Step RPC,
        agent_service.cc:225-245); runs the task transition like the
        physics loop (app.cc:280)."""
        u = self._policy_action(self.state, self.state.time)
        self.state, info = self._step(self.state, u)
        if self.task.transition_fn is not None:
            self.task = self._transition(self.task, self.state)
        return np.asarray(u)

    # ---- task configuration ----
    def set_task_parameter(self, name: str, value: float):
        """SetTaskParameters RPC analog — free: the Task is a traced jit
        argument, so no retrace, and sim/planner state is untouched."""
        self.task = self.task.set_param(name, value)

    def set_cost_weights(self, weights: Dict[str, float]):
        """SetCostWeights RPC analog — free (see set_task_parameter)."""
        for k, v in weights.items():
            self.task = self.task.set_weight(k, v)

    def get_cost_weights(self):
        return {t.name: float(self.task.weights[i])
                for i, t in enumerate(self.task.terms)}

    def set_mode(self, mode):
        """SetMode verb (grpc/agent.proto GetMode/SetMode)."""
        self.task = self.task.set_mode(mode)

    def get_mode(self) -> str:
        return self.task.mode_names[int(self.task.mode)]

    def set_mocap(self, name: str, pos=None, quat=None):
        """set_mocap verb (python/mujoco_mpc/agent.py:360-378): move a
        named goal body. Free — mocap poses are traced task leaves."""
        self.task = self.task.set_mocap(name, pos=pos, quat=quat)

    def get_mocap(self):
        return {n: dict(pos=np.asarray(self.task.mocap_pos[i]),
                        quat=np.asarray(self.task.mocap_quat[i]))
                for i, n in enumerate(self.task.mocap_names)}

    def set_anything(self, model: Optional[Dict] = None,
                     state: Optional[Dict] = None,
                     task: Optional[Dict] = None):
        """SetAnything verb (grpc/agent.proto:59): set arbitrary model /
        state / task fields by name.

        Task and state edits are free (traced leaves). Model edits
        (gravity, dt, body_mass, ...) rebuild the jitted closures — one
        recompile, matching the reference's full re-Init on model
        changes — while preserving sim state, planner state and RNG.
        """
        if task:
            for k, v in task.items():
                if k in self.task.param_names:
                    self.set_task_parameter(k, v)
                elif k in [t.name for t in self.task.terms]:
                    self.set_cost_weights({k: v})
                elif k == "mode":
                    self.set_mode(v)
                elif k == "risk":
                    import dataclasses as _dc
                    self.task = _dc.replace(self.task, risk=jnp.asarray(
                        v, dtype=self.task.risk.dtype))
                else:
                    raise KeyError(f"unknown task field {k!r}")
        if state:
            self.set_state(**state)
        if model:
            updates = {}
            for k, v in model.items():
                ref = getattr(self.model, k)   # KeyError -> AttributeError
                updates[k] = jnp.asarray(
                    v, dtype=ref.dtype).reshape(jnp.shape(ref))
            self.model = self.model.replace(**updates)
            self.plan_model = make_plan_model(self.model, self.plan_dt)
            self._build_jit()   # closures bake the model: must rebuild

    # ---- introspection ----
    def get_residuals(self):
        info = self._forward_info()
        u = self._policy_action(self.state, self.state.time)
        r = self.task.residual(self.model, self.state, info, u)
        return np.asarray(r)

    def get_cost_term_values(self):
        r = jnp.asarray(self.get_residuals())
        terms = cost_terms(self.task, r)
        return {t.name: float(terms[i])
                for i, t in enumerate(self.task.terms)}

    def best_trajectory(self):
        if self.planner == "ilqg":
            p = self.pstate.policy
            return dict(times=np.asarray(p.times),
                        qpos=np.asarray(p.qpos_nom),
                        qvel=np.asarray(p.qvel_nom),
                        actions=np.asarray(p.u_nom))
        return dict(times=np.asarray(self.pstate.times),
                    knots=np.asarray(self.pstate.values))

    def _forward_info(self):
        u = jnp.zeros(self.model.nu, dtype=self.state.qpos.dtype)
        return self._forward(self.state, u)
