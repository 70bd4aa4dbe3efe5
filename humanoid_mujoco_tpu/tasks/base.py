"""Residual-based cost model — the Task/ResidualFn analog.

Re-derivation of the reference's cost pipeline (mjpc/task.cc:70-108):
    residual r(state) -> per-term cost_k = weight_k * norm_k(r_slice_k; p)
    -> total = sum_k cost_k -> optional exponential risk transform
        (exp(risk * total) - 1) / risk                 (task.cc:104-108)

The reference configures terms through XML <sensor><user> attributes
(task.cc:210-233); here a Task is a pytree: term STRUCTURE (names, dims,
norm types) is static aux data so the norm dispatch unrolls at trace
time, while weights / norm parameters / task parameters are leaves —
runtime-adjustable exactly like the gRPC SetCostWeights / SetTaskParameters
API (grpc/agent.proto:34-36) without recompilation.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..ops import norms
from ..physics.model import Model, State
from ..physics.step import StepInfo

# residual signature: (model, task, state, info, ctrl) -> (nres,)
ResidualFn = Callable[[Model, "Task", State, StepInfo, jax.Array], jax.Array]

_RISK_TOL = 1e-6


@dataclasses.dataclass(frozen=True)
class TermSpec:
    """Static description of one cost term (name, residual dim, norm)."""

    name: str
    dim: int
    norm: int          # norms.NormType value
    num_params: int = 0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Task:
    name: str = dataclasses.field(metadata=dict(static=True))
    terms: Tuple[TermSpec, ...] = dataclasses.field(
        metadata=dict(static=True))
    residual_fn: ResidualFn = dataclasses.field(metadata=dict(static=True))
    param_names: Tuple[str, ...] = dataclasses.field(
        metadata=dict(static=True))

    weights: jax.Array       # (nterm,)
    norm_params: jax.Array   # (nterm, 2) (p, q) per term; unused -> 0
    params: jax.Array        # (nparam,) task parameters (e.g. height goal)
    risk: jax.Array          # ()

    # multi-mode / transition support (Task::Transition + mode,
    # mjpc/task.h:85,137): transition_fn(task, m, state, info) -> Task
    # runs each control step and may move goals / switch `mode`;
    # mode_names mirror the reference's GetMode/SetMode verb surface.
    transition_fn: object = dataclasses.field(
        default=None, metadata=dict(static=True))
    mode_names: Tuple[str, ...] = dataclasses.field(
        default=("default",), metadata=dict(static=True))
    mode: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0, jnp.int32))

    # mocap bodies (the reference's d->mocap_pos/quat goal bodies +
    # the set_mocap verb, python/mujoco_mpc/agent.py:360-378): named
    # goal poses that residual/transition fns read. Pytree leaves, so
    # updating them is retrace-free like weights/params.
    mocap_names: Tuple[str, ...] = dataclasses.field(
        default=(), metadata=dict(static=True))
    mocap_pos: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 3)))
    mocap_quat: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((0, 4)))

    @property
    def nres(self) -> int:
        return sum(t.dim for t in self.terms)

    @property
    def nterm(self) -> int:
        return len(self.terms)

    def residual(self, m: Model, state: State, info: StepInfo,
                 ctrl: jax.Array) -> jax.Array:
        return self.residual_fn(m, self, state, info, ctrl)

    def set_weight(self, name: str, value) -> "Task":
        i = [t.name for t in self.terms].index(name)
        return dataclasses.replace(
            self, weights=self.weights.at[i].set(value))

    def set_param(self, name: str, value) -> "Task":
        i = self.param_names.index(name)
        return dataclasses.replace(
            self, params=self.params.at[i].set(value))

    def set_mocap(self, name: str, pos=None, quat=None) -> "Task":
        """SetMocap verb (python/mujoco_mpc/agent.py set_mocap)."""
        i = self.mocap_names.index(name)
        t = self
        if pos is not None:
            p = jnp.asarray(pos, dtype=t.mocap_pos.dtype)
            t = dataclasses.replace(t, mocap_pos=t.mocap_pos.at[i].set(p))
        if quat is not None:
            q = jnp.asarray(quat, dtype=t.mocap_quat.dtype)
            t = dataclasses.replace(
                t, mocap_quat=t.mocap_quat.at[i].set(q))
        return t

    def set_mode(self, mode) -> "Task":
        """SetMode verb (grpc/agent.proto): mode by index or name."""
        if isinstance(mode, str):
            mode = self.mode_names.index(mode)
        return dataclasses.replace(
            self, mode=jnp.asarray(mode, jnp.int32))

    def transition(self, m: Model, state: State,
                   info: StepInfo) -> "Task":
        """Per-step task transition (Task::Transition, mjpc/task.h:85):
        returns the task with updated goal params / mode leaves. Pure and
        jittable — safe to call inside rollouts."""
        if self.transition_fn is None:
            return self
        return self.transition_fn(self, m, state, info)


def make_task(name: str, terms, residual_fn, weights, norm_params=None,
              params=(), param_names=(), risk=0.0, transition_fn=None,
              mode_names=("default",), mocap=None,
              dtype=jnp.float32) -> Task:
    nterm = len(terms)
    npz = jnp.zeros((nterm, 2), dtype=dtype)
    if norm_params is not None:
        npz = jnp.asarray(norm_params, dtype=dtype).reshape(nterm, 2)
    # mocap: {name: (pos3,) or (pos3, quat4)} goal bodies
    mocap = mocap or {}
    mnames = tuple(mocap.keys())
    mpos = jnp.zeros((len(mnames), 3), dtype=dtype)
    mquat = jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype=dtype),
                     (len(mnames), 1))
    for i, k in enumerate(mnames):
        v = mocap[k]
        pos = v[0] if isinstance(v, tuple) and len(v) == 2 else v
        mpos = mpos.at[i].set(jnp.asarray(pos, dtype=dtype))
        if isinstance(v, tuple) and len(v) == 2:
            mquat = mquat.at[i].set(jnp.asarray(v[1], dtype=dtype))
    return Task(
        name=name, terms=tuple(terms), residual_fn=residual_fn,
        param_names=tuple(param_names),
        weights=jnp.asarray(weights, dtype=dtype),
        norm_params=npz,
        params=jnp.asarray(list(params), dtype=dtype).reshape(-1),
        risk=jnp.asarray(risk, dtype=dtype),
        transition_fn=transition_fn, mode_names=tuple(mode_names),
        mocap_names=mnames, mocap_pos=mpos, mocap_quat=mquat)


def cost_terms(task: Task, residual: jax.Array,
               weighted: bool = True) -> jax.Array:
    """Per-term costs (..., nterm) from residual (..., nres).

    (BaseResidualFn::CostTerms, task.cc:71-88.)
    """
    outs = []
    off = 0
    for k, t in enumerate(task.terms):
        r = residual[..., off:off + t.dim]
        off += t.dim
        c = norms.norm_value(r, t.norm, task.norm_params[k, 0],
                             task.norm_params[k, 1])
        outs.append(task.weights[k] * c if weighted else c)
    return jnp.stack(outs, axis=-1)


def cost_value(task: Task, residual: jax.Array) -> jax.Array:
    """Total (risk-transformed) cost from residual (..., nres) -> (...).

    (BaseResidualFn::CostValue, task.cc:91-108.)
    """
    total = jnp.sum(cost_terms(task, residual), axis=-1)
    risk = task.risk
    transformed = (jnp.exp(risk * total) - 1.0) / jnp.where(
        jnp.abs(risk) < _RISK_TOL, 1.0, risk)
    return jnp.where(jnp.abs(risk) < _RISK_TOL, total, transformed)


def trajectory_cost(task: Task, residuals: jax.Array,
                    diverged: jax.Array | None = None,
                    max_return: float = 1e6) -> jax.Array:
    """Sum of per-step costs over the horizon with the divergence guard:
    a rollout that diverged anywhere returns `max_return`
    (kMaxReturnValue, mjpc/trajectory.cc:29,170)."""
    costs = cost_value(task, residuals)          # (..., T)
    total = jnp.sum(costs, axis=-1)
    total = jnp.nan_to_num(total, nan=max_return, posinf=max_return)
    if diverged is not None:
        bad = jnp.any(diverged, axis=-1)
        total = jnp.where(bad, max_return, total)
    return total
