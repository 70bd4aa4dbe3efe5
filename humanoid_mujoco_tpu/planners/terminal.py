"""Infinite-horizon LQR terminal value for short-horizon MPC.

The reference runs iLQG with a 0.35 s horizon and NO terminal cost
(task.xml:11) and compensates with a fast asynchronous replan loop. A
TPU-native improvement: solve the discrete algebraic Riccati equation at
the task's equilibrium once (fixed-point iteration of the same Riccati
step the backward pass uses) and use the resulting quadratic value
0.5 (x_T ⊖ x_eq)^T P (x_T ⊖ x_eq) as the terminal cost in both the
rollout returns and the backward-pass initialization — giving the
horizon-limited planner the stationary long-term cost-to-go.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import linalg
from ..physics.model import Model, State
from ..physics.step import step
from ..physics.tangent import state_diff
from ..tasks.base import Task
from .derivatives import (gauss_newton_cost, residual_tangent,
                          step_tangent_jacobians)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TerminalCost:
    P: jax.Array        # (2nv, 2nv) value Hessian at the equilibrium
    qpos_eq: jax.Array  # (nq,)
    qvel_eq: jax.Array  # (nv,)
    weight: jax.Array   # () scaling (1 = exact DARE value)


def lqr_terminal(m: Model, task: Task, qpos_eq: jax.Array,
                 u_eq: jax.Array | None = None, iters: int = 200,
                 reg: float = 1e-6, weight: float = 1.0,
                 solver_iters: int = 6) -> TerminalCost:
    """Solve the DARE around (qpos_eq, 0) under the task's Gauss-Newton
    cost expansion; returns the stationary P."""
    dtype = qpos_eq.dtype
    nv = m.nv
    qvel_eq = jnp.zeros(nv, dtype=dtype)
    u = jnp.zeros(m.nu, dtype=dtype) if u_eq is None else u_eq
    t0 = jnp.asarray(0.0, dtype=dtype)

    s_next, _ = step(m, State(qpos_eq, qvel_eq, t0), u,
                     solver_iters=solver_iters)
    A, B = step_tangent_jacobians(m, qpos_eq, qvel_eq, u, t0,
                                  s_next.qpos, s_next.qvel,
                                  solver_iters=solver_iters)
    r, C, D = residual_tangent(m, task, qpos_eq, qvel_eq, u, t0)
    _, _, cxx, cxu, cuu = gauss_newton_cost(task, r, C, D)
    nx = 2 * nv
    nu_ = m.nu
    eye_u = jnp.eye(nu_, dtype=dtype)

    def dare_step(P, _):
        PA = P @ A
        PB = P @ B
        Quu = cuu + B.T @ PB + reg * eye_u
        Qux = cxu.T + B.T @ PA
        L = linalg.chol_factor(Quu)
        K = linalg.chol_solve(L, Qux)
        P_new = cxx + A.T @ PA - Qux.T @ K
        P_new = 0.5 * (P_new + P_new.T)
        return P_new, None

    with linalg.native_scope():
        P, _ = jax.lax.scan(dare_step, cxx, None, length=iters)
    return TerminalCost(P=P, qpos_eq=qpos_eq, qvel_eq=qvel_eq,
                        weight=jnp.asarray(weight, dtype=dtype))


def terminal_value(m: Model, term: TerminalCost, qpos: jax.Array,
                   qvel: jax.Array) -> jax.Array:
    dx = state_diff(m, qpos, qvel, term.qpos_eq, term.qvel_eq)
    return 0.5 * term.weight * dx @ (term.P @ dx)


def terminal_gradient(m: Model, term: TerminalCost, qpos: jax.Array,
                      qvel: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(Vx, Vxx) at the trajectory's final state."""
    dx = state_diff(m, qpos, qvel, term.qpos_eq, term.qvel_eq)
    return term.weight * (term.P @ dx), term.weight * term.P
