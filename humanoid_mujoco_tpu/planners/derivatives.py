"""Model + cost linearization along a nominal trajectory.

The reference computes A, B, C, D by finite-differencing mj_step per knot
on a thread pool (mjpc/planners/model_derivatives.cc:45-164) and chains
them with analytic norm gradients/Hessians into Gauss-Newton cost
expansions (mjpc/planners/cost_derivatives.cc:77-230). Here:

  * A, B come from jax.jacfwd of the TANGENT-wrapped step function —
    analytic derivatives through the whole physics step (contact solver
    included), evaluated as 2*nv+nu forward-mode tangents that vectorize
    exactly like a batch of rollouts (no FD epsilon tuning).
  * C, D are jacfwd of the task residual in tangent coordinates.
  * the whole horizon is one vmap over knots — the thread-pool fan-out
    becomes a batch axis.

Derivative-skip (evaluate every (skip+1)th knot, lerp between,
model_derivatives.cc:53-72) is supported as a static option.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import norms
from ..physics.model import Model, State
from ..physics.step import StepInfo, forward, step
from ..physics.tangent import state_add, state_diff
from ..tasks.base import Task


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Derivatives:
    A: jax.Array    # (T, 2nv, 2nv)
    B: jax.Array    # (T, 2nv, nu)
    cx: jax.Array   # (T, 2nv)
    cu: jax.Array   # (T, nu)
    cxx: jax.Array  # (T, 2nv, 2nv)
    cxu: jax.Array  # (T, 2nv, nu)
    cuu: jax.Array  # (T, nu, nu)


def _light_info(m: Model, state: State) -> StepInfo:
    """Kinematics-only StepInfo for residual evaluation (no contact
    solve) — valid for residuals that read positions/velocities, which is
    what the reference's cost sensors use (framepos/subtree*)."""
    from ..physics.engine import (body_com_velocities, fwd_position,
                                  fwd_velocity)
    dtype = state.qpos.dtype
    kin = fwd_position(m, state.qpos)
    vel = fwd_velocity(m, kin, state.qvel)
    z = jnp.zeros((m.ncon,), dtype=dtype)
    return StepInfo(
        xpos=kin.xpos, xquat=kin.xquat, xipos=kin.xipos,
        site_xpos=kin.site_xpos, com=kin.anchor, com_vel=vel.com_vel,
        body_com_vel=body_com_velocities(kin, vel),
        contact_dist=z, contact_force=z,
        qacc=jnp.zeros((m.nv,), dtype=dtype),
        actuator_force=jnp.zeros((m.nu,), dtype=dtype),
        qfrc_total=jnp.zeros((m.nv,), dtype=dtype),
        diverged=jnp.asarray(False))


def residual_tangent(m: Model, task: Task, qpos: jax.Array, qvel: jax.Array,
                     ctrl: jax.Array, t: jax.Array
                     ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(r, C, D): residual and its Jacobians wrt (dx, du) at the nominal."""
    nv = m.nv

    def r_of(dx, du):
        st = State(qpos=state_add(m, qpos, dx[:nv]), qvel=qvel + dx[nv:],
                   time=t)
        c = ctrl + du
        return task.residual(m, st, _light_info(m, st), c)

    z = jnp.zeros(2 * nv, dtype=qpos.dtype)
    zu = jnp.zeros(m.nu, dtype=qpos.dtype)
    r = r_of(z, zu)
    C = jax.jacfwd(r_of, argnums=0)(z, zu)
    D = jax.jacfwd(r_of, argnums=1)(z, zu)
    return r, C, D


def step_tangent_jacobians(m: Model, qpos: jax.Array, qvel: jax.Array,
                           ctrl: jax.Array, t: jax.Array,
                           next_qpos: jax.Array, next_qvel: jax.Array,
                           solver_iters: int = 8, ift: bool = True
                           ) -> Tuple[jax.Array, jax.Array]:
    """A = d x'/dx, B = d x'/du in tangent coordinates, via jacfwd
    through the full step (the mjd_transitionFD replacement).

    `ift=True` (default): the contact Newton solve contributes its exact
    implicit-function sensitivity at the converged active set instead of
    backprop through a truncated iteration unroll — better-conditioned
    Quu/Qux for the backward pass and a much smaller tangent graph."""
    nv = m.nv

    from ..ops.linalg import native_scope

    def f(dxu):
        dx, du = dxu[:2 * nv], dxu[2 * nv:]
        st = State(qpos=state_add(m, qpos, dx[:nv]), qvel=qvel + dx[nv:],
                   time=t)
        s2, _ = step(m, st, ctrl + du, solver_iters=solver_iters, ift=ift)
        return state_diff(m, s2.qpos, s2.qvel, next_qpos, next_qvel)

    z = jnp.zeros(2 * nv + m.nu, dtype=qpos.dtype)
    # one combined jacfwd (single jvp graph) + native linalg ops keep the
    # XLA module small — 2 separate jacfwds with unrolled cholesky cost
    # minutes of compile time
    with native_scope():
        J = jax.jacfwd(f)(z)
    return J[:, :2 * nv], J[:, 2 * nv:]


def gauss_newton_cost(task: Task, r: jax.Array, C: jax.Array, D: jax.Array
                      ) -> Tuple[jax.Array, ...]:
    """cx, cu, cxx, cxu, cuu from residual + Jacobians via per-term norm
    gradients/Hessians (cost_derivatives.cc:77-110 chain rule)."""
    nx, nu_ = C.shape[1], D.shape[1]
    dtype = r.dtype
    cx = jnp.zeros(nx, dtype=dtype)
    cu = jnp.zeros(nu_, dtype=dtype)
    cxx = jnp.zeros((nx, nx), dtype=dtype)
    cxu = jnp.zeros((nx, nu_), dtype=dtype)
    cuu = jnp.zeros((nu_, nu_), dtype=dtype)
    off = 0
    for k, term in enumerate(task.terms):
        d = term.dim
        rs = r[off:off + d]
        Cs = C[off:off + d]
        Ds = D[off:off + d]
        off += d
        _, g, H = norms.norm_hess(rs, term.norm, task.norm_params[k, 0],
                                  task.norm_params[k, 1])
        w = task.weights[k]
        cx = cx + w * (Cs.T @ g)
        cu = cu + w * (Ds.T @ g)
        HC = H @ Cs
        HD = H @ Ds
        cxx = cxx + w * (Cs.T @ HC)
        cxu = cxu + w * (Cs.T @ HD)
        cuu = cuu + w * (Ds.T @ HD)
    return cx, cu, cxx, cxu, cuu


def trajectory_derivatives(m: Model, task: Task, qpos_nom: jax.Array,
                           qvel_nom: jax.Array, ctrl_nom: jax.Array,
                           times: jax.Array, solver_iters: int = 8,
                           skip: int = 0, ift: bool = True) -> Derivatives:
    """Batched linearization along the nominal: vmap over the horizon.

    qpos_nom: (T+1, nq), qvel_nom: (T+1, nv), ctrl_nom: (T, nu),
    times: (T+1,). With skip > 0, A/B are evaluated every (skip+1)th knot
    and linearly interpolated between (model_derivatives.cc:53-72).
    """
    T = ctrl_nom.shape[0]

    def ab(qp, qv, u, t, qp2, qv2):
        return step_tangent_jacobians(m, qp, qv, u, t, qp2, qv2,
                                      solver_iters=solver_iters, ift=ift)

    if skip <= 0:
        A, B = jax.vmap(ab)(qpos_nom[:-1], qvel_nom[:-1], ctrl_nom,
                            times[:-1], qpos_nom[1:], qvel_nom[1:])
    else:
        stride = skip + 1
        idx = jnp.arange(0, T, stride)
        Ae, Be = jax.vmap(ab)(qpos_nom[idx], qvel_nom[idx], ctrl_nom[idx],
                              times[idx], qpos_nom[idx + 1],
                              qvel_nom[idx + 1])
        # lerp to the full horizon
        tt = jnp.arange(T) / stride
        lo = jnp.clip(jnp.floor(tt).astype(jnp.int32), 0, len(idx) - 1)
        hi = jnp.clip(lo + 1, 0, len(idx) - 1)
        frac = (tt - lo)[:, None, None]
        A = Ae[lo] * (1 - frac) + Ae[hi] * frac
        B = Be[lo] * (1 - frac) + Be[hi] * frac

    def cost_derivs(qp, qv, u, t):
        r, C, D = residual_tangent(m, task, qp, qv, u, t)
        return gauss_newton_cost(task, r, C, D)

    cx, cu, cxx, cxu, cuu = jax.vmap(cost_derivs)(
        qpos_nom[:-1], qvel_nom[:-1], ctrl_nom, times[:-1])
    return Derivatives(A=A, B=B, cx=cx, cu=cu, cxx=cxx, cxu=cxu, cuu=cuu)
