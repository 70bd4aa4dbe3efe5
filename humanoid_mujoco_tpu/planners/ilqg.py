"""iLQG planner — the planner the reference's stand task selects
(agent_planner=2, tasks/humanoid_cap/stand/task.xml:9).

Rebuild of mjpc/planners/ilqg/{planner,backward_pass,policy}.cc with the
TPU-native substitutions:

  * FD linearization (mjd_transitionFD on a thread pool) -> jax.jacfwd
    tangent Jacobians, vmapped over the horizon (derivatives.py)
  * sequential Riccati recursion -> lax.scan with per-step unrolled
    Cholesky (nu = 12 -> tiny straight-line solves on the VPU)
  * parallel line-search rollouts -> vmap over log-spaced step sizes
    (ilqg/planner.cc:618-680)
  * regularization ladder driven by actual/expected improvement
    ("surprise", planner.cc:551-604) as branchless where-updates carried
    in the planner state

The product is a FEEDBACK policy u(t, x) = u_nom(t) + K(t)(x ⊖ x_nom(t))
(ilqg/policy.cc:82-161, with the quaternion-aware StateDiff) — this is
what lets iLQG hold the humanoid's balance where zero-order sampling
cannot (small corrective torques are in the policy, not found by chance).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import boxqp, linalg
from ..physics.model import Model, State
from ..physics.step import step
from ..physics.tangent import state_diff
from ..rollout import MAX_RETURN
from ..tasks.base import Task, cost_value
from .derivatives import trajectory_derivatives, residual_tangent, _light_info


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ILQGConfig:
    horizon: int = dataclasses.field(default=17, metadata=dict(static=True))
    n_linesearch: int = dataclasses.field(default=8,
                                          metadata=dict(static=True))
    # contact Newton iterations in plan rollouts. MUST match the sim
    # path's solver_iters (physics/step.py default 8): planning on a
    # 4-iteration contact solve against an 8-iteration sim gives
    # systematically different contact forces, and that model error —
    # not any planner defect — was what destabilized the closed-loop
    # stand in round 1 (wobble -> saturation -> hopping after ~1.5 s;
    # solver-matched the stand holds indefinitely, cost/step ~1e-5).
    solver_iters: int = dataclasses.field(default=8,
                                          metadata=dict(static=True))
    deriv_solver_iters: int = dataclasses.field(default=8,
                                               metadata=dict(static=True))
    # implicit-function derivatives through the contact solve (exact
    # sensitivity at the converged active set; see solver.newton_solve)
    ift: bool = dataclasses.field(default=True, metadata=dict(static=True))
    skip: int = dataclasses.field(default=0, metadata=dict(static=True))
    # control-limit boxQP in the backward pass (settings.h action_limits,
    # default ON like the reference) + regularization scheme selector
    limits: bool = dataclasses.field(default=True,
                                     metadata=dict(static=True))
    reg_type: int = dataclasses.field(default=0, metadata=dict(static=True))
    boxqp_iters: int = dataclasses.field(default=8,
                                         metadata=dict(static=True))
    reg_initial: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-2))
    reg_min: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-6))
    reg_max: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e4))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ILQGPolicy:
    """Feedback policy along a nominal trajectory."""

    times: jax.Array      # (T+1,)
    qpos_nom: jax.Array   # (T+1, nq)
    qvel_nom: jax.Array   # (T+1, nv)
    u_nom: jax.Array      # (T, nu)
    K: jax.Array          # (T, nu, 2nv) feedback gains
    k_scale: jax.Array    # () feedback scaling chosen by the nominal
                          # line search (iLQGPolicy feedback_scaling)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ILQGState:
    """Planner state carried across plan iterations."""

    policy: ILQGPolicy
    reg: jax.Array        # () current regularization


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ILQGInfo:
    best_return: jax.Array
    nominal_return: jax.Array
    improvement: jax.Array
    expected: jax.Array
    reg: jax.Array
    alpha: jax.Array


def ilqg_init(m: Model, cfg: ILQGConfig, state: State) -> ILQGState:
    """Zero policy with zero gains anchored at `state`."""
    dtype = state.qpos.dtype
    T = cfg.horizon
    times = state.time + m.dt * jnp.arange(T + 1, dtype=dtype)
    return ILQGState(
        policy=ILQGPolicy(
            times=times,
            qpos_nom=jnp.tile(state.qpos, (T + 1, 1)),
            qvel_nom=jnp.tile(state.qvel, (T + 1, 1)),
            u_nom=jnp.zeros((T, m.nu), dtype=dtype),
            K=jnp.zeros((T, m.nu, 2 * m.nv), dtype=dtype),
            k_scale=jnp.asarray(1.0, dtype=dtype)),
        reg=jnp.asarray(cfg.reg_initial, dtype=dtype))


def ilqg_action(m: Model, policy: ILQGPolicy, qpos: jax.Array,
                qvel: jax.Array, t: jax.Array) -> jax.Array:
    """u = interp(u_nom)(t) + K(t) (x ⊖ interp(x_nom)(t)), clamped.

    u_nom, x_nom and K are LINEARLY interpolated in time like the
    reference (iLQGPolicy::Action, ilqg/policy.cc:82-161) — with a
    zero-order hold the feedback would fight the nominal's own motion
    between knots (the state advances while x_nom stays frozen),
    injecting a periodic disturbance at the replan rate.
    """
    from .tangent_interp import interp_nominal_state
    T = policy.u_nom.shape[0]
    idx = jnp.clip(
        jnp.searchsorted(policy.times, t, side="right") - 1, 0, T - 1)
    nxt = jnp.minimum(idx + 1, T)
    t_lo = policy.times[idx]
    t_hi = policy.times[nxt]
    frac = jnp.clip((t - t_lo) / jnp.maximum(t_hi - t_lo, 1e-9), 0.0, 1.0)

    # u_nom / K: linear interp (K clamps at the last gain)
    u_hi = policy.u_nom[jnp.minimum(idx + 1, T - 1)]
    u_t = policy.u_nom[idx] * (1 - frac) + u_hi * frac
    K_hi = policy.K[jnp.minimum(idx + 1, T - 1)]
    K_t = policy.K[idx] * (1 - frac) + K_hi * frac

    # x_nom: tangent-space interpolation between knot states
    qpos_t, qvel_t = interp_nominal_state(
        m, policy.qpos_nom[idx], policy.qvel_nom[idx],
        policy.qpos_nom[nxt], policy.qvel_nom[nxt], frac)

    dx = state_diff(m, qpos, qvel, qpos_t, qvel_t)
    u = u_t + policy.k_scale * (K_t @ dx)
    return jnp.clip(u, m.act_ctrlrange[:, 0], m.act_ctrlrange[:, 1])


def _feedback_rollout(m: Model, task: Task, s0: State, policy: ILQGPolicy,
                      du: jax.Array, alpha: jax.Array, solver_iters: int,
                      k_scale: jax.Array | float = 1.0,
                      terminal=None
                      ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Roll u_t = clamp(u_nom_t + alpha*du_t + k_scale*K_t (x ⊖ x_nom_t)).

    Returns (total_return, qpos (T+1,nq), qvel (T+1,nv), u (T,nu)).
    (ActionRollouts, ilqg/planner.cc:618-680.)
    """
    T = policy.u_nom.shape[0]
    lo, hi = m.act_ctrlrange[:, 0], m.act_ctrlrange[:, 1]

    def body(s, i):
        # look the policy up BY TIME, not raw index: after a plan->act
        # cycle the fresh state's clock has advanced, and indexing the
        # carried policy positionally would replay it one cycle stale
        # (MJPC policies are time-indexed for the same reason,
        # ilqg/policy.cc:82-161). du is aligned with the NEW timeline and
        # stays index-addressed. The half-step offset makes the lookup
        # robust to f32 ulp drift between the ACCUMULATED rollout clock
        # (t += dt per step) and the MULTIPLIED knot times (t0 + dt*i):
        # one ulp below a knot would otherwise replay the PREVIOUS knot's
        # control for a whole step.
        j = jnp.clip(jnp.searchsorted(policy.times, s.time + 0.5 * m.dt,
                                      side="right") - 1, 0, T - 1)
        dx = state_diff(m, s.qpos, s.qvel, policy.qpos_nom[j],
                        policy.qvel_nom[j])
        u = policy.u_nom[j] + alpha * du[i] + k_scale * (policy.K[j] @ dx)
        u = jnp.clip(u, lo, hi)
        s2, info = step(m, s, u, solver_iters=solver_iters)
        res = task.residual(m, s, _light_info(m, s), u)
        return s2, (s.qpos, s.qvel, u, cost_value(task, res), info.diverged)

    s_end, (qp, qv, u, costs, div) = jax.lax.scan(
        body, s0, jnp.arange(T))
    total = jnp.sum(costs)
    if terminal is not None:
        from .terminal import terminal_value
        total = total + terminal_value(m, terminal, s_end.qpos, s_end.qvel)
    total = total / jnp.maximum(T, 1)
    bad = jnp.logical_or(jnp.any(div), ~jnp.isfinite(total))
    total = jnp.where(bad, MAX_RETURN, total)
    qp = jnp.concatenate([qp, s_end.qpos[None]], axis=0)
    qv = jnp.concatenate([qv, s_end.qvel[None]], axis=0)
    return total, qp, qv, u


# regularization schemes (ilqg/backward_pass.h:28-32, settings.h:27)
REG_CONTROL = 0        # Quu += reg*I
REG_STATE_CONTROL = 1  # Quu += reg*B'B, Qux += reg*B'A ("feedback")
REG_VALUE = 2          # Vxx += reg*I inside the Q-expansion
REG_NONE = 3


def backward_pass(derivs, reg: jax.Array, u_nom: jax.Array | None = None,
                  ctrlrange: jax.Array | None = None,
                  reg_type: int = REG_CONTROL, boxqp_iters: int = 8,
                  terminal_init=None
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Riccati recursion as lax.scan (backward_pass.cc:65-250).

    When `u_nom` + `ctrlrange` are given, each step solves the
    control-limit boxQP (mju_boxQP via backward_pass.cc:158-196):
    du honors the per-step box [lo - u_nom_t, hi - u_nom_t] and feedback
    rows of SATURATED actuators are zeroed — gains computed ignoring the
    limits are wrong exactly where the stand saturates. The previous
    step's du warm-starts the active set (the reference warm-starts
    boxqp.res across calls).

    `reg_type` selects the regularization scheme (static; default
    control). Returns (du (T,nu), K (T,nu,2nv), dV (2,)).
    """
    T, nx = derivs.cx.shape
    nu_ = derivs.cu.shape[1]
    dtype = derivs.cx.dtype
    limits = u_nom is not None and ctrlrange is not None
    if limits:
        lo_t = ctrlrange[None, :, 0] - u_nom     # (T, nu)
        hi_t = ctrlrange[None, :, 1] - u_nom
    else:
        lo_t = hi_t = jnp.zeros((T, nu_), dtype=dtype)

    def rstep(carry, inp):
        Vx, Vxx, dV, du_prev = carry
        A, B, cx, cu, cxx, cxu, cuu, lo, hi = inp
        Qx = cx + A.T @ Vx
        Qu = cu + B.T @ Vx
        VxxA = Vxx @ A
        Qxx = cxx + A.T @ VxxA
        Qux = cxu.T + B.T @ VxxA
        Quu = cuu + B.T @ (Vxx @ B)

        if reg_type == REG_VALUE:
            Vxx_reg = Vxx + reg * jnp.eye(nx, dtype=dtype)
            Qux_reg = cxu.T + B.T @ (Vxx_reg @ A)
            Quu_reg = cuu + B.T @ (Vxx_reg @ B)
        elif reg_type == REG_STATE_CONTROL:
            Qux_reg = Qux + reg * (B.T @ A)
            Quu_reg = Quu + reg * (B.T @ B)
        elif reg_type == REG_NONE:
            Qux_reg, Quu_reg = Qux, Quu
        else:  # REG_CONTROL
            Qux_reg = Qux
            Quu_reg = Quu + reg * jnp.eye(nu_, dtype=dtype)

        if limits:
            res = boxqp.box_qp(Quu_reg, Qu, lo, hi,
                               x0=jnp.clip(du_prev, lo, hi),
                               iters=boxqp_iters)
            du = res.x
            K = -boxqp.free_solve(res, Qux_reg)
        else:
            L = linalg.chol_factor(Quu_reg)
            du = -linalg.chol_solve(L, Qu)
            K = -linalg.chol_solve(L, Qux_reg)

        # value update uses the UNregularized Quu/Qux with the clamped
        # du and limit-aware K (backward_pass.cc:219-249)
        Vx_n = Qx + K.T @ (Quu @ du + Qu) + Qux.T @ du
        Vxx_n = Qxx + K.T @ (Quu @ K + Qux) + Qux.T @ K
        Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
        dV_n = dV + jnp.stack([Qu @ du, 0.5 * du @ (Quu @ du)])
        return (Vx_n, Vxx_n, dV_n, du), (du, K)

    if terminal_init is not None:
        Vx0, Vxx0 = terminal_init
        init = (Vx0.astype(dtype), Vxx0.astype(dtype),
                jnp.zeros(2, dtype=dtype), jnp.zeros(nu_, dtype=dtype))
    else:
        init = (jnp.zeros(nx, dtype=dtype),
                jnp.zeros((nx, nx), dtype=dtype),
                jnp.zeros(2, dtype=dtype), jnp.zeros(nu_, dtype=dtype))
    inputs = (derivs.A, derivs.B, derivs.cx, derivs.cu, derivs.cxx,
              derivs.cxu, derivs.cuu, lo_t, hi_t)
    (_, _, dV, _), (du, K) = jax.lax.scan(rstep, init, inputs,
                                          reverse=True)
    return du, K, dV


def ilqg_plan(m: Model, task: Task, cfg: ILQGConfig, pstate: ILQGState,
              state: State, rng: jax.Array | None = None,
              terminal=None) -> Tuple[ILQGState, ILQGInfo]:
    """One OptimizePolicy iteration (ilqg/planner.cc:156-164, 377-615).

    `terminal` (planners.terminal.TerminalCost, optional) adds an
    infinite-horizon LQR cost-to-go at the horizon tail — both in the
    rollout returns and as the backward-pass initialization."""
    dtype = state.qpos.dtype
    T = cfg.horizon
    old = pstate.policy

    # 1. nominal trajectory: re-roll the current policy from the fresh
    #    state over a FEEDBACK-SCALING line search — scale 0 (open loop)
    #    up to 1 (full gains); best return wins. This is what keeps a
    #    stiff K from poisoning the nominal when the state has moved
    #    since the gains were computed (NominalTrajectory +
    #    FeedbackRollouts, ilqg/planner.cc:167-219, 683-712).
    zero_du = jnp.zeros((T, m.nu), dtype=dtype)
    k_scales = jnp.asarray([0.0, 0.1, 0.37, 1.0], dtype=dtype)

    def nom_roll(ks):
        return _feedback_rollout(m, task, state, old, zero_du,
                                 jnp.asarray(0.0, dtype=dtype),
                                 cfg.solver_iters, k_scale=ks,
                                 terminal=terminal)

    nrets, nqp, nqv, nu_ = jax.vmap(nom_roll)(k_scales)
    nbest = jnp.argmin(nrets)
    nom_return, qp, qv, u = (nrets[nbest], nqp[nbest], nqv[nbest],
                             nu_[nbest])
    times = state.time + m.dt * jnp.arange(T + 1, dtype=dtype)
    nominal = ILQGPolicy(times=times, qpos_nom=qp, qvel_nom=qv, u_nom=u,
                         K=old.K, k_scale=k_scales[nbest])

    # 2. linearize dynamics + cost along the nominal
    derivs = trajectory_derivatives(
        m, task, qp, qv, u, times, solver_iters=cfg.deriv_solver_iters,
        skip=cfg.skip, ift=cfg.ift)

    # 3. Riccati backward pass (terminal V from the DARE if provided)
    if terminal is not None:
        from .terminal import terminal_gradient
        tinit = terminal_gradient(m, terminal, qp[-1], qv[-1])
    else:
        tinit = None
    du, K, dV = backward_pass(
        derivs, pstate.reg,
        u_nom=u if cfg.limits else None,
        ctrlrange=m.act_ctrlrange if cfg.limits else None,
        reg_type=cfg.reg_type, boxqp_iters=cfg.boxqp_iters,
        terminal_init=tinit)
    nominal = nominal.replace(K=K)

    # 4. parallel line search over log-spaced alphas (planner.cc:618-680)
    alphas = jnp.logspace(0.0, -3.0, cfg.n_linesearch).astype(dtype)

    def ls(alpha):
        r, qpa, qva, ua = _feedback_rollout(
            m, task, state, nominal, du, alpha, cfg.solver_iters,
            terminal=terminal)
        return r, qpa, qva, ua

    returns, qps, qvs, us = jax.vmap(ls)(alphas)
    best = jnp.argmin(returns)
    best_return = returns[best]
    alpha = alphas[best]

    # 5. acceptance + regularization, matching the reference exactly
    # (ilqg/planner.cc:551-604 + backward_pass.cc UpdateRegularization):
    # the winning line-search rollout ALWAYS becomes the new nominal —
    # there is no improvement gate (the smallest step is 1e-3, so the
    # winner can stay arbitrarily close to the nominal); rejecting
    # near-converged iterations and escalating reg starves the gains.
    # Only non-finite gains / all-diverged rollouts keep the old policy.
    finite = jnp.logical_and(jnp.all(jnp.isfinite(du)),
                             jnp.all(jnp.isfinite(K)))
    rolled_ok = best_return < MAX_RETURN
    accept = jnp.logical_and(finite, rolled_ok)
    K_new = jnp.where(finite, K, old.K)

    # rollout returns are horizon-NORMALIZED (sum/T) while dV is summed
    # over the horizon — expected must be divided by T or the surprise
    # ratio z comes out ~T x too small and reg ratchets up spuriously
    expected = (-(alpha * dV[0] + alpha ** 2 * dV[1])) / T + 1e-16
    improvement = nom_return - best_return
    # surprise z = clamp(improvement/expected, 0, 2); reg /2 on good
    # agreement or a large accepted step, *2 on poor agreement or a tiny
    # step, *4 on failure — never the x10 of round 1.
    z = jnp.clip(improvement / expected, 0.0, 2.0)
    good = jnp.logical_or(z > 0.5, alpha > 0.3)
    bad_step = jnp.logical_or(z < 0.1, alpha < 0.06)
    # converged decay: when the predicted improvement is negligible
    # relative to the return, the z<0.1 branch would ratchet reg to
    # reg_max and REGULARIZE THE GAINS AWAY (K -> 0 under control reg)
    # exactly when the policy is good — the closed loop then loses its
    # feedback until the state degrades. A converged quadratic model is
    # trustworthy: decay reg so K approaches the unregularized LQR gain.
    converged = expected < 1e-4 * (1.0 + jnp.abs(nom_return))
    factor = jnp.where(~accept, 4.0,
                       jnp.where(converged, 0.5,
                                 jnp.where(good, 0.5,
                                           jnp.where(bad_step, 2.0, 1.0))))
    reg = jnp.clip(pstate.reg * factor, cfg.reg_min,
                   cfg.reg_max).astype(dtype)

    new_policy = ILQGPolicy(
        times=times,
        qpos_nom=jnp.where(accept, qps[best], qp),
        qvel_nom=jnp.where(accept, qvs[best], qv),
        u_nom=jnp.where(accept, us[best], u),
        K=K_new,
        # the accepted policy carries full-scale feedback
        # (policy.feedback_scaling = 1.0, planner.cc:604)
        k_scale=jnp.where(accept, jnp.asarray(1.0, dtype=dtype),
                          nominal.k_scale))

    info = ILQGInfo(best_return=jnp.where(accept, best_return, nom_return),
                    nominal_return=nom_return,
                    improvement=improvement,
                    expected=expected, reg=reg, alpha=alpha)
    return ILQGState(policy=new_policy, reg=reg), info
