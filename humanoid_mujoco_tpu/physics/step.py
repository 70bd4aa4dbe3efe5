"""Full physics step: the mj_step analog, as one pure jit-able function.

step(model, state, ctrl [, xfrc]) -> (state', StepInfo)

Pipeline (all fused by XLA, no host crossings):
  fwd_position -> fwd_velocity -> CRB mass matrix + RNEA bias
  -> actuation + passive + external wrenches -> collide -> constraint
  Newton solve -> semi-implicit Euler with IMPLICIT joint damping
  ((M + h D) dv = h * qfrc_total — the stability trick MuJoCo's Euler
  integrator uses, required here for the reference's damping=0.2 @ 2 ms
  joints, world.xml:22).

Divergence guard: the reference marks rollouts bad and assigns cost 1e6
when MuJoCo warns (mjpc/trajectory.cc:168-187); here `StepInfo.diverged`
flags non-finite or exploding states and `step` freezes the state so a
diverged rollout stays finite (the rollout engine then masks its return).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import linalg
from . import math as pm
from .collision import collide, select_contacts
from .engine import (actuation, body_com_velocities, crb_mass_matrix,
                     fwd_position, fwd_velocity, passive_force, rnea_bias,
                     thrust_qfrc, xfrc_to_qfrc)
from .model import JointType, Model, State
from .solver import newton_solve

_QVEL_LIMIT = 1e4


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepInfo:
    """Per-step observables for costs/rewards/sensors (small by design —
    this is what rollouts record, the trajectory.h states/times/residual
    analog)."""

    xpos: jax.Array          # (nbody, 3)
    xquat: jax.Array         # (nbody, 4)
    xipos: jax.Array         # (nbody, 3) body COMs
    site_xpos: jax.Array     # (nsite, 3)
    com: jax.Array           # (3,) whole-model COM
    com_vel: jax.Array       # (3,) whole-model COM velocity
    body_com_vel: jax.Array  # (nbody, 3) per-body COM linear velocity
    #   (framelinvel/subtreelinvel sensor analog — the humanoid Walk
    #   residual's foot/com velocity terms, walk.cc:140-160)
    contact_dist: jax.Array  # (ncon,) signed gaps
    contact_force: jax.Array  # (ncon,) normal force magnitude
    qacc: jax.Array          # (nv,)
    actuator_force: jax.Array  # (nu,) joint torques AFTER gear
    qfrc_total: jax.Array    # (nv,) smooth + constraint generalized force
    diverged: jax.Array      # () bool


def _num_limit_rows(m: Model) -> int:
    s = m.struct
    n = 2 * s.ntendon
    for j in range(s.njnt):
        if s.jnt_limited[j] and s.jnt_type[j] in (JointType.HINGE,
                                                  JointType.SLIDE):
            n += 2
    return n


def _prepare_smooth(m: Model, state: State, ctrl: jax.Array,
                    xfrc: Optional[jax.Array]):
    """Smooth dynamics + collision (everything before constraint rows)."""
    from .model import ActuatorType
    qpos, qvel = state.qpos, state.qvel
    s = m.struct

    kin = fwd_position(m, qpos)
    vel = fwd_velocity(m, kin, qvel)
    M = crb_mass_matrix(m, kin)
    bias = rnea_bias(m, kin, vel, qvel)
    tau = actuation(m, qpos, qvel, ctrl)
    qfrc_passive = passive_force(m, qpos, qvel)
    if s.fluid_density or s.fluid_viscosity:
        from .engine import fluid_force
        qfrc_passive = qfrc_passive + fluid_force(m, kin, vel)
    if s.has_gravcomp:
        from .engine import gravcomp_qfrc
        qfrc_passive = qfrc_passive + gravcomp_qfrc(m, kin)
    qfrc_smooth = tau + qfrc_passive - bias
    if any(t == ActuatorType.SITE_THRUST for t in s.act_type):
        qfrc_smooth = qfrc_smooth + thrust_qfrc(m, kin, ctrl)
    if xfrc is not None:
        qfrc_smooth = qfrc_smooth + xfrc_to_qfrc(m, kin, xfrc)

    contacts_full = collide(m, kin.xpos, kin.xmat)
    K = s.max_contacts
    if 0 < K < m.ncon:
        contacts, sel = select_contacts(contacts_full, K)
    else:
        contacts, sel = contacts_full, None
    return kin, vel, M, qfrc_smooth, contacts_full, contacts, sel


def _prepare(m: Model, state: State, ctrl: jax.Array,
             xfrc: Optional[jax.Array]):
    """Smooth dynamics + collision + constraint-row assembly (the JAX
    solver path in `forward`; step's kernel path builds rows in VMEM via
    pallas_solver.solve_step_raw instead)."""
    from .solver import make_rows
    kin, vel, M, qfrc_smooth, contacts_full, contacts, sel = \
        _prepare_smooth(m, state, ctrl, xfrc)
    rows = make_rows(m, kin, state.qpos, state.qvel, contacts, sel)
    return kin, vel, M, qfrc_smooth, contacts_full, contacts, sel, rows


def _contact_forces(m: Model, efc_f: jax.Array, ncon: int,
                    sel, dtype) -> jax.Array:
    """Per-slot normal forces: sum the 10 pyramid-edge forces per slot
    (every condim-6 edge has unit normal coefficient), scattered back to
    the full fixed slot layout when top-k selection is active."""
    nlim = _num_limit_rows(m)
    if ncon and efc_f.shape[0] >= nlim + 10 * ncon:
        cf_sel = efc_f[nlim:nlim + 10 * ncon].reshape(ncon, 10).sum(axis=-1)
        if sel is not None:
            return jnp.zeros((m.ncon,), dtype=dtype).at[sel].set(cf_sel)
        return cf_sel
    return jnp.zeros((m.ncon,), dtype=dtype)


def _actuator_force(m: Model, qpos: jax.Array, qvel: jax.Array,
                    ctrl: jax.Array, dtype) -> jax.Array:
    """Actuator joint torques (after gear) for torque-penalty rewards
    (simulation/reward_functions.py joint-torque terms)."""
    from .model import ActuatorType
    s = m.struct
    if not s.nu:
        return jnp.zeros((0,), dtype=dtype)
    c = jnp.clip(ctrl, m.act_ctrlrange[:, 0], m.act_ctrlrange[:, 1])
    af = []
    for a in range(s.nu):
        j = s.act_jnt[a]
        if s.act_type[a] in (ActuatorType.MOTOR, ActuatorType.SITE_THRUST):
            force = c[a]
        else:
            force = (m.act_kp[a] * (c[a] - qpos[s.jnt_qadr[j]])
                     - m.act_kv[a] * qvel[s.jnt_vadr[j]])
        af.append(m.act_gear[a] * jnp.clip(
            force, m.act_forcerange[a, 0], m.act_forcerange[a, 1]))
    return jnp.stack(af)


def forward(m: Model, state: State, ctrl: jax.Array,
            xfrc: Optional[jax.Array] = None,
            solver_iters: int = 8, ift: bool = False
            ) -> Tuple[jax.Array, jax.Array, jax.Array, StepInfo]:
    """Forward dynamics: returns (qacc_explicit, qfrc_total, M, info).

    qfrc_total = smooth + constraint forces; qacc_explicit = M^-1 qfrc_total
    (used by RK4 and by derivative code; Euler re-solves with implicit
    damping in `step`).
    """
    from .solver import finish_efc
    qpos, qvel = state.qpos, state.qvel
    dtype = qpos.dtype

    kin, vel, M, qfrc_smooth, contacts_full, contacts, sel, rows = \
        _prepare(m, state, ctrl, xfrc)
    Mchol = linalg.chol_factor(M)
    efc = finish_efc(rows, qvel, Mchol)
    qacc, efc_f, qfrc_constraint = newton_solve(
        M, Mchol, qfrc_smooth, efc, niter=solver_iters, ift=ift)
    qfrc_total = qfrc_smooth + qfrc_constraint

    cf = _contact_forces(m, efc_f, contacts.dist.shape[0], sel, dtype)
    actuator_force = _actuator_force(m, qpos, qvel, ctrl, dtype)

    diverged = jnp.logical_or(
        ~jnp.all(jnp.isfinite(qacc)),
        jnp.max(jnp.abs(qvel)) > _QVEL_LIMIT)

    info = StepInfo(
        xpos=kin.xpos, xquat=kin.xquat, xipos=kin.xipos,
        site_xpos=kin.site_xpos, com=kin.anchor, com_vel=vel.com_vel,
        body_com_vel=body_com_velocities(kin, vel),
        contact_dist=contacts_full.dist, contact_force=cf,
        qacc=qacc, actuator_force=actuator_force, qfrc_total=qfrc_total,
        diverged=diverged)
    return qacc, qfrc_total, M, info


def integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array, dt
                  ) -> jax.Array:
    """Position integration on the configuration manifold (mj_integratePos):
    free/ball quaternions via the exponential map with LOCAL-frame omega."""
    s = m.struct
    out = qpos
    for j in range(s.njnt):
        qadr, vadr = s.jnt_qadr[j], s.jnt_vadr[j]
        t = s.jnt_type[j]
        if t == JointType.FREE:
            out = out.at[qadr:qadr + 3].set(
                qpos[qadr:qadr + 3] + dt * qvel[vadr:vadr + 3])
            q = pm.quat_integrate(pm.quat_normalize(qpos[qadr + 3:qadr + 7]),
                                  qvel[vadr + 3:vadr + 6], dt)
            out = out.at[qadr + 3:qadr + 7].set(q)
        elif t == JointType.BALL:
            q = pm.quat_integrate(pm.quat_normalize(qpos[qadr:qadr + 4]),
                                  qvel[vadr:vadr + 3], dt)
            out = out.at[qadr:qadr + 4].set(q)
        else:
            out = out.at[qadr].set(qpos[qadr] + dt * qvel[vadr])
    return out


def step(m: Model, state: State, ctrl: jax.Array,
         xfrc: Optional[jax.Array] = None,
         solver_iters: int = 8, ift: bool = False,
         use_pallas: Optional[bool] = None) -> Tuple[State, StepInfo]:
    """Semi-implicit Euler with implicit joint damping (mj_Euler analog).

    The constraint Newton solve and the implicit-damping velocity update
    (M + h*diag(damping)) dv = h * qfrc_total — exactly MuJoCo's Euler
    formulation — run through `pallas_solver.solve_constraints_euler`:
    one fused TPU kernel per batch tile under vmap (rollout/env batches),
    the equivalent pure-JAX path otherwise.

    `ift=True` routes the contact solve through implicit-function
    derivatives (solver.newton_solve ift) — for AD/linearization callers
    (that path never enters the fused kernel).
    """
    h = m.dt
    if ift:
        _, qfrc_total, M, info = forward(m, state, ctrl, xfrc, solver_iters,
                                         ift=True)
        MhD = M + h * jnp.diag(m.dof_damping)
        dv = h * linalg.solve_psd(MhD, qfrc_total)
        qvel_new = state.qvel + dv
    else:
        from . import pallas_smooth, pallas_solver
        qpos, qvel = state.qpos, state.qvel
        dtype = qpos.dtype
        K_cap = m.struct.max_contacts
        ncon_sel = K_cap if 0 < K_cap < m.ncon else m.ncon
        use_rows_kernel = (use_pallas is not False
                           and pallas_solver.enabled()
                           and dtype == jnp.float32 and ncon_sel > 0)
        use_smooth_kernel = (use_rows_kernel
                             and pallas_smooth.supported(m))
        if use_smooth_kernel:
            # TPU fastest path: the ENTIRE smooth stage (FK, CRB, RNEA,
            # actuation/passive, collision, raw contact/limit rows) runs
            # in one fused kernel, then the constraint solve + Euler in
            # a second — two pallas_calls per step instead of ~100 XLA
            # fusions (the round-5 smooth-stage profile)
            from .solver import contact_dmask, limit_rows_static
            (M, qfrc_smooth, cdof, rel, nrm, dist, mu3, kc, bc, dc,
             lpos, kl, bl, dl, xpos, xquat, xipos, bcv, sitex, anchor,
             com_vel, actf) = pallas_smooth.smooth_raw(
                m, qpos, qvel, ctrl, xfrc)
            qacc, qvel_new, cf, qfrc_constraint = \
                pallas_solver.solve_step_raw(
                    M, qfrc_smooth, qvel, cdof, rel, nrm, dist, mu3,
                    contact_dmask(m), kc, bc, dc, lpos, kl, bl, dl,
                    h * m.dof_damping, h, lim_tab=limit_rows_static(m),
                    niter=solver_iters)
            qfrc_total = qfrc_smooth + qfrc_constraint
            diverged = jnp.logical_or(
                ~jnp.all(jnp.isfinite(qacc)),
                jnp.max(jnp.abs(qvel)) > _QVEL_LIMIT)
            info = StepInfo(
                xpos=xpos, xquat=xquat, xipos=xipos, site_xpos=sitex,
                com=anchor, com_vel=com_vel, body_com_vel=bcv,
                contact_dist=dist, contact_force=cf, qacc=qacc,
                actuator_force=actf, qfrc_total=qfrc_total,
                diverged=diverged)
            qpos_new = integrate_pos(m, state.qpos, qvel_new, h)
            diverged = jnp.logical_or(info.diverged,
                                      ~jnp.all(jnp.isfinite(qvel_new)))
            qpos_new = jnp.where(diverged, state.qpos, qpos_new)
            qvel_new = jnp.where(diverged, jnp.zeros_like(qvel_new),
                                 qvel_new)
            info = dataclasses.replace(info, diverged=diverged)
            return (State(qpos=qpos_new, qvel=qvel_new,
                          time=state.time + h), info)
        if use_rows_kernel:
            # TPU fast path: constraint rows are built INSIDE the fused
            # kernel from raw contact data (pallas_solver._rows_kernel)
            # — make_rows' XLA-side assembly was ~60% of step time
            from .solver import (contact_raw, limit_rows_data,
                                 limit_rows_static)
            kin, vel, M, qfrc_smooth, contacts_full, contacts, sel = \
                _prepare_smooth(m, state, ctrl, xfrc)
            # selection-free when the full slot set fits the kernel's
            # scoped VMEM (J is nv x ne x 128 x 4B; cap ~8 MB): the
            # top-k sort + 7 dynamic gathers cost more on TPU than the
            # extra inactive rows, and the slot->chain dof table becomes
            # a STATIC kernel input. Solves are identical whenever at
            # most k slots are active (select_contacts docstring) —
            # inactive far rows contribute zero force either way.
            ne_nosel = _num_limit_rows(m) + 10 * m.ncon
            if sel is not None and m.struct.nv * ne_nosel <= 16384:
                contacts, sel = contacts_full, None
            dmask, rel, mu3, kcon, bcon, dcon = contact_raw(
                m, kin, contacts, sel)
            lpos, kl, bl, dl = limit_rows_data(m, qpos)
            qacc, qvel_new, fslot, qfrc_constraint = \
                pallas_solver.solve_step_raw(
                    M, qfrc_smooth, qvel, kin.cdof, rel, contacts.normal,
                    contacts.dist, mu3, dmask, kcon, bcon, dcon,
                    lpos, kl, bl, dl, h * m.dof_damping, h,
                    lim_tab=limit_rows_static(m), niter=solver_iters)
            if sel is not None:
                cf = jnp.zeros((m.ncon,), dtype=dtype).at[sel].set(fslot)
            else:
                cf = fslot
        else:
            kin, vel, M, qfrc_smooth, contacts_full, contacts, sel, rows \
                = _prepare(m, state, ctrl, xfrc)
            qacc, qvel_new, efc_f, qfrc_constraint = \
                pallas_solver.solve_constraints_euler(
                    M, qfrc_smooth, qvel, rows.J, rows.pos, rows.k,
                    rows.b, rows.d, h * m.dof_damping, h,
                    niter=solver_iters, force_jax=(use_pallas is False))
            cf = _contact_forces(m, efc_f, contacts.dist.shape[0], sel,
                                 dtype)
        qfrc_total = qfrc_smooth + qfrc_constraint
        diverged = jnp.logical_or(
            ~jnp.all(jnp.isfinite(qacc)),
            jnp.max(jnp.abs(qvel)) > _QVEL_LIMIT)
        info = StepInfo(
            xpos=kin.xpos, xquat=kin.xquat, xipos=kin.xipos,
            site_xpos=kin.site_xpos, com=kin.anchor, com_vel=vel.com_vel,
            body_com_vel=body_com_velocities(kin, vel),
            contact_dist=contacts_full.dist, contact_force=cf,
            qacc=qacc, actuator_force=_actuator_force(m, qpos, qvel, ctrl,
                                                      dtype),
            qfrc_total=qfrc_total, diverged=diverged)
    qpos_new = integrate_pos(m, state.qpos, qvel_new, h)

    diverged = jnp.logical_or(info.diverged,
                              ~jnp.all(jnp.isfinite(qvel_new)))
    # freeze state on divergence so downstream stays finite
    qpos_new = jnp.where(diverged, state.qpos, qpos_new)
    qvel_new = jnp.where(diverged, jnp.zeros_like(qvel_new), qvel_new)
    info = dataclasses.replace(info, diverged=diverged)
    new_state = State(qpos=qpos_new, qvel=qvel_new, time=state.time + h)
    return new_state, info


def step_rk4(m: Model, state: State, ctrl: jax.Array,
             xfrc: Optional[jax.Array] = None,
             solver_iters: int = 8) -> Tuple[State, StepInfo]:
    """Classic RK4 (mj_RungeKutta analog) — explicit, for accuracy tests."""
    h = m.dt

    def deriv(st):
        qacc, _, _, info = forward(m, st, ctrl, xfrc, solver_iters)
        return st.qvel, qacc, info

    v1, a1, info = deriv(state)
    s2 = State(integrate_pos(m, state.qpos, v1, 0.5 * h),
               state.qvel + 0.5 * h * a1, state.time)
    v2, a2, _ = deriv(s2)
    s3 = State(integrate_pos(m, state.qpos, v2, 0.5 * h),
               state.qvel + 0.5 * h * a2, state.time)
    v3, a3, _ = deriv(s3)
    s4 = State(integrate_pos(m, state.qpos, v3, h),
               state.qvel + h * a3, state.time)
    v4, a4, _ = deriv(s4)

    vavg = (v1 + 2 * v2 + 2 * v3 + v4) / 6.0
    aavg = (a1 + 2 * a2 + 2 * a3 + a4) / 6.0
    qpos_new = integrate_pos(m, state.qpos, vavg, h)
    qvel_new = state.qvel + h * aavg
    return State(qpos_new, qvel_new, state.time + h), info
