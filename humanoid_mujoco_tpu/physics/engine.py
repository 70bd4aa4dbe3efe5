"""Forward kinematics + smooth (unconstrained) dynamics, pure JAX.

TPU-native replacement for MuJoCo's mj_fwdPosition / mj_fwdVelocity /
mj_crb / mj_rne pipeline that the reference drives through mj_step
(mjpc/trajectory.cc rollouts, simulation/cpu_env.py:683).

Everything is written for a SINGLE model/state and lifted to batches with
`jax.vmap`; loops over bodies/dofs are python loops over the static
structure, so they unroll at trace time into a fixed dataflow graph that
XLA fuses. The per-body recursions become masked matmuls over static
0/1 masks wherever possible (CRB, bias, velocities), which vectorizes
the tree traversal.

Spatial algebra: 6-vectors [angular; linear] in world axes, anchored at a
common point (the whole-model COM, recomputed each step for conditioning —
the analog of MuJoCo's subtree_com[0] 'c-frame').
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import math as pm
from .model import JointType, Model, Structure

# full-precision accumulation for the inertia/dynamics contractions —
# see crb_mass_matrix; cheap (tiny matmuls) and required for bodies with
# small rotational inertia
_HI = jax.lax.Precision.HIGHEST


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Kin:
    """Position-stage quantities (mj_fwdPosition analog)."""

    xpos: jax.Array      # (nbody, 3) body frame origin, world
    xquat: jax.Array     # (nbody, 4)
    xmat: jax.Array      # (nbody, 3, 3)
    xipos: jax.Array     # (nbody, 3) body COM, world
    xanchor: jax.Array   # (njnt, 3) joint anchors, world
    anchor: jax.Array    # (3,) spatial anchor point (whole-model COM)
    cdof: jax.Array      # (nv, 6) per-dof motion subspace about anchor
    cinert: jax.Array    # (nbody, 6, 6) spatial inertia about anchor
    total_mass: jax.Array  # ()
    site_xpos: jax.Array   # (nsite, 3)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Vel:
    """Velocity-stage quantities (mj_fwdVelocity analog)."""

    cvel: jax.Array       # (nbody, 6) body spatial velocity about anchor
    cdof_dot: jax.Array   # (nv, 6)
    com_vel: jax.Array    # (3,) whole-model COM linear velocity


def fwd_position(m: Model, qpos: jax.Array) -> Kin:
    s = m.struct
    dtype = qpos.dtype
    xpos = [None] * s.nbody
    xquat = [None] * s.nbody
    xanchor = [None] * s.njnt
    zero3 = jnp.zeros(3, dtype=dtype)

    for b in range(s.nbody):
        p = s.body_parent[b]
        if p < 0:
            # world-child: the body's fixed frame offset IS its world
            # pose (a free joint below overrides it from qpos)
            pos = m.body_pos[b].astype(dtype)
            quat = m.body_quat[b].astype(dtype)
        else:
            pos = xpos[p] + pm.quat_rotate(xquat[p], m.body_pos[b])
            quat = pm.quat_mul(xquat[p], m.body_quat[b])
        for j in s.body_joints[b]:
            qadr = s.jnt_qadr[j]
            t = s.jnt_type[j]
            if t == JointType.FREE:
                # free joint: qpos IS the world pose of the body frame
                pos = qpos[qadr:qadr + 3]
                quat = pm.quat_normalize(qpos[qadr + 3:qadr + 7])
                xanchor[j] = pos
            else:
                anchor_w = pos + pm.quat_rotate(quat, m.jnt_pos[j])
                xanchor[j] = anchor_w
                if t == JointType.BALL:
                    qj = pm.quat_normalize(qpos[qadr:qadr + 4])
                    quat = pm.quat_mul(quat, qj)
                    pos = anchor_w - pm.quat_rotate(quat, m.jnt_pos[j])
                elif t == JointType.HINGE:
                    axis_l = m.jnt_axis[j]
                    qj = pm.axis_angle_to_quat(axis_l, qpos[qadr])
                    quat = pm.quat_mul(quat, qj)
                    pos = anchor_w - pm.quat_rotate(quat, m.jnt_pos[j])
                elif t == JointType.SLIDE:
                    pos = pos + pm.quat_rotate(quat, m.jnt_axis[j] * qpos[qadr])
        xpos[b] = pos
        xquat[b] = quat

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = pm.quat_to_mat(xquat)
    xanchor = jnp.stack(xanchor) if s.njnt else jnp.zeros((0, 3), dtype)

    # COM positions and whole-model COM (spatial anchor)
    xipos = xpos + jnp.einsum("bij,bj->bi", xmat, m.body_ipos,
                              precision=_HI)
    total_mass = jnp.sum(m.body_mass)
    anchor = jnp.sum(m.body_mass[:, None] * xipos, axis=0) / jnp.maximum(
        total_mass, 1e-12)

    # per-dof motion subspace about the anchor
    cdof = _compute_cdof(s, m, xquat, xmat, xanchor, anchor, dtype)

    # spatial inertia about the anchor
    imat = pm.quat_to_mat(m.body_iquat)           # inertial frame in body
    # full-f32 accumulation: the default (bf16-pass) matmul precision on
    # TPU/AMX loses ~8 bits — enough to make the mass matrix indefinite
    # for bodies whose rotational inertia (1e-5 kg m^2, e.g. the panda
    # task's box) is far below the parallel-axis intermediates (1e-2)
    R = jnp.matmul(xmat, imat, precision=_HI)     # inertial frame in world
    inertia_w = jnp.matmul(
        R, m.body_inertia[..., None] * jnp.swapaxes(R, -1, -2),
        precision=_HI)
    cinert = pm.spatial_inertia(m.body_mass, inertia_w, xipos - anchor)

    nsite = len(s.site_names)
    if nsite:
        site_xpos = jnp.stack([
            xpos[b] + pm.quat_rotate(xquat[b], m.site_pos[i])
            for i, b in enumerate(s.site_body)])
    else:
        site_xpos = jnp.zeros((0, 3), dtype)

    return Kin(xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos,
               xanchor=xanchor, anchor=anchor, cdof=cdof, cinert=cinert,
               total_mass=total_mass, site_xpos=site_xpos)


def _compute_cdof(s: Structure, m: Model, xquat, xmat, xanchor, anchor,
                  dtype) -> jax.Array:
    rows = []
    eye3 = jnp.eye(3, dtype=dtype)
    zero3 = jnp.zeros(3, dtype=dtype)
    for j in range(s.njnt):
        t = s.jnt_type[j]
        b = s.jnt_body[j]
        if t == JointType.FREE:
            for k in range(3):  # translation dofs, world axes
                rows.append(jnp.concatenate([zero3, eye3[k]]))
            for k in range(3):  # rotation dofs: body-frame axes (local ω)
                ax = xmat[b][:, k]
                rows.append(jnp.concatenate(
                    [ax, jnp.cross(ax, anchor - xanchor[j])]))
        elif t == JointType.BALL:
            for k in range(3):
                ax = xmat[b][:, k]
                rows.append(jnp.concatenate(
                    [ax, jnp.cross(ax, anchor - xanchor[j])]))
        elif t == JointType.HINGE:
            ax = pm.quat_rotate(xquat[b], m.jnt_axis[j])
            # joint rotation applied before? axis is fixed in the body AFTER
            # rotation about itself, so using the post-joint frame is exact.
            rows.append(jnp.concatenate(
                [ax, jnp.cross(ax, anchor - xanchor[j])]))
        elif t == JointType.SLIDE:
            ax = pm.quat_rotate(xquat[b], m.jnt_axis[j])
            rows.append(jnp.concatenate([zero3, ax]))
    if not rows:
        return jnp.zeros((0, 6), dtype)
    return jnp.stack(rows)


def fwd_velocity(m: Model, kin: Kin, qvel: jax.Array) -> Vel:
    s = m.struct
    dtype = qvel.dtype
    body_dof = jnp.asarray(s.body_dof, dtype=dtype)      # (nbody, nv) static
    # body spatial velocities: masked sum of cdof * qvel along each chain
    cvel = jnp.matmul(body_dof * qvel, kin.cdof,
                      precision=_HI)                     # (nbody, 6)

    # cdof_dot: for dofs whose motion subspace is BODY-FIXED (hinge/slide
    # axes, ball/free rotation axes + anchors) the exact derivative is
    # S_dot = v_body ×m S. Free-joint TRANSLATION axes are world-fixed
    # constants, so their derivative is exactly zero.
    cdof_dot = [None] * s.nv
    for j in range(s.njnt):
        b = s.jnt_body[j]
        v0 = s.jnt_vadr[j]
        t = s.jnt_type[j]
        nvj = {JointType.FREE: 6, JointType.BALL: 3}.get(t, 1)
        for k in range(v0, v0 + nvj):
            if t == JointType.FREE and k < v0 + 3:
                cdof_dot[k] = jnp.zeros(6, dtype=dtype)
            else:
                cdof_dot[k] = pm.motion_cross(cvel[b], kin.cdof[k])
    cdof_dot = (jnp.stack(cdof_dot) if s.nv
                else jnp.zeros((0, 6), dtype))

    # whole-model COM velocity = total linear momentum / total mass
    v_com_b = cvel[:, 3:] + jnp.cross(cvel[:, :3], kin.xipos - kin.anchor)
    com_vel = jnp.sum(m.body_mass[:, None] * v_com_b, axis=0) / jnp.maximum(
        kin.total_mass, 1e-12)
    return Vel(cvel=cvel, cdof_dot=cdof_dot, com_vel=com_vel)


def body_com_velocities(kin: Kin, vel: Vel) -> jax.Array:
    """Per-body COM linear velocities (nbody, 3) — the framelinvel /
    subtreelinvel sensor family's raw ingredient."""
    return vel.cvel[:, 3:] + jnp.cross(vel.cvel[:, :3],
                                       kin.xipos - kin.anchor)


def crb_mass_matrix(m: Model, kin: Kin) -> jax.Array:
    """Joint-space inertia M (nv, nv) via masked J^T I J over bodies.

    M = sum_b (mask_b ∘ cdof)^T cinert_b (mask_b ∘ cdof) + diag(armature) —
    the composite-rigid-body result expressed as one einsum so the whole
    tree traversal is a single fused contraction (vs mj_crb's recursion).
    """
    s = m.struct
    dtype = kin.cdof.dtype
    body_dof = jnp.asarray(s.body_dof, dtype=dtype)      # (nbody, nv)
    W = body_dof[:, :, None] * kin.cdof[None, :, :]       # (nbody, nv, 6)
    M = jnp.einsum("bik,bkl,bjl->ij", W, kin.cinert, W, precision=_HI)
    M = 0.5 * (M + M.T) + jnp.diag(m.dof_armature)
    return M


def rnea_bias(m: Model, kin: Kin, vel: Vel, qvel: jax.Array) -> jax.Array:
    """qfrc_bias = C(q, qvel) qvel + gravity load (mj_rne with qacc = 0).

    Forward pass: body spatial accelerations with the gravity trick
    (base acceleration = -g); body forces f = I a + v ×* I v; the backward
    accumulation collapses into a masked contraction.
    """
    s = m.struct
    dtype = kin.cdof.dtype
    body_dof = jnp.asarray(s.body_dof, dtype=dtype)
    a0 = jnp.concatenate([jnp.zeros(3, dtype=dtype), -m.gravity])
    # cacc_b = a0 + sum_{j moves b} cdof_dot_j qvel_j
    cacc = a0[None, :] + jnp.matmul(body_dof * qvel, vel.cdof_dot,
                                    precision=_HI)         # (nbody, 6)
    Iv = jnp.einsum("bij,bj->bi", kin.cinert, vel.cvel, precision=_HI)
    f = jnp.einsum("bij,bj->bi", kin.cinert, cacc,
                   precision=_HI) + pm.force_cross(vel.cvel, Iv)
    # bias_i = cdof_i · sum_{b : dof i moves b} f_b
    # (precision: a default-precision matmul here runs bf16 on the TPU
    # MXU — the ~19 N gravity load rounds at 4e-3 relative, which the
    # round-5 fused-kernel parity check exposed)
    fsum = jnp.matmul(body_dof.T, f, precision=_HI)       # (nv, 6)
    return jnp.sum(kin.cdof * fsum, axis=-1)


def kinetic_energy(M: jax.Array, qvel: jax.Array) -> jax.Array:
    return 0.5 * qvel @ M @ qvel


def inverse_dynamics(m: Model, qpos: jax.Array, qvel: jax.Array,
                     qacc: jax.Array) -> jax.Array:
    """Smooth inverse dynamics: the applied generalized force required
    for (qpos, qvel, qacc) ignoring contacts — tau = M qacc + bias -
    passive (the mj_inverse analog used by the direct optimizer's force
    residual, mjpc/direct/direct.cc and docs/DIRECT.md; contact forces
    are treated as part of the residual being minimized)."""
    kin = fwd_position(m, qpos)
    vel = fwd_velocity(m, kin, qvel)
    M = crb_mass_matrix(m, kin)
    bias = rnea_bias(m, kin, vel, qvel)
    qfrc_passive = passive_force(m, qpos, qvel)
    if m.struct.fluid_density or m.struct.fluid_viscosity:
        qfrc_passive = qfrc_passive + fluid_force(m, kin, vel)
    if m.struct.has_gravcomp:
        qfrc_passive = qfrc_passive + gravcomp_qfrc(m, kin)
    return M @ qacc + bias - qfrc_passive


def point_jacobian(m: Model, kin: Kin, body: int, point: jax.Array
                   ) -> jax.Array:
    """Translational Jacobian (3, nv) of a world point rigidly on `body`."""
    s = m.struct
    dtype = kin.cdof.dtype
    mask = jnp.asarray(s.body_dof[body], dtype=dtype)     # (nv,)
    lin = kin.cdof[:, 3:] + jnp.cross(kin.cdof[:, :3], point - kin.anchor)
    return (mask[:, None] * lin).T                        # (3, nv)


def actuation(m: Model, qpos: jax.Array, qvel: jax.Array, ctrl: jax.Array
              ) -> jax.Array:
    """Actuator forces -> qfrc_actuator (nv,).

    motor:    force = clip(ctrl, ctrlrange); qfrc = gear * clip(force, frange)
    position: force = kp*(ctrl - q) - kv*qvel; clipped; qfrc = gear * force
    (reference defaults: world.xml:20-21 — motor gear=20 forcerange ±1,
    position kp=1 kv=0.05.)
    """
    from .model import ActuatorType
    s = m.struct
    qfrc = jnp.zeros((s.nv,), dtype=qpos.dtype)
    if s.nu == 0:
        return qfrc
    c = jnp.clip(ctrl, m.act_ctrlrange[:, 0], m.act_ctrlrange[:, 1])
    forces = []
    for a in range(s.nu):
        if s.act_type[a] == ActuatorType.SITE_THRUST:
            continue  # handled kinematically by thrust_qfrc
        j = s.act_jnt[a]
        qadr, vadr = s.jnt_qadr[j], s.jnt_vadr[j]
        if s.act_type[a] == ActuatorType.MOTOR:
            force = c[a]
        else:  # POSITION
            force = m.act_kp[a] * (c[a] - qpos[qadr]) - m.act_kv[a] * qvel[vadr]
        force = jnp.clip(force, m.act_forcerange[a, 0], m.act_forcerange[a, 1])
        forces.append((vadr, m.act_gear[a] * force))
    if not forces:
        return qfrc
    idx = jnp.array([v for v, _ in forces], dtype=jnp.int32)
    vals = jnp.stack([f for _, f in forces])
    return qfrc.at[idx].add(vals)


def thrust_qfrc(m: Model, kin: Kin, ctrl: jax.Array) -> jax.Array:
    """SITE_THRUST actuators -> qfrc (nv,): each actuator applies the
    wrench ctrl*gear6 (site/body frame) at its site's world point —
    MuJoCo's site transmission (the quadrotor's rotor motors,
    mjpc/tasks/quadrotor quadrotor_modified.xml actuator block).

    Converted to a per-body COM wrench in world frame and routed through
    the same xfrc path as external pushes."""
    from .model import ActuatorType
    s = m.struct
    dtype = kin.cdof.dtype
    xfrc = jnp.zeros((s.nbody, 6), dtype=dtype)
    c = jnp.clip(ctrl, m.act_ctrlrange[:, 0], m.act_ctrlrange[:, 1])
    for a in range(s.nu):
        if s.act_type[a] != ActuatorType.SITE_THRUST:
            continue
        site = s.act_site[a]
        b = s.site_body[site]
        u = jnp.clip(c[a], m.act_forcerange[a, 0], m.act_forcerange[a, 1])
        if s.act_site_world and s.act_site_world[a]:
            # refsite="world" semantics: gear is a world-frame wrench
            f_w = m.act_gear6[a, :3] * u
            t_w = m.act_gear6[a, 3:] * u
        else:
            R = kin.xmat[b]
            f_w = R @ (m.act_gear6[a, :3] * u)  # world force at site point
            t_w = R @ (m.act_gear6[a, 3:] * u)  # world torque
        # wrench about the body COM (xfrc_to_qfrc convention)
        t_com = t_w + jnp.cross(kin.site_xpos[site] - kin.xipos[b], f_w)
        xfrc = xfrc.at[b, :3].add(f_w).at[b, 3:].add(t_com)
    return xfrc_to_qfrc(m, kin, xfrc)


def passive_force(m: Model, qpos: jax.Array, qvel: jax.Array) -> jax.Array:
    """Joint springs + explicit damping (mj_passive analog).

    Damping is ALSO handled implicitly at integration (see step.py), in
    which case the explicit damping term here is what enters qfrc_smooth
    — matching MuJoCo's Euler-with-implicit-damping formulation.
    """
    s = m.struct
    qfrc = -m.dof_damping * qvel
    for j in range(s.njnt):
        t = s.jnt_type[j]
        qadr, vadr = s.jnt_qadr[j], s.jnt_vadr[j]
        if t in (JointType.HINGE, JointType.SLIDE):
            qfrc = qfrc.at[vadr].add(
                -m.jnt_stiffness[j] * (qpos[qadr] - m.qpos_spring[qadr]))
        elif t == JointType.FREE:
            # Reference semantics (engine_passive.c free-joint spring):
            # world-frame translational spring to qpos_spring[0:3] plus a
            # rotational spring -k * subQuat(q, q_ref) on the local-frame
            # angular dofs. The humanoid XML's joint defaults put
            # stiffness 1.0 on the free root (world.xml:21) — the weak
            # stand-pose tether the round-1 build was missing.
            k = m.jnt_stiffness[j]
            qfrc = qfrc.at[vadr:vadr + 3].add(
                -k * (qpos[qadr:qadr + 3] - m.qpos_spring[qadr:qadr + 3]))
            dif = pm.quat_sub(qpos[qadr + 3:qadr + 7],
                              m.qpos_spring[qadr + 3:qadr + 7])
            qfrc = qfrc.at[vadr + 3:vadr + 6].add(-k * dif)
        elif t == JointType.BALL:
            dif = pm.quat_sub(qpos[qadr:qadr + 4],
                              m.qpos_spring[qadr:qadr + 4])
            qfrc = qfrc.at[vadr:vadr + 3].add(-m.jnt_stiffness[j] * dif)
    return qfrc


def gravcomp_qfrc(m: Model, kin: Kin) -> jax.Array:
    """Per-body gravity compensation (MJCF body gravcomp): force
    gravcomp * mass * (-gravity) at each body COM (engine_passive
    semantics; the panda arm sets gravcomp=1 on every link)."""
    frc = (m.body_gravcomp * m.body_mass)[:, None] * (-m.gravity)[None, :]
    xfrc = jnp.concatenate([frc, jnp.zeros_like(frc)], axis=-1)
    return xfrc_to_qfrc(m, kin, xfrc)


def fluid_force(m: Model, kin: Kin, vel: Vel) -> jax.Array:
    """Inertia-box fluid drag (mj_inertiaBoxFluidModel analog).

    MuJoCo's default medium model, which the reference's swimmer task
    relies on for propulsion (swimmer.xml.patch sets density=1000 with
    contact disabled): each body is replaced by the box with the same
    mass/inertia; Stokes viscous drag plus quadratic density drag act on
    its body-frame velocity at the COM. Full box dims from the diagonal
    inertia: d_i = sqrt(6 (I_j + I_k - I_i) / mass).

      viscous:  F = -3 pi d_mean mu v,  T = -pi d_mean^3 mu w
      density:  F_i = -1/2 rho d_j d_k |v_i| v_i
                T_i = -rho d_i (d_j^4 + d_k^4) |w_i| w_i / 64

    Everything is batched over bodies — no per-body Python loop.
    """
    s = m.struct
    rho = s.fluid_density
    mu = s.fluid_viscosity
    dtype = kin.xpos.dtype

    # body-frame (inertial-frame) velocity at the COM
    v_com = vel.cvel[:, 3:] + jnp.cross(vel.cvel[:, :3],
                                        kin.xipos - kin.anchor)
    w_com = vel.cvel[:, :3]
    Ri = kin.xmat @ jax.vmap(pm.quat_to_mat)(m.body_iquat)  # (nbody, 3, 3)
    lv = jnp.einsum("bji,bj->bi", Ri, v_com)
    lw = jnp.einsum("bji,bj->bi", Ri, w_com)

    mass = jnp.maximum(m.body_mass, 1e-12)[:, None]
    inertia = m.body_inertia
    isum = jnp.sum(inertia, axis=-1, keepdims=True)
    d = jnp.sqrt(jnp.maximum(6.0 * (isum - 2.0 * inertia) / mass, 1e-12))
    dj = jnp.roll(d, -1, axis=-1)
    dk = jnp.roll(d, -2, axis=-1)

    frc = jnp.zeros_like(lv)
    trq = jnp.zeros_like(lw)
    if mu:
        diam = jnp.mean(d, axis=-1, keepdims=True)
        frc = frc - 3.0 * jnp.pi * diam * mu * lv
        trq = trq - jnp.pi * diam ** 3 * mu * lw
    if rho:
        frc = frc - 0.5 * rho * dj * dk * jnp.abs(lv) * lv
        trq = trq - rho * d * (dj ** 4 + dk ** 4) / 64.0 * jnp.abs(lw) * lw

    live = (m.body_mass > 1e-12).astype(dtype)[:, None]
    frc_w = jnp.einsum("bij,bj->bi", Ri, frc) * live
    trq_w = jnp.einsum("bij,bj->bi", Ri, trq) * live
    return xfrc_to_qfrc(m, kin, jnp.concatenate([frc_w, trq_w], axis=-1))


def xfrc_to_qfrc(m: Model, kin: Kin, xfrc: jax.Array) -> jax.Array:
    """Map per-body world wrenches (nbody, 6) [force; torque] at body COM
    into generalized forces — the analog of mj_xfrcAccumulate, used by the
    OU perturbation rollouts (mjpc/trajectory.cc:147-155) and the RL env's
    external pushes (simulation/cpu_env.py:618-654)."""
    s = m.struct
    dtype = kin.cdof.dtype
    frc, trq = xfrc[:, :3], xfrc[:, 3:]
    # wrench about the anchor: [torque + (com - anchor) × force ; force]
    w = jnp.concatenate(
        [trq + jnp.cross(kin.xipos - kin.anchor, frc), frc], axis=-1)
    body_dof = jnp.asarray(s.body_dof, dtype=dtype)       # (nbody, nv)
    wsum = jnp.matmul(body_dof.T, w, precision=_HI)       # (nv, 6)
    return jnp.sum(kin.cdof * wsum, axis=-1)
