"""Fused TPU kernel for the SMOOTH dynamics stage + collision.

Why this exists: after the constraint solve moved into one fused kernel
(pallas_solver), the remaining rollout time was the smooth stage's XLA
fusion-launch overhead — forward kinematics alone lowered to ~80 tiny
kernels per step (74 ms of the 251 ms batch-1024 rollout), and the CRB
mass-matrix einsum ran as a 2%-utilization batched GEMM (57 ms). This
kernel computes, per batch tile, with the batch in the lane dimension:

    FK (body poses, joint anchors) -> cdof motion subspaces
    -> 10-component spatial inertias -> composite-rigid-body M
    -> RNEA bias (gravity trick) -> actuation + passive springs/damping
    (+ optional per-body external wrenches) -> sphere/floor +
    sphere/sphere collision -> raw contact rows (rel, normal, dist,
    friction, solref/solimp k,b,d) + joint-limit row data

i.e. everything `step._prepare_smooth` + `solver.contact_raw` +
`solver.limit_rows_data` produce, in ONE pallas_call. The model
STRUCTURE (tree, joint types, slot tables) is static and unrolls into
the kernel program; float parameters stream in as small VMEM blocks —
broadcast when shared, per-lane when vmap-batched (the RL env's
domain-randomized ModelPatch leaves) — so the kernel serves any
parameter values, shared or per-env, without recompilation.

Algorithmic parity: every formula mirrors the pure-JAX path
(engine.fwd_position/fwd_velocity/crb_mass_matrix/rnea_bias/
actuation/passive_force, collision.collide, solver.contact_raw/
limit_rows_data) — the tree recursions are re-associated
(composite-inertia accumulation instead of masked matmuls), which is
algebraically identical; only f32 rounding differs. The pure-JAX path
remains the oracle (tests/test_pallas_smooth.py) and the fallback for
unsupported models, non-TPU backends, and f64.

Supported model family (`supported()`): FREE/HINGE/SLIDE joints,
MOTOR/POSITION actuators, sphere geoms only (sphere-vs-hfield floor +
sphere-sphere pairs), joint limits, joint/free springs + damping —
the humanoid/walker/op3 family. Capsule/box scenes, tendons, fluid,
gravcomp, thrust and ball joints use the JAX path.

The reference has no analog of any of this: it calls mj_step on CPU
(mjpc/trajectory.cc rollouts); this module is the TPU-native engine
room behind the same rollouts.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .model import ActuatorType, JointType, Model

_TB = 128


def enabled() -> bool:
    from .pallas_solver import enabled as _en
    return _en()


def supported(m: Model) -> bool:
    """Static gate: can the smooth kernel serve this model?"""
    s = m.struct
    if s.ncap or s.nbox or s.ntendon:
        return False
    if s.pair_sc or s.pair_cc or s.pair_sb or s.pair_cb or s.pair_bb:
        return False
    if s.fluid_density or s.fluid_viscosity or s.has_gravcomp:
        return False
    for t in s.jnt_type:
        if t not in (JointType.FREE, JointType.HINGE, JointType.SLIDE):
            return False
    for t in s.act_type:
        if t not in (ActuatorType.MOTOR, ActuatorType.POSITION):
            return False
    for b in range(s.nbody):
        if s.body_parent[b] >= b:
            return False         # need topological body order
    if m.ncon == 0 or s.nsph == 0:
        return False
    # the in-kernel tent-weight height query unrolls over the grid:
    # fine for the RL env's 8x8 Perlin floor, prohibitive to trace for
    # the quadruped hill's 64x64 (that model keeps the XLA path)
    if s.nhrow * s.nhcol > 1024:
        return False
    # selection-free contact capacity only (matches step's gate)
    nlim = sum(2 for j in range(s.njnt)
               if s.jnt_limited[j] and s.jnt_type[j] in (JointType.HINGE,
                                                         JointType.SLIDE))
    ne = nlim + 10 * m.ncon
    return s.nv * ne <= 16384


# ---------------------------------------------------------------------------
# component-tuple math on (TB,)-lane values (mirrors physics/math.py)
# ---------------------------------------------------------------------------

def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _q_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw)


def _q_rot(q, v):
    """quat_rotate: v + 2 qv x (qv x v + ... ) — exact mirror of
    math.quat_rotate's  t = 2 qv x v;  v + w t + qv x t."""
    qv = (q[1], q[2], q[3])
    t = _scale3(_cross(qv, v), 2.0)
    return _add3(_add3(v, _scale3(t, q[0])), _cross(qv, t))


def _q_normalize(q):
    n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    inv = 1.0 / jnp.maximum(n, 1e-9)
    return (q[0] * inv, q[1] * inv, q[2] * inv, q[3] * inv)


def _q_cols(q):
    """Rotation-matrix COLUMNS of quat q (mirror of math.quat_to_mat)."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    c0 = (1 - 2 * (yy + zz), 2 * (xy + wz), 2 * (xz - wy))
    c1 = (2 * (xy - wz), 1 - 2 * (xx + zz), 2 * (yz + wx))
    c2 = (2 * (xz + wy), 2 * (yz - wx), 1 - 2 * (xx + yy))
    return c0, c1, c2


def _impedance(viol, dmin, dmax, width):
    x = jnp.clip(viol / jnp.maximum(width, 1e-9), 0.0, 1.0)
    y = jnp.where(x < 0.5, 2.0 * x * x, 1.0 - 2.0 * (1.0 - x) ** 2)
    return dmin + y * (dmax - dmin)


def _kb(tc, dr, dmax, d, dt):
    tc = jnp.maximum(tc, 2.0 * dt)
    b = 2.0 / jnp.maximum(dmax * tc, 1e-9)
    k = d / jnp.maximum(dmax * dmax * tc * tc * dr * dr, 1e-12)
    return k, b


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

_NMISC = 20   # packed scalar params, see _pack_params


def _smooth_kernel(qpos_ref, qvel_ref, ctrl_ref, xfrc_ref,
                   bodyp_ref, jointp_ref, dofp_ref, qspr_ref, actp_ref,
                   sphp_ref, sitep_ref, misc_ref, hf_ref,
                   M_ref, qfs_ref, cdof_ref, rel_ref, nrm_ref, mu3_ref,
                   ckbd_ref, limd_ref, ipack_ref, sitex_ref, vec6_ref,
                   actf_ref,
                   *, s, has_xfrc):
    """One batch tile of the smooth stage. `s`: static Structure."""
    qpos = qpos_ref[...]        # (nq, TB)
    qvel = qvel_ref[...]        # (nv, TB)
    ctrl = ctrl_ref[...]        # (max(nu,1), TB)
    bodyp = bodyp_ref[...]      # (nbody, 18)
    jointp = jointp_ref[...]    # (njnt, 10)
    dofp = dofp_ref[...]        # (nv, 2)
    qspr = qspr_ref[...]        # (nq, 1)
    actp = actp_ref[...]        # (max(nu,1), 7)
    sphp = sphp_ref[...]        # (nsph, 7)
    sitep = sitep_ref[...]      # (max(nsite,1), 3)
    misc = misc_ref[...]        # (_NMISC, 1)
    H = hf_ref[...]             # (nhrow, nhcol)
    TB = qpos.shape[-1]
    nv, nq, nu = s.nv, s.nq, s.nu
    nbody, njnt, nsph = s.nbody, s.njnt, s.nsph
    nsite = len(s.site_names)

    def lane(x):
        """Broadcast a () or (TB,) value to (TB,). Param reads are ()
        for shared params and (TB,) for per-env-batched params — the
        whole kernel body is agnostic to which."""
        x = jnp.asarray(x)
        if x.ndim == 1:
            return x
        return jnp.broadcast_to(jnp.reshape(x, (1,)), (TB,))

    gx_, gy_, gz_ = misc[0, 0], misc[1, 0], misc[2, 0]     # gravity
    floor_z = misc[3, 0]
    floor_fr, floor_tor, floor_roll = misc[4, 0], misc[5, 0], misc[6, 0]
    hhx, hhy = misc[7, 0], misc[8, 0]
    so_tc, so_dr = misc[9, 0], misc[10, 0]
    so_dmin, so_dmax, so_w = misc[11, 0], misc[12, 0], misc[13, 0]
    li_tc, li_dr = misc[14, 0], misc[15, 0]
    li_dmin, li_dmax, li_w = misc[16, 0], misc[17, 0], misc[18, 0]
    dt_s = misc[19, 0]

    # ---- forward kinematics (engine.fwd_position) ----
    xpos = [None] * nbody
    xquat = [None] * nbody
    xanchor = [None] * njnt
    for b in range(nbody):
        p = s.body_parent[b]
        bp = (bodyp[b, 0], bodyp[b, 1], bodyp[b, 2])
        bq = (bodyp[b, 3], bodyp[b, 4], bodyp[b, 5], bodyp[b, 6])
        if p < 0:
            pos = tuple(lane(c) for c in bp)
            quat = tuple(lane(c) for c in bq)
        else:
            pos = _add3(xpos[p], _q_rot(xquat[p], bp))
            quat = _q_mul(xquat[p], bq)
        for j in s.body_joints[b]:
            qadr = s.jnt_qadr[j]
            t = s.jnt_type[j]
            jp = (jointp[j, 0], jointp[j, 1], jointp[j, 2])
            jax_ = (jointp[j, 3], jointp[j, 4], jointp[j, 5])
            if t == JointType.FREE:
                pos = (qpos[qadr], qpos[qadr + 1], qpos[qadr + 2])
                quat = _q_normalize((qpos[qadr + 3], qpos[qadr + 4],
                                     qpos[qadr + 5], qpos[qadr + 6]))
                xanchor[j] = pos
            else:
                anchor_w = _add3(pos, _q_rot(quat, jp))
                xanchor[j] = anchor_w
                if t == JointType.HINGE:
                    half = 0.5 * qpos[qadr]
                    sh = jnp.sin(half)
                    qj = (jnp.cos(half), jax_[0] * sh, jax_[1] * sh,
                          jax_[2] * sh)
                    quat = _q_mul(quat, qj)
                    pos = _sub3(anchor_w, _q_rot(quat, jp))
                else:  # SLIDE
                    pos = _add3(pos, _q_rot(quat, _scale3(
                        jax_, qpos[qadr])))
        xpos[b] = pos
        xquat[b] = quat

    # COMs, anchor
    xipos = []
    total_mass = bodyp[0, 17]
    for b in range(1, nbody):
        total_mass = total_mass + bodyp[b, 17]
    for b in range(nbody):
        ip = (bodyp[b, 7], bodyp[b, 8], bodyp[b, 9])
        xipos.append(_add3(xpos[b], _q_rot(xquat[b], ip)))
    inv_mass = 1.0 / jnp.maximum(total_mass, 1e-12)
    anchor = [None] * 3
    for k in range(3):
        acc = bodyp[0, 17] * xipos[0][k]
        for b in range(1, nbody):
            acc = acc + bodyp[b, 17] * xipos[b][k]
        anchor[k] = acc * inv_mass
    anchor = tuple(anchor)

    # ---- cdof (engine._compute_cdof) ----
    cdof = [None] * nv           # each: (ang3, lin3) tuples of (TB,)
    for j in range(njnt):
        t = s.jnt_type[j]
        b = s.jnt_body[j]
        v0 = s.jnt_vadr[j]
        cols = _q_cols(xquat[b])
        arm = _sub3(anchor, xanchor[j]) if t != JointType.SLIDE else None
        if t == JointType.FREE:
            for k in range(3):
                e = [lane(jnp.float32(0.0))] * 3
                e[k] = lane(jnp.float32(1.0))
                cdof[v0 + k] = ((lane(jnp.float32(0.0)),) * 3, tuple(e))
            for k in range(3):
                ax = cols[k]
                cdof[v0 + 3 + k] = (ax, _cross(ax, arm))
        elif t == JointType.HINGE:
            jax_ = (jointp[j, 3], jointp[j, 4], jointp[j, 5])
            ax = _q_rot(xquat[b], jax_)
            cdof[v0] = (ax, _cross(ax, arm))
        else:  # SLIDE
            jax_ = (jointp[j, 3], jointp[j, 4], jointp[j, 5])
            ax = _q_rot(xquat[b], jax_)
            cdof[v0] = ((lane(jnp.float32(0.0)),) * 3, ax)

    # ---- spatial inertias, 10-component form (A sym6, h3, m) ----
    # A = I_w + m ((c.c)E - c c^T), h = m c, about the anchor
    # I_w = R_i diag(I) R_i^T with R_i = R_body @ R(body_iquat)
    inert = []
    for b in range(nbody):
        mass = bodyp[b, 17]
        iq = (bodyp[b, 10], bodyp[b, 11], bodyp[b, 12], bodyp[b, 13])
        I3 = (bodyp[b, 14], bodyp[b, 15], bodyp[b, 16])
        qi = _q_mul(xquat[b], tuple(lane(c) for c in iq))
        r0, r1, r2 = _q_cols(qi)
        # I_w components (sym): sum_k I_k r_k r_k^T
        Ixx = I3[0] * r0[0] * r0[0] + I3[1] * r1[0] * r1[0] \
            + I3[2] * r2[0] * r2[0]
        Iyy = I3[0] * r0[1] * r0[1] + I3[1] * r1[1] * r1[1] \
            + I3[2] * r2[1] * r2[1]
        Izz = I3[0] * r0[2] * r0[2] + I3[1] * r1[2] * r1[2] \
            + I3[2] * r2[2] * r2[2]
        Ixy = I3[0] * r0[0] * r0[1] + I3[1] * r1[0] * r1[1] \
            + I3[2] * r2[0] * r2[1]
        Ixz = I3[0] * r0[0] * r0[2] + I3[1] * r1[0] * r1[2] \
            + I3[2] * r2[0] * r2[2]
        Iyz = I3[0] * r0[1] * r0[2] + I3[1] * r1[1] * r1[2] \
            + I3[2] * r2[1] * r2[2]
        c = _sub3(xipos[b], anchor)
        cc = _dot3(c, c)
        A = (Ixx + mass * (cc - c[0] * c[0]),
             Iyy + mass * (cc - c[1] * c[1]),
             Izz + mass * (cc - c[2] * c[2]),
             Ixy - mass * c[0] * c[1],
             Ixz - mass * c[0] * c[2],
             Iyz - mass * c[1] * c[2])
        h = _scale3(c, mass)
        inert.append((A, h, mass))

    def I_apply(I10, S):
        """cinert @ [w; v] for the 10-component spatial inertia."""
        A, h, mass = I10
        w, v = S
        ang = (A[0] * w[0] + A[3] * w[1] + A[4] * w[2],
               A[3] * w[0] + A[1] * w[1] + A[5] * w[2],
               A[4] * w[0] + A[5] * w[1] + A[2] * w[2])
        ang = _add3(ang, _cross(h, v))
        lin = _sub3(_scale3(v, mass), _cross(h, w))
        return (ang, lin)

    def I_add(a, b):
        return (tuple(x + y for x, y in zip(a[0], b[0])),
                _add3(a[1], b[1]), a[2] + b[2])

    # ---- CRB mass matrix via composite inertias ----
    Ic = list(inert)
    for b in range(nbody - 1, 0, -1):
        p = s.body_parent[b]
        if p >= 0:
            Ic[p] = I_add(Ic[p], Ic[b])

    chain_dofs = [tuple(int(v) for v in np.nonzero(
        np.asarray(s.body_dof[b]))[0]) for b in range(nbody)]
    dof_body = [None] * nv
    for j in range(njnt):
        nvj = {JointType.FREE: 6}.get(s.jnt_type[j], 1)
        for k in range(s.jnt_vadr[j], s.jnt_vadr[j] + nvj):
            dof_body[k] = s.jnt_body[j]

    Ment = [[None] * nv for _ in range(nv)]
    for w in range(nv):
        bw = dof_body[w]
        F = I_apply(Ic[bw], cdof[w])
        for u in chain_dofs[bw]:
            if u > w:
                continue
            val = _dot3(cdof[u][0], F[0]) + _dot3(cdof[u][1], F[1])
            Ment[u][w] = val
            Ment[w][u] = val
    for v in range(nv):
        Ment[v][v] = Ment[v][v] + dofp[v, 0]       # armature
        for u in range(nv):
            if Ment[v][u] is None:
                Ment[v][u] = lane(jnp.float32(0.0))

    # ---- velocities (engine.fwd_velocity) ----
    zero3 = (lane(jnp.float32(0.0)),) * 3
    cvel = [None] * nbody
    for b in range(nbody):
        p = s.body_parent[b]
        v6 = (zero3, zero3) if p < 0 else cvel[p]
        for j in s.body_joints[b]:
            nvj = {JointType.FREE: 6}.get(s.jnt_type[j], 1)
            for k in range(s.jnt_vadr[j], s.jnt_vadr[j] + nvj):
                qv = qvel[k]
                v6 = (_add3(v6[0], _scale3(cdof[k][0], qv)),
                      _add3(v6[1], _scale3(cdof[k][1], qv)))
        cvel[b] = v6

    def motion_cross(v6, m6):
        ang = _cross(v6[0], m6[0])
        lin = _add3(_cross(v6[1], m6[0]), _cross(v6[0], m6[1]))
        return (ang, lin)

    def force_cross(v6, f6):
        ang = _add3(_cross(v6[0], f6[0]), _cross(v6[1], f6[1]))
        lin = _cross(v6[0], f6[1])
        return (ang, lin)

    cdof_dot = [None] * nv
    for j in range(njnt):
        b = s.jnt_body[j]
        v0 = s.jnt_vadr[j]
        t = s.jnt_type[j]
        nvj = {JointType.FREE: 6}.get(t, 1)
        for k in range(v0, v0 + nvj):
            if t == JointType.FREE and k < v0 + 3:
                cdof_dot[k] = (zero3, zero3)
            else:
                cdof_dot[k] = motion_cross(cvel[b], cdof[k])

    # ---- RNEA bias (gravity trick, qacc = 0) ----
    a0 = (zero3, (lane(-gx_), lane(-gy_), lane(-gz_)))
    cacc = [None] * nbody
    for b in range(nbody):
        p = s.body_parent[b]
        a6 = a0 if p < 0 else cacc[p]
        for j in s.body_joints[b]:
            nvj = {JointType.FREE: 6}.get(s.jnt_type[j], 1)
            for k in range(s.jnt_vadr[j], s.jnt_vadr[j] + nvj):
                qv = qvel[k]
                a6 = (_add3(a6[0], _scale3(cdof_dot[k][0], qv)),
                      _add3(a6[1], _scale3(cdof_dot[k][1], qv)))
        cacc[b] = a6

    fbody = []
    for b in range(nbody):
        Iv = I_apply(inert[b], cvel[b])
        f6 = I_apply(inert[b], cacc[b])
        fc = force_cross(cvel[b], Iv)
        fbody.append((_add3(f6[0], fc[0]), _add3(f6[1], fc[1])))
    fs = list(fbody)
    for b in range(nbody - 1, 0, -1):
        p = s.body_parent[b]
        if p >= 0:
            fs[p] = (_add3(fs[p][0], fs[b][0]), _add3(fs[p][1], fs[b][1]))
    bias = [(_dot3(cdof[k][0], fs[dof_body[k]][0])
             + _dot3(cdof[k][1], fs[dof_body[k]][1])) for k in range(nv)]

    # ---- actuation (engine.actuation + step._actuator_force) ----
    tau = [lane(jnp.float32(0.0)) for _ in range(nv)]
    actf = []
    for a in range(nu):
        j = s.act_jnt[a]
        qadr, vadr = s.jnt_qadr[j], s.jnt_vadr[j]
        c = jnp.clip(ctrl[a], actp[a, 3], actp[a, 4])
        if s.act_type[a] == ActuatorType.MOTOR:
            force = c
        else:  # POSITION
            force = actp[a, 1] * (c - qpos[qadr]) - actp[a, 2] * qvel[vadr]
        force = jnp.clip(force, actp[a, 5], actp[a, 6])
        tau[vadr] = tau[vadr] + actp[a, 0] * force
        actf.append(actp[a, 0] * force)

    # ---- passive (engine.passive_force) ----
    qfrc_p = [-dofp[k, 1] * qvel[k] for k in range(nv)]
    for j in range(njnt):
        t = s.jnt_type[j]
        qadr, vadr = s.jnt_qadr[j], s.jnt_vadr[j]
        stiff = jointp[j, 6]
        if t in (JointType.HINGE, JointType.SLIDE):
            qfrc_p[vadr] = qfrc_p[vadr] - stiff * (qpos[qadr]
                                                   - qspr[qadr, 0])
        elif t == JointType.FREE:
            for k in range(3):
                qfrc_p[vadr + k] = qfrc_p[vadr + k] - stiff * (
                    qpos[qadr + k] - qspr[qadr + k, 0])
            # the ROTATIONAL free spring (-k * quat_sub(q, q_spring))
            # needs quat_log's atan2, which Mosaic does not lower —
            # smooth_batched adds that term in XLA (3 values per env,
            # one tiny fusion)

    qfs = [tau[k] + qfrc_p[k] - bias[k] for k in range(nv)]

    # ---- external wrenches (engine.xfrc_to_qfrc) ----
    if has_xfrc:
        xw = xfrc_ref[...]       # (nbody*6, TB) [force3; torque3] rows
        ws = []
        for b in range(nbody):
            f3 = (xw[6 * b], xw[6 * b + 1], xw[6 * b + 2])
            t3 = (xw[6 * b + 3], xw[6 * b + 4], xw[6 * b + 5])
            ang = _add3(t3, _cross(_sub3(xipos[b], anchor), f3))
            ws.append((ang, f3))
        for b in range(nbody - 1, 0, -1):
            p = s.body_parent[b]
            if p >= 0:
                ws[p] = (_add3(ws[p][0], ws[b][0]),
                         _add3(ws[p][1], ws[b][1]))
        for k in range(nv):
            w6 = ws[dof_body[k]]
            qfs[k] = qfs[k] + _dot3(cdof[k][0], w6[0]) \
                + _dot3(cdof[k][1], w6[1])

    # ---- collision: sphere centers ----
    centers = []
    for i in range(nsph):
        b = s.sph_body[i]
        sp = (sphp[i, 0], sphp[i, 1], sphp[i, 2])
        centers.append(_add3(xpos[b], _q_rot(xquat[b], sp)))

    slots_pos = []
    slots_nrm = []
    slots_dist = []
    slots_mu = []            # (fr, tor, roll)

    # sphere-vs-floor slots, vectorized across spheres in sublanes
    cx = jnp.stack([centers[i][0] for i in range(nsph)])
    cy = jnp.stack([centers[i][1] for i in range(nsph)])
    cz = jnp.stack([centers[i][2] for i in range(nsph)])
    nr, nc = s.nhrow, s.nhcol
    if s.has_floor:
        def hquery(px, py):
            """hfield_height on (nsph, TB) queries — exact tent mirror."""
            gx = (px + hhx) / (2 * hhx) * (nc - 1)
            gy = (py + hhy) / (2 * hhy) * (nr - 1)
            gx = jnp.clip(gx, 0.0, nc - 1.000001)
            gy = jnp.clip(gy, 0.0, nr - 1.000001)
            h = None
            for col in range(nc):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(gx - col))
                hrow = None
                for row in range(nr):
                    wy = jnp.maximum(0.0, 1.0 - jnp.abs(gy - row))
                    t = wy * H[row, col]
                    hrow = t if hrow is None else hrow + t
                t = hrow * wx
                h = t if h is None else h + t
            return floor_z + h

        eps = 1e-3
        h0 = hquery(cx, cy)
        hpx = hquery(cx + eps, cy)
        hmx = hquery(cx - eps, cy)
        hpy = hquery(cx, cy + eps)
        hmy = hquery(cx, cy - eps)
        n_x = -(hpx - hmx) / (2 * eps)
        n_y = -(hpy - hmy) / (2 * eps)
        n_z = jnp.ones_like(n_x)
        ninv = 1.0 / jnp.sqrt(n_x * n_x + n_y * n_y + n_z * n_z)
        n_x, n_y, n_z = n_x * ninv, n_y * ninv, n_z * ninv
        for i in range(nsph):
            rad = sphp[i, 3]
            dist_raw = cz[i] - rad - h0[i]
            n = (n_x[i], n_y[i], n_z[i])
            pos = _sub3(centers[i], _scale3(n, rad + 0.5 * dist_raw))
            # static floor gate (collide: dist -> 1e9, pos/n unchanged)
            dist = dist_raw if s.sph_floor[i] else \
                lane(jnp.float32(1e9)) + 0.0 * dist_raw
            slots_pos.append(pos)
            slots_nrm.append(n)
            slots_dist.append(dist)
            slots_mu.append((jnp.maximum(sphp[i, 4], floor_fr),
                             jnp.maximum(sphp[i, 5], floor_tor),
                             jnp.maximum(sphp[i, 6], floor_roll)))
    else:
        for i in range(nsph):
            slots_pos.append(centers[i])
            slots_nrm.append((lane(jnp.float32(0.0)),
                              lane(jnp.float32(0.0)),
                              lane(jnp.float32(1.0))))
            slots_dist.append(lane(jnp.float32(1e9)))
            slots_mu.append((lane(sphp[i, 4]), lane(sphp[i, 5]),
                             lane(sphp[i, 6])))

    # sphere-sphere pairs (exact mirror of collide's pair block)
    for (ia, ib) in zip(s.pair_a or (), s.pair_b or ()):
        ca, cb = centers[ia], centers[ib]
        delta = _sub3(cb, ca)
        dnorm = jnp.sqrt(delta[0] ** 2 + delta[1] ** 2 + delta[2] ** 2)
        inv = 1.0 / jnp.maximum(dnorm, 1e-9)
        n = _scale3(delta, inv)
        ra, rb = sphp[ia, 3], sphp[ib, 3]
        dist = dnorm - (ra + rb)
        pos = _add3(ca, _scale3(n, ra + 0.5 * dist))
        slots_pos.append(pos)
        slots_nrm.append(n)
        slots_dist.append(dist)
        slots_mu.append((jnp.maximum(sphp[ia, 4], sphp[ib, 4]),
                         jnp.maximum(sphp[ia, 5], sphp[ib, 5]),
                         jnp.maximum(sphp[ia, 6], sphp[ib, 6])))

    K = len(slots_dist)
    dist = jnp.stack(slots_dist)                      # (K, TB)
    dcon = _impedance(-dist, so_dmin, so_dmax, so_w)
    kcon, bcon = _kb(so_tc, so_dr, so_dmax, dcon, dt_s)
    bcon = jnp.broadcast_to(jnp.reshape(bcon, (1, -1)), (K, TB))

    # ---- joint limit rows (solver.limit_rows_data order) ----
    lpos_rows = []
    for j in range(njnt):
        if not s.jnt_limited[j]:
            continue
        if s.jnt_type[j] not in (JointType.HINGE, JointType.SLIDE):
            continue
        qadr = s.jnt_qadr[j]
        lo, hi, mg = jointp[j, 7], jointp[j, 8], jointp[j, 9]
        lpos_rows.append(qpos[qadr] - lo - mg)
        lpos_rows.append(hi - mg - qpos[qadr])
    nlim = len(lpos_rows)
    if nlim:
        lpos = jnp.stack(lpos_rows)
        dlim = _impedance(-lpos, li_dmin, li_dmax, li_w)
        klim, blim = _kb(li_tc, li_dr, li_dmax, dlim, dt_s)
        blim = jnp.broadcast_to(jnp.reshape(blim, (1, -1)), (nlim, TB))
        limd_ref[...] = jnp.stack([lpos, klim, blim, dlim])
    else:
        limd_ref[...] = jnp.zeros_like(limd_ref)

    # ---- outputs ----
    M_ref[...] = jnp.stack([jnp.stack(row) for row in Ment])
    qfs_ref[...] = jnp.stack(qfs)
    cdof_ref[...] = jnp.stack([
        jnp.stack(list(cdof[k][0]) + list(cdof[k][1])) for k in range(nv)])
    rel_ref[...] = jnp.stack([
        jnp.stack([slots_pos[c][k] - anchor[k] for c in range(K)])
        for k in range(3)])
    nrm_ref[...] = jnp.stack([
        jnp.stack([slots_nrm[c][k] for c in range(K)]) for k in range(3)])
    mu3_ref[...] = jnp.stack([
        jnp.stack([slots_mu[c][k] + 0.0 * dist[c] for c in range(K)])
        for k in range(3)])
    ckbd_ref[...] = jnp.stack([dist, kcon, bcon, dcon])

    # info pack: [xpos3 | xquat4 | xipos3 | body_com_vel3] per body
    bcv = []
    for b in range(nbody):
        r = _sub3(xipos[b], anchor)
        bcv.append(_add3(cvel[b][1], _cross(cvel[b][0], r)))
    rows = []
    for b in range(nbody):
        rows.append(jnp.stack(
            list(xpos[b]) + list(xquat[b]) + list(xipos[b])
            + list(bcv[b])))
    ipack_ref[...] = jnp.stack(rows)

    if nsite:
        srows = []
        for i in range(nsite):
            b = s.site_body[i]
            sp = (sitep[i, 0], sitep[i, 1], sitep[i, 2])
            srows.append(jnp.stack(list(
                _add3(xpos[b], _q_rot(xquat[b], sp)))))
        sitex_ref[...] = jnp.stack(srows)
    else:
        sitex_ref[...] = jnp.zeros_like(sitex_ref)

    # whole-model COM velocity
    cv = [None] * 3
    for k in range(3):
        acc = bodyp[0, 17] * bcv[0][k]
        for b in range(1, nbody):
            acc = acc + bodyp[b, 17] * bcv[b][k]
        cv[k] = acc * inv_mass
    vec6_ref[...] = jnp.stack([anchor[0], anchor[1], anchor[2],
                               cv[0], cv[1], cv[2]])

    if nu:
        actf_ref[...] = jnp.stack(actf)
    else:
        actf_ref[...] = jnp.zeros_like(actf_ref)


# ---------------------------------------------------------------------------
# host-side plumbing
# ---------------------------------------------------------------------------

def _pack_params(m: Model):
    """Pack model float leaves into the kernel's broadcast blocks."""
    s = m.struct
    f32 = jnp.float32
    bodyp = jnp.concatenate([
        m.body_pos.astype(f32), m.body_quat.astype(f32),
        m.body_ipos.astype(f32), m.body_iquat.astype(f32),
        m.body_inertia.astype(f32), m.body_mass.astype(f32)[:, None],
    ], axis=-1)                                           # (nbody, 18)
    jointp = jnp.concatenate([
        m.jnt_pos.astype(f32), m.jnt_axis.astype(f32),
        m.jnt_stiffness.astype(f32)[:, None],
        m.jnt_range.astype(f32), m.jnt_margin.astype(f32)[:, None],
    ], axis=-1)                                           # (njnt, 10)
    dofp = jnp.stack([m.dof_armature.astype(f32),
                      m.dof_damping.astype(f32)], axis=-1)  # (nv, 2)
    qspr = m.qpos_spring.astype(f32)[:, None]             # (nq, 1)
    if s.nu:
        actp = jnp.concatenate([
            m.act_gear.astype(f32)[:, None], m.act_kp.astype(f32)[:, None],
            m.act_kv.astype(f32)[:, None], m.act_ctrlrange.astype(f32),
            m.act_forcerange.astype(f32)], axis=-1)       # (nu, 7)
    else:
        actp = jnp.zeros((1, 7), f32)
    sphp = jnp.concatenate([
        m.sph_pos.astype(f32), m.sph_radius.astype(f32)[:, None],
        m.sph_friction.astype(f32)[:, None],
        m.sph_friction_tor.astype(f32)[:, None],
        m.sph_friction_roll.astype(f32)[:, None]], axis=-1)  # (nsph, 7)
    nsite = len(s.site_names)
    sitep = (m.site_pos.astype(f32) if nsite
             else jnp.zeros((1, 3), f32))
    misc = jnp.stack([
        m.gravity[0], m.gravity[1], m.gravity[2],
        m.floor_z, m.floor_friction, m.floor_friction_tor,
        m.floor_friction_roll,
        m.hfield_halfsize[0], m.hfield_halfsize[1],
        m.solref[0], m.solref[1],
        m.solimp[0], m.solimp[1], m.solimp[2],
        m.limit_solref[0], m.limit_solref[1],
        m.limit_solimp[0], m.limit_solimp[1], m.limit_solimp[2],
        m.dt,
    ]).astype(f32)[:, None]                               # (_NMISC, 1)
    hf = m.hfield_data.astype(f32)
    return (bodyp, jointp, dofp, qspr, actp, sphp, sitep, misc, hf)


def _num_limit_rows(s) -> int:
    n = 0
    for j in range(s.njnt):
        if s.jnt_limited[j] and s.jnt_type[j] in (JointType.HINGE,
                                                  JointType.SLIDE):
            n += 2
    return n


def smooth_batched(struct, qpos, qvel, ctrl, xfrc, params,
                   params_batched=None, interpret: bool = False):
    """Batched fused smooth stage. qpos (B, nq), qvel (B, nv),
    ctrl (B, nu), xfrc (B, nbody, 6) or None; params from _pack_params.
    `params_batched`: per-param bools — True marks a param array with a
    LEADING batch dim (B, ...) (per-env domain-randomized model leaves,
    the RL ModelPatch path); those stream per-lane, the rest broadcast.
    Returns batch-leading:
      (M, qfs, cdof, rel, nrm, dist, mu3, kc, bc, dc, lpos, kl, bl, dl,
       xpos, xquat, xipos, bcv, site_xpos, anchor, com_vel, actf)
    """
    s = struct
    B = qpos.shape[0]
    nv, nq, nu = s.nv, s.nq, s.nu
    nbody = s.nbody
    nsite = len(s.site_names)
    K = s.nsph + s.npair
    nlim = _num_limit_rows(s)
    dtype = jnp.float32
    Bp = pl.cdiv(B, _TB) * _TB
    pad = Bp - B
    has_xfrc = xfrc is not None
    if params_batched is None:
        params_batched = (False,) * len(params)

    def prep(x):
        """(B, ...) -> (..., Bp) lane-last."""
        x = jnp.transpose(x.astype(dtype),
                          tuple(range(1, x.ndim)) + (0,))
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return x

    qpost = prep(qpos)
    qvelt = prep(qvel)
    ctrlt = prep(ctrl) if nu else jnp.zeros((1, Bp), dtype)
    if has_xfrc:
        xfrct = prep(xfrc.reshape(B, nbody * 6))
    else:
        xfrct = jnp.zeros((1, Bp), dtype)

    kern = functools.partial(_smooth_kernel, s=s, has_xfrc=has_xfrc)

    def vspec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape + (_TB,),
                            lambda i, nd=nd: (0,) * nd + (i,),
                            memory_space=pltpu.VMEM)

    def pspec(arr):
        shp = tuple(arr.shape)
        return pl.BlockSpec(shp, lambda i, n=len(shp): (0,) * n,
                            memory_space=pltpu.VMEM)

    params = tuple(prep(p.astype(dtype)) if pb else p
                   for p, pb in zip(params, params_batched))
    param_specs = [vspec(*p.shape[:-1]) if pb else pspec(p)
                   for p, pb in zip(params, params_batched)]

    nlim_o = max(nlim, 1)
    out_shape = [
        jax.ShapeDtypeStruct((nv, nv, Bp), dtype),    # M
        jax.ShapeDtypeStruct((nv, Bp), dtype),        # qfrc_smooth
        jax.ShapeDtypeStruct((nv, 6, Bp), dtype),     # cdof
        jax.ShapeDtypeStruct((3, K, Bp), dtype),      # rel
        jax.ShapeDtypeStruct((3, K, Bp), dtype),      # nrm
        jax.ShapeDtypeStruct((3, K, Bp), dtype),      # mu3
        jax.ShapeDtypeStruct((4, K, Bp), dtype),      # dist,k,b,d
        jax.ShapeDtypeStruct((4, nlim_o, Bp), dtype),  # lim pos,k,b,d
        jax.ShapeDtypeStruct((nbody, 13, Bp), dtype),  # info pack
        jax.ShapeDtypeStruct((max(nsite, 1), 3, Bp), dtype),  # sites
        jax.ShapeDtypeStruct((6, Bp), dtype),         # anchor, com_vel
        jax.ShapeDtypeStruct((max(nu, 1), Bp), dtype),  # actuator force
    ]
    outs = pl.pallas_call(
        kern,
        grid=(Bp // _TB,),
        in_specs=[vspec(nq), vspec(nv), vspec(ctrlt.shape[0]),
                  vspec(xfrct.shape[0])] + param_specs,
        out_specs=[vspec(nv, nv), vspec(nv), vspec(nv, 6),
                   vspec(3, K), vspec(3, K), vspec(3, K), vspec(4, K),
                   vspec(4, nlim_o), vspec(nbody, 13),
                   vspec(max(nsite, 1), 3), vspec(6),
                   vspec(max(nu, 1))],
        out_shape=out_shape,
        interpret=interpret,
    )(qpost, qvelt, ctrlt, xfrct, *params)

    def unprep(x):
        return jnp.transpose(x[..., :B], (x.ndim - 1,)
                             + tuple(range(x.ndim - 1)))

    (Mt, qfst, cdoft, relt, nrmt, mut, ckbd, limd, ipack, sitex,
     vec6, actf) = outs
    M = unprep(Mt)
    qfs = unprep(qfst)
    # free-joint ROTATIONAL spring: quat_log's atan2 has no Mosaic
    # lowering, so this one passive term lands here in XLA (exact
    # engine.passive_force arithmetic, pm.quat_sub)
    from . import math as pm
    jointp, qspr = params[1], params[3]
    for j in range(s.njnt):
        if s.jnt_type[j] != JointType.FREE:
            continue
        qadr, vadr = s.jnt_qadr[j], s.jnt_vadr[j]
        # params here are in KERNEL layout: lane-last when batched
        if params_batched[1]:
            stiff = jointp[j, 6, :B][:, None]              # (B, 1)
        else:
            stiff = jointp[j, 6]
        if params_batched[3]:
            qs = jnp.transpose(qspr[qadr + 3:qadr + 7, 0, :B])
        else:
            qs = jnp.broadcast_to(qspr[qadr + 3:qadr + 7, 0], (B, 4))
        qj = qpos[:, qadr + 3:qadr + 7].astype(dtype)
        dif = pm.quat_sub(qj, qs)
        qfs = qfs.at[:, vadr + 3:vadr + 6].add(-stiff * dif)
    cdof = unprep(cdoft)
    rel = jnp.transpose(relt[..., :B], (2, 1, 0))      # (B, K, 3)
    nrm = jnp.transpose(nrmt[..., :B], (2, 1, 0))
    mu3 = jnp.transpose(mut[..., :B], (2, 1, 0))
    ckbd = unprep(ckbd)                                # (B, 4, K)
    dist, kc, bc, dc = (ckbd[:, 0], ckbd[:, 1], ckbd[:, 2], ckbd[:, 3])
    limd = unprep(limd)[:, :, :nlim] if nlim else \
        jnp.zeros((B, 4, 0), dtype)
    lpos, kl, bl, dl = (limd[:, 0], limd[:, 1], limd[:, 2], limd[:, 3])
    ipack = unprep(ipack)                              # (B, nbody, 13)
    xpos = ipack[..., 0:3]
    xquat = ipack[..., 3:7]
    xipos = ipack[..., 7:10]
    bcv = ipack[..., 10:13]
    site_xpos = (unprep(sitex) if nsite
                 else jnp.zeros((B, 0, 3), dtype))
    vec6 = unprep(vec6)
    anchor, com_vel = vec6[:, 0:3], vec6[:, 3:6]
    actf = unprep(actf) if nu else jnp.zeros((B, 0), dtype)
    return (M, qfs, cdof, rel, nrm, dist, mu3, kc, bc, dc,
            lpos, kl, bl, dl, xpos, xquat, xipos, bcv, site_xpos,
            anchor, com_vel, actf)


def jax_smooth_single(m: Model, qpos, qvel, ctrl, xfrc=None):
    """Pure-JAX oracle/fallback: exactly the step._prepare_smooth +
    solver.contact_raw + solver.limit_rows_data pipeline (selection-free),
    returning the same tuple as the kernel path (unbatched)."""
    from .engine import body_com_velocities
    from .model import State
    from .solver import contact_raw, limit_rows_data
    from .step import _actuator_force, _prepare_smooth
    state = State(qpos=qpos, qvel=qvel,
                  time=jnp.zeros((), qpos.dtype))
    kin, vel, M, qfs, contacts_full, _c, _sel = _prepare_smooth(
        m, state, ctrl, xfrc)
    contacts = contacts_full                       # selection-free gate
    _dmask, rel, mu3, kc, bc, dc = contact_raw(m, kin, contacts, None)
    lpos, kl, bl, dl = limit_rows_data(m, qpos)
    bcv = body_com_velocities(kin, vel)
    actf = _actuator_force(m, qpos, qvel, ctrl, qpos.dtype)
    return (M, qfs, kin.cdof, rel, contacts.normal, contacts.dist, mu3,
            kc, bc, dc, lpos, kl, bl, dl, kin.xpos, kin.xquat, kin.xipos,
            bcv, kin.site_xpos, kin.anchor, vel.com_vel, actf)


_DISPATCH_CACHE = {}


def _make_dispatch(m: Model, has_xfrc: bool):
    key = (id(m.struct), has_xfrc)
    hit = _DISPATCH_CACHE.get(key)
    if hit is not None and hit[0] is m.struct:
        return hit[1]
    struct = m.struct
    nparams = 9

    @jax.custom_batching.custom_vmap
    def fused(qpos, qvel, ctrl, xfrc, *params):
        outs = smooth_batched(
            struct, qpos[None], qvel[None], ctrl[None],
            xfrc[None] if has_xfrc else None, params)
        return tuple(o[0] for o in outs)

    @fused.def_vmap
    def _rule(axis_size, in_batched, *args):
        qpos, qvel, ctrl, xfrc = args[:4]
        params = args[4:]
        params_batched = tuple(in_batched[4:])

        def bcast(a, ib):
            return a if ib else jnp.broadcast_to(
                a[None], (axis_size,) + jnp.shape(a))

        qpos = bcast(qpos, in_batched[0])
        qvel = bcast(qvel, in_batched[1])
        ctrl = bcast(ctrl, in_batched[2])
        xfrc = bcast(xfrc, in_batched[3]) if has_xfrc else xfrc
        # per-env-batched params (RL ModelPatch domain randomization)
        # stream per-lane; shared params stay broadcast VMEM blocks
        outs = smooth_batched(struct, qpos, qvel, ctrl,
                              xfrc if has_xfrc else None, params,
                              params_batched=params_batched)
        return outs, tuple(True for _ in range(22))

    _DISPATCH_CACHE[key] = (struct, fused)
    return fused


def _model_is_batched(m: Model) -> bool:
    """True when any model float leaf is a vmap batch tracer (the RL
    env's per-env ModelPatch leaves). The kernel serves this case too
    (per-lane param streaming via the custom_vmap rule); step.py keeps
    the flag to pick solve_step_raw's per-env dmask handling."""
    try:
        from jax._src.interpreters.batching import BatchTracer
    except ImportError:                                # pragma: no cover
        BatchTracer = None
    for leaf in jax.tree.leaves(m):
        if BatchTracer is not None:
            if isinstance(leaf, BatchTracer):
                return True
        elif (isinstance(leaf, jax.core.Tracer)
              and type(leaf).__name__ == "BatchTracer"):
            return True
    return False


def smooth_raw(m: Model, qpos, qvel, ctrl, xfrc=None):
    """Public entry: the smooth stage + raw contact/limit rows as one
    fused TPU kernel (JAX fallback elsewhere). Output layouts match
    solve_step_raw's inputs; see smooth_batched for the tuple."""
    if not (enabled() and supported(m) and qpos.dtype == jnp.float32):
        return jax_smooth_single(m, qpos, qvel, ctrl, xfrc)
    params = _pack_params(m)
    has_xfrc = xfrc is not None
    fused = _make_dispatch(m, has_xfrc)
    if has_xfrc:
        return fused(qpos, qvel, ctrl, xfrc, *params)
    dummy = jnp.zeros((1,), jnp.float32)
    return fused(qpos, qvel, ctrl, dummy, *params)
