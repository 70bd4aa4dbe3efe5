"""Constraint assembly + Newton solver for contact/limit forces.

TPU-native re-design of MuJoCo's constraint pipeline (the part of mj_step
the reference leans on for foot-ground contact and joint limits):

  * soft-constraint model: per-row reference acceleration
        aref = -b * vel - k * imp(violation) * pos
    with (k, b) from solref = [timeconst, dampratio] and imp from
    solimp = [dmin, dmax, width] — same parameterization the reference's
    XML uses (world.xml:19-22).
  * friction: pyramidal cones — each condim-3 contact contributes 4
    unilateral rows  J_n ± mu J_t1,  J_n ± mu J_t2 — so EVERY constraint
    is a scalar inequality and the whole problem becomes the smooth
    convex program MuJoCo's Newton solver minimizes:
        min_x 0.5 |x - a_smooth|^2_M + sum_i 0.5 D_i [r_i < 0] r_i^2,
        r_i = J_i x - aref_i,  D_i = 1 / R_i,  R_i = (1-d)/d * diag(A)_i
  * solved by damped Newton with exact-ish linesearch (bisection on the
    monotone directional derivative of the convex objective). Fixed
    iteration counts, one 18x18 Cholesky per iteration — everything
    vectorizes across thousands of lockstep rollouts; no per-contact
    sequential sweeps (vs PGS) and no dynamic active sets.

Rows for far-away contact slots get huge positive `pos`, hence very
negative aref, hence are never active — fixed capacity without masking.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import linalg

_HI = jax.lax.Precision.HIGHEST
from .collision import Contacts, tangent_frame
from .engine import Kin
from .model import JointType, Model


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Efc:
    """Assembled constraint rows (the mjData.efc_* analog)."""

    J: jax.Array      # (ne, nv)
    aref: jax.Array   # (ne,)
    D: jax.Array      # (ne,) penalty weight = 1/R
    pos: jax.Array    # (ne,) signed constraint distance (for reporting)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Rows:
    """Raw constraint rows before the mass-matrix-dependent finish.

    The fused TPU kernel (pallas_solver) consumes these directly and
    derives aref / D internally; the JAX path finishes them into Efc.
    Per row: aref = -b * (J @ qvel) - k * d * pos, and
    D = 1 / (max((1-d)/d, eps) * diag(J M^-1 J^T)).
    """

    J: jax.Array      # (ne, nv)
    pos: jax.Array    # (ne,)
    k: jax.Array      # (ne,) stiffness
    b: jax.Array      # (ne,) damping
    d: jax.Array      # (ne,) impedance


def impedance(solimp: jax.Array, violation: jax.Array) -> jax.Array:
    """MuJoCo solimp sigmoid (power 2, midpoint 0.5): dmin -> dmax."""
    dmin, dmax, width = solimp[0], solimp[1], solimp[2]
    x = jnp.clip(violation / jnp.maximum(width, 1e-9), 0.0, 1.0)
    y = jnp.where(x < 0.5, 2.0 * x * x, 1.0 - 2.0 * (1.0 - x) ** 2)
    return dmin + y * (dmax - dmin)


def _kb(solref: jax.Array, solimp: jax.Array, d: jax.Array, dt=None):
    tc, dr = solref[0], solref[1]
    if dt is not None:
        # stability clamp: timeconst >= 2*timestep (mj_makeConstraint does
        # the same) — required when planning at coarse timesteps (the
        # reference plans at 0.02 s with solref timeconst 0.015, task.xml:13)
        tc = jnp.maximum(tc, 2.0 * dt)
    dmax = solimp[1]
    b = 2.0 / jnp.maximum(dmax * tc, 1e-9)
    k = d / jnp.maximum(dmax * dmax * tc * tc * dr * dr, 1e-12)
    return k, b


def make_rows(m: Model, kin: Kin, qpos: jax.Array, qvel: jax.Array,
              contacts: Contacts, sel: jax.Array | None = None) -> Rows:
    """Build raw constraint rows: joint limits then contact pyramid edges.

    `contacts` may be the full fixed-capacity set or a top-k reduced set
    from collision.select_contacts; in the latter case `sel` carries the
    original slot indices so the static per-slot body tables are gathered
    to match.
    """
    s = m.struct
    dtype = qpos.dtype
    nv = s.nv
    rows_J, rows_pos, rows_d = [], [], []

    # ---- joint limits: 2 rows per limited scalar joint ----
    eye = jnp.eye(nv, dtype=dtype)
    for j in range(s.njnt):
        if not s.jnt_limited[j]:
            continue
        if s.jnt_type[j] not in (JointType.HINGE, JointType.SLIDE):
            continue
        qadr, vadr = s.jnt_qadr[j], s.jnt_vadr[j]
        lo, hi = m.jnt_range[j, 0], m.jnt_range[j, 1]
        mg = m.jnt_margin[j]
        for sign, dist in ((1.0, qpos[qadr] - lo - mg),
                           (-1.0, hi - mg - qpos[qadr])):
            rows_J.append(sign * eye[vadr])
            rows_pos.append(dist)
            d = impedance(m.limit_solimp, -dist)
            rows_d.append(d)

    # ---- fixed-tendon limits: 2 rows per tendon (the humanoid
    # hamstrings, humanoid.xml.patch tendon block) ----
    for tnd in range(s.ntendon):
        jnts = s.tendon_jnt[tnd]
        coefs = s.tendon_coef[tnd]
        Jrow = sum(c * eye[s.jnt_vadr[j]] for j, c in zip(jnts, coefs))
        length = sum(c * qpos[s.jnt_qadr[j]] for j, c in zip(jnts, coefs))
        lo, hi = m.tendon_range[tnd, 0], m.tendon_range[tnd, 1]
        for sign, dist in ((1.0, length - lo), (-1.0, hi - length)):
            rows_J.append(sign * Jrow)
            rows_pos.append(dist)
            rows_d.append(impedance(m.limit_solimp, -dist))

    nlimit = len(rows_J)

    # ---- contacts: 4 pyramid rows each ----
    ncon = contacts.dist.shape[0]
    if ncon:
        # translational Jacobian of the contact point for both bodies
        # J_point col i = cdof_lin_i + cdof_ang_i x (p - anchor), masked
        # to each side's chain via the STATIC slot tables
        # (Structure.slot_body_a/b, canonical order of collision.collide;
        # floor slots have a = -1 = world side fixed)
        import numpy as np
        body_dof = s.body_dof                             # (nbody, nv) uint8
        zero_row = np.zeros(nv, dtype=np.float64)
        tab_a = np.stack([body_dof[b] if b >= 0 else zero_row
                          for b in s.slot_body_a])        # (ncon_full, nv)
        tab_b = np.stack([body_dof[b] if b >= 0 else zero_row
                          for b in s.slot_body_b])
        mask_a = jnp.asarray(tab_a, dtype=dtype)
        mask_b = jnp.asarray(tab_b, dtype=dtype)
        if sel is not None:
            mask_a = mask_a[sel]                          # (ncon, nv)
            mask_b = mask_b[sel]
        rel = contacts.pos - kin.anchor                   # (ncon, 3)
        # lin velocity jacobian of the point for every dof: (ncon, nv, 3)
        jac_pt = (kin.cdof[None, :, 3:]
                  + jnp.cross(kin.cdof[None, :, :3], rel[:, None, :]))
        dmask = (mask_b - mask_a)[:, :, None]
        jac = dmask * jac_pt                              # (ncon, nv, 3)
        # relative ANGULAR jacobian for torsional/rolling friction
        jac_ang = dmask * kin.cdof[None, :, :3]           # (ncon, nv, 3)

        t1, t2 = tangent_frame(contacts.normal)
        Jn = jnp.einsum("cvk,ck->cv", jac, contacts.normal, precision=_HI)
        Jt1 = jnp.einsum("cvk,ck->cv", jac, t1, precision=_HI)
        Jt2 = jnp.einsum("cvk,ck->cv", jac, t2, precision=_HI)
        # angular components: spin about n, roll about t1/t2
        Js = jnp.einsum("cvk,ck->cv", jac_ang, contacts.normal, precision=_HI)
        Jr1 = jnp.einsum("cvk,ck->cv", jac_ang, t1, precision=_HI)
        Jr2 = jnp.einsum("cvk,ck->cv", jac_ang, t2, precision=_HI)
        mu = contacts.friction[:, None]
        mu_t = contacts.friction_tor[:, None]
        mu_r = contacts.friction_roll[:, None]
        # condim-6 pyramid: 2*(condim-1) = 10 unilateral rows/contact
        # (world.xml:19 condim 6; feet friction "0.8 0.02 0.01" — the
        # rolling term is the ball-footed robot's stand stabilizer)
        pyramid = jnp.stack([
            Jn + mu * Jt1, Jn - mu * Jt1,
            Jn + mu * Jt2, Jn - mu * Jt2,
            Jn + mu_t * Js, Jn - mu_t * Js,
            Jn + mu_r * Jr1, Jn - mu_r * Jr1,
            Jn + mu_r * Jr2, Jn - mu_r * Jr2,
        ], axis=1)
        pyramid = pyramid.reshape(ncon * 10, nv)
        cpos = jnp.repeat(contacts.dist, 10)
        cd = impedance(m.solimp, -cpos)

        lim_J = (jnp.stack(rows_J) if nlimit
                 else jnp.zeros((0, nv), dtype=dtype))
        lim_pos = (jnp.stack(rows_pos) if nlimit
                   else jnp.zeros((0,), dtype=dtype))
        lim_d = (jnp.stack(rows_d) if nlimit
                 else jnp.zeros((0,), dtype=dtype))

        k_l, b_l = _kb(m.limit_solref, m.limit_solimp, lim_d, m.dt)
        k_c, b_c = _kb(m.solref, m.solimp, cd, m.dt)

        return Rows(
            J=jnp.concatenate([lim_J, pyramid], axis=0),
            pos=jnp.concatenate([lim_pos, cpos]),
            k=jnp.concatenate([k_l, k_c]),
            b=jnp.concatenate([jnp.broadcast_to(b_l, (nlimit,)),
                               jnp.broadcast_to(b_c, (ncon * 10,))]),
            d=jnp.concatenate([lim_d, cd]))
    elif nlimit:
        pos = jnp.stack(rows_pos)
        lim_d = jnp.stack(rows_d)
        k_l, b_l = _kb(m.limit_solref, m.limit_solimp, lim_d, m.dt)
        return Rows(J=jnp.stack(rows_J), pos=pos, k=k_l,
                    b=jnp.broadcast_to(b_l, (nlimit,)), d=lim_d)
    z = jnp.zeros((0,), dtype=dtype)
    return Rows(J=jnp.zeros((0, nv), dtype=dtype), pos=z, k=z, b=z, d=z)


def limit_rows_static(m: Model):
    """Static limit-row Jacobian table (nlim, nv) as a nested tuple.

    Limit/tendon rows have CONFIGURATION-INDEPENDENT Jacobians (±e_vadr
    for scalar joints, ± the coefficient combination for fixed tendons),
    in the exact enumeration order of make_rows. The fused TPU kernel
    takes this as a static argument and materializes the rows in VMEM,
    so XLA never builds or moves the limit block at runtime.
    """
    import numpy as np
    s = m.struct
    rows = []
    for j in range(s.njnt):
        if not s.jnt_limited[j]:
            continue
        if s.jnt_type[j] not in (JointType.HINGE, JointType.SLIDE):
            continue
        r = np.zeros(s.nv)
        r[s.jnt_vadr[j]] = 1.0
        rows.append(r)
        rows.append(-r)
    for tnd in range(s.ntendon):
        r = np.zeros(s.nv)
        for j, c in zip(s.tendon_jnt[tnd], s.tendon_coef[tnd]):
            r[s.jnt_vadr[j]] += c
        rows.append(r)
        rows.append(-r)
    tab = np.stack(rows) if rows else np.zeros((0, s.nv))
    return tuple(tuple(float(x) for x in row) for row in tab)


def limit_rows_data(m: Model, qpos: jax.Array):
    """(pos, k, b, d) of the limit rows — the configuration-DEPENDENT
    half of the limit block, same enumeration order as
    limit_rows_static. Cheap XLA elementwise work (a few gathers from
    qpos); the Jacobians themselves are static."""
    s = m.struct
    dtype = qpos.dtype
    pos = []
    for j in range(s.njnt):
        if not s.jnt_limited[j]:
            continue
        if s.jnt_type[j] not in (JointType.HINGE, JointType.SLIDE):
            continue
        qadr = s.jnt_qadr[j]
        lo, hi = m.jnt_range[j, 0], m.jnt_range[j, 1]
        mg = m.jnt_margin[j]
        pos.append(qpos[qadr] - lo - mg)
        pos.append(hi - mg - qpos[qadr])
    for tnd in range(s.ntendon):
        length = sum(c * qpos[s.jnt_qadr[j]]
                     for j, c in zip(s.tendon_jnt[tnd], s.tendon_coef[tnd]))
        lo, hi = m.tendon_range[tnd, 0], m.tendon_range[tnd, 1]
        pos.append(length - lo)
        pos.append(hi - length)
    if not pos:
        z = jnp.zeros((0,), dtype=dtype)
        return z, z, z, z
    pos = jnp.stack(pos)
    d = impedance(m.limit_solimp, -pos)
    k, b = _kb(m.limit_solref, m.limit_solimp, d, m.dt)
    return pos, k, jnp.broadcast_to(b, pos.shape), d


def contact_dmask(m: Model) -> jax.Array:
    """Static chain-difference dof mask table (ncon, nv) for the full
    (selection-free) slot set — the dmask contact_raw builds, without
    needing kinematics. Used by the fused smooth-kernel step path."""
    import numpy as np
    s = m.struct
    body_dof = np.asarray(s.body_dof, dtype=np.float64)
    zero_row = np.zeros(s.nv, dtype=np.float64)
    tab = np.stack([
        (body_dof[b] if b >= 0 else zero_row)
        - (body_dof[a] if a >= 0 else zero_row)
        for a, b in zip(s.slot_body_a, s.slot_body_b)])
    return jnp.asarray(tab, dtype=jnp.float32)


def contact_raw(m: Model, kin: Kin, contacts: Contacts,
                sel: jax.Array | None):
    """Raw per-contact quantities for the fused row-building kernel:
    (dmask, rel, mu3, kcon, bcon, dcon).

    dmask (K, nv): body_b-chain minus body_a-chain dof mask (the only
    dynamic gather left on the contact path); rel (K, 3): contact point
    relative to the spatial anchor; mu3 (K, 3): [slide, torsion, roll]
    friction; k/b/d (K,): solref/solimp constants from the signed gap —
    identical across a contact's 10 pyramid edges, so only K values are
    ever built (make_rows repeated them per edge).
    """
    import numpy as np
    s = m.struct
    dtype = kin.cdof.dtype
    # float64 BEFORE differencing (body_dof is uint8 — a-b would wrap)
    body_dof = np.asarray(s.body_dof, dtype=np.float64)
    zero_row = np.zeros(s.nv, dtype=np.float64)
    tab = np.stack([
        (body_dof[b] if b >= 0 else zero_row)
        - (body_dof[a] if a >= 0 else zero_row)
        for a, b in zip(s.slot_body_a, s.slot_body_b)])
    dmask = jnp.asarray(tab, dtype=dtype)
    if sel is not None:
        dmask = dmask[sel]
    rel = contacts.pos - kin.anchor
    mu3 = jnp.stack([contacts.friction, contacts.friction_tor,
                     contacts.friction_roll], axis=-1)
    dcon = impedance(m.solimp, -contacts.dist)
    kcon, bcon = _kb(m.solref, m.solimp, dcon, m.dt)
    return (dmask, rel, mu3, kcon,
            jnp.broadcast_to(bcon, dcon.shape), dcon)


def rows_from_raw(cdof: jax.Array, dmask: jax.Array, rel: jax.Array,
                  normal: jax.Array, dist: jax.Array, mu3: jax.Array,
                  kcon: jax.Array, bcon: jax.Array, dcon: jax.Array,
                  lim_tab, lim_pos: jax.Array, lim_k: jax.Array,
                  lim_b: jax.Array, lim_d: jax.Array) -> Rows:
    """Build constraint rows from raw contact data, EDGE-MAJOR order:
    [limits; edge0 c0..cK-1; edge1 c0..cK-1; ...].

    This is the pure-JAX mirror of the fused kernel's in-VMEM row
    construction (pallas_solver._rows_kernel) — same arithmetic, same
    row order — used as its fallback/oracle. Row ORDER is solver-
    irrelevant (every consumer reduces over rows); it differs from
    make_rows' contact-major layout only so each pyramid edge is one
    contiguous (K,) block (concatenation instead of interleave).
    """
    dtype = cdof.dtype
    nv = cdof.shape[0]
    jac_pt = (cdof[None, :, 3:]
              + jnp.cross(cdof[None, :, :3], rel[:, None, :]))
    dm = dmask[:, :, None]
    jac = dm * jac_pt                              # (K, nv, 3)
    jac_ang = dm * cdof[None, :, :3]
    t1, t2 = tangent_frame(normal)
    Jn = jnp.einsum("cvk,ck->cv", jac, normal, precision=_HI)
    Jt1 = jnp.einsum("cvk,ck->cv", jac, t1, precision=_HI)
    Jt2 = jnp.einsum("cvk,ck->cv", jac, t2, precision=_HI)
    Js = jnp.einsum("cvk,ck->cv", jac_ang, normal, precision=_HI)
    Jr1 = jnp.einsum("cvk,ck->cv", jac_ang, t1, precision=_HI)
    Jr2 = jnp.einsum("cvk,ck->cv", jac_ang, t2, precision=_HI)
    mu = mu3[:, 0:1]
    mu_t = mu3[:, 1:2]
    mu_r = mu3[:, 2:3]
    blocks = [Jn + mu * Jt1, Jn - mu * Jt1,
              Jn + mu * Jt2, Jn - mu * Jt2,
              Jn + mu_t * Js, Jn - mu_t * Js,
              Jn + mu_r * Jr1, Jn - mu_r * Jr1,
              Jn + mu_r * Jr2, Jn - mu_r * Jr2]
    import numpy as np
    lim_J = jnp.asarray(np.asarray(lim_tab, dtype=np.float64).reshape(
        -1, nv), dtype=dtype)
    nrep = len(blocks)
    return Rows(
        J=jnp.concatenate([lim_J] + blocks, axis=0),
        pos=jnp.concatenate([lim_pos] + [dist] * nrep),
        k=jnp.concatenate([lim_k] + [kcon] * nrep),
        b=jnp.concatenate([lim_b] + [bcon] * nrep),
        d=jnp.concatenate([lim_d] + [dcon] * nrep))


def finish_efc(rows: Rows, qvel: jax.Array, Mchol: jax.Array) -> Efc:
    """Mass-matrix finish: aref and the D penalty weights.

    aref_i = -b_i * (J_i qvel) - k_i * d_i * pos_i
    R_i = (1-d)/d * diag(J M^-1 J^T)_i ;  D = 1/R
    """
    if rows.J.shape[0] == 0:
        z = jnp.zeros((0,), dtype=qvel.dtype)
        return Efc(J=rows.J, aref=z, D=z, pos=z)
    vel = jnp.matmul(rows.J, qvel, precision=_HI)
    aref = -rows.b * vel - rows.k * rows.d * rows.pos
    MiJt = linalg.chol_solve(Mchol, rows.J.T)             # (nv, ne)
    diagA = jnp.maximum(jnp.sum(rows.J.T * MiJt, axis=0), 1e-10)
    R = jnp.maximum((1.0 - rows.d) / jnp.maximum(rows.d, 1e-4),
                    1e-6) * diagA
    return Efc(J=rows.J, aref=aref, D=1.0 / R, pos=rows.pos)


def make_efc(m: Model, kin: Kin, qpos: jax.Array, qvel: jax.Array,
             contacts: Contacts, Mchol: jax.Array,
             sel: jax.Array | None = None) -> Efc:
    """Build finished constraint rows (make_rows + finish_efc)."""
    return finish_efc(make_rows(m, kin, qpos, qvel, contacts, sel), qvel,
                      Mchol)


def newton_solve(M: jax.Array, Mchol: jax.Array, qfrc_smooth: jax.Array,
                 efc: Efc, niter: int = 8, ls_iter: int = 16,
                 active_rows: int = 0, ift: bool = False
                 ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Minimize the soft-constraint objective over qacc.

    Returns (qacc, efc_force, qfrc_constraint). The reference relies on
    MuJoCo's Newton solver for the same problem; here the solver is
    branch-free with static iteration counts so it vmaps across rollouts.

    `ift=True` — implicit-function derivatives: the Newton iterations run
    under stop_gradient and ONE differentiable Newton step is applied at
    the solution. Since the optimality condition g(x*, θ) = 0 holds
    there, d x*/dθ = -H⁻¹ ∂g/∂θ — the exact IFT sensitivity at the
    converged active set — instead of backprop through a truncated
    iteration+linesearch unroll (which both distorts the Jacobian and
    multiplies the AD graph). Used by the planner derivative path
    (planners/derivatives.py); the reference has no analog (it
    finite-differences mj_step, mjd_transitionFD).

    Active-set reduction (`active_rows` > 0): gather the rows with the
    smallest signed distance before the Newton loop — a static-shape
    analog of mj_makeConstraint's dynamic row count. MEASURED SLOWER on
    TPU (46k vs 65k steps/s at batch 1024: the batched gather costs more
    than the dense MXU matmuls it saves), so it is DISABLED by default;
    useful on CPU/GPU backends where gathers are cheap relative to
    dense contraction.
    """
    a_s = linalg.chol_solve(Mchol, qfrc_smooth)
    ne = efc.J.shape[0]
    dtype = qfrc_smooth.dtype
    if ne == 0:
        z = jnp.zeros((0,), dtype=dtype)
        return a_s, z, jnp.zeros_like(qfrc_smooth)

    if 0 < active_rows < ne:
        _, sel = jax.lax.top_k(-efc.pos, active_rows)
        J, aref, D = efc.J[sel], efc.aref[sel], efc.D[sel]
    else:
        sel = None
        J, aref, D = efc.J, efc.aref, efc.D

    # parallel linesearch grid: phi'(alpha) is monotone (convex
    # objective) and piecewise-linear in alpha, so evaluating it on a
    # fixed log-spaced grid in ONE fused kernel and linearly
    # interpolating the zero crossing replaces ~21 SEQUENTIAL bisection
    # loop iterations (which dominated step time on TPU: loop-iteration
    # overhead >> the tiny per-step math).
    ls_grid = jnp.concatenate([
        jnp.zeros((1,), dtype=dtype),
        jnp.logspace(-3.0, jnp.log10(4.0), ls_iter - 1).astype(dtype)])

    def newton_iter(_, x):
        r = jnp.matmul(J, x, precision=_HI) - aref
        act = (r < 0).astype(dtype)
        Da = D * act
        g = jnp.matmul(M, x - a_s, precision=_HI) \
            + jnp.matmul(J.T, Da * r, precision=_HI)
        H = M + jnp.matmul(J.T * Da, J, precision=_HI)
        p = -linalg.chol_solve(linalg.chol_factor(H), g)
        Jp = jnp.matmul(J, p, precision=_HI)
        Mp = jnp.matmul(M, p, precision=_HI)
        pMp = p @ Mp
        b0 = p @ jnp.matmul(M, x - a_s, precision=_HI)

        # dphi on the whole grid at once: (LS, ne) -> (LS,)
        ra = r[None, :] + ls_grid[:, None] * Jp[None, :]     # (LS, ne)
        dphi = (b0 + ls_grid * pMp
                + jnp.sum((D * Jp)[None, :] * jnp.where(ra < 0, ra, 0.0),
                          axis=1))                            # (LS,)
        # last grid point with dphi < 0 brackets the root from the left
        neg = dphi < 0
        i_lo = jnp.maximum(jnp.sum(neg.astype(jnp.int32)) - 1, 0)
        i_hi = jnp.minimum(i_lo + 1, ls_iter - 1)
        d_lo, d_hi = dphi[i_lo], dphi[i_hi]
        a_lo, a_hi = ls_grid[i_lo], ls_grid[i_hi]
        frac = jnp.clip(d_lo / jnp.minimum(d_lo - d_hi, -1e-12), 0.0, 1.0)
        alpha = jnp.where(neg[-1], ls_grid[-1],          # all negative
                          a_lo + frac * (a_hi - a_lo))
        alpha = jnp.where(neg[0], alpha, 0.0)            # ascent guard
        return x + alpha * p

    if ift:
        sg = jax.lax.stop_gradient
        # primal: converge with gradients cut, then one differentiable
        # full Newton step at the (frozen) active set — value unchanged
        # to solver tolerance, derivative = exact IFT sensitivity
        xh = lax.fori_loop(0, niter, newton_iter, sg(a_s))
        xh = sg(xh)
        rh = jnp.matmul(sg(J), xh, precision=_HI) - sg(aref)
        act = sg((rh < 0).astype(dtype))
        Da = D * act
        r_full = jnp.matmul(J, xh, precision=_HI) - aref
        g = jnp.matmul(M, xh - a_s, precision=_HI) \
            + jnp.matmul(J.T, Da * r_full, precision=_HI)
        H = M + jnp.matmul(J.T * Da, J, precision=_HI)
        x = xh - linalg.chol_solve(linalg.chol_factor(H), g)
    else:
        x = lax.fori_loop(0, niter, newton_iter, a_s)
    r = jnp.matmul(J, x, precision=_HI) - aref
    f_sel = jnp.maximum(-D * r, 0.0) * (r < 0).astype(dtype)
    qfrc_constraint = jnp.matmul(J.T, f_sel, precision=_HI)
    if sel is not None:
        f = jnp.zeros((ne,), dtype=dtype).at[sel].set(f_sel)
    else:
        f = f_sel
    return x, f, qfrc_constraint
