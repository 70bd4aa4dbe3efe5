"""Fused TPU kernel for the contact Newton solve + implicit Euler.

Why this exists: the physics step is launch-bound, not FLOP-bound. An
xprof capture of the batched rollout (1024 x 100 steps) showed ~1390
kernel launches per step at ~9.5 us each — 0.24% FLOP utilization, 6.5%
HBM utilization — almost all of it the constraint solve: diagA
(J M^-1 J^T), eight Newton iterations (each a small Cholesky + matvecs +
a 16-point linesearch), final forces, and the implicit-damping Euler
solve, each lowering to dozens of tiny XLA fusions. This kernel runs the
ENTIRE solve in one pallas_call per batch tile, with the batch in the
lane dimension (TB=128 lanes) so every op is a full-width VPU op on
VMEM-resident data.

Algorithmic parity: the kernel computes exactly the same quantities as
the pure-JAX path (solver.finish_efc + solver.newton_solve + the
step-level (M + h diag(damping)) dv = h qfrc_total solve) — same
iteration count, same log-spaced linesearch grid, same clamps — so plan
and sim rollouts see the same contact model whichever path runs (the
round-2 plan/sim solver-parity lesson, docs/NOTES.md). Differences are
f32 rounding from reassociated reductions only.

The reference has no analog: it leans on MuJoCo's CPU Newton solver
(one mjData per thread-pool worker). This is the TPU-native replacement.

AD: the kernel path is rollout-only. Derivative/linearization callers
(planners/derivatives.py, direct/) use ift=True, which routes to the
pure-JAX implicit-function path before this module is ever consulted.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import linalg

_TB = 128          # batch tile = lane width
_EPS = 1e-12       # cholesky diagonal clamp (linalg._JITTER analog)


def enabled() -> bool:
    """Kernel path gate: TPU backend, f32, not explicitly disabled."""
    if os.environ.get("HMT_NO_PALLAS", "0") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


# ---------------------------------------------------------------------------
# in-kernel linear algebra on batch-in-lanes values
#   matrices (n, n, TB), vectors (n, TB), row data (ne, TB)
# ---------------------------------------------------------------------------

def _chol(A, n):
    """Lower Cholesky of (n, n, TB) with clamped diagonal.

    Column-list construction (no .at updates — Pallas TPU has no scatter
    lowering); masks come from iota comparisons, computed in-kernel.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols = []
    for j in range(n):
        s = A[:, j]
        for k2 in range(j):
            s = s - cols[k2] * cols[k2][j][None, :]
        dj = jnp.sqrt(jnp.maximum(s[j], _EPS))              # (TB,)
        below = jnp.where(rows > j, s / dj[None, :], 0.0)
        cols.append(jnp.where(rows == j, dj[None, :], below))
    return jnp.stack(cols, axis=1)


def _chol_solve_vec(L, bvec, n):
    """Solve L L^T x = b for (n, TB) rhs by unrolled substitution."""
    ys = []
    for i in range(n):
        s = bvec[i]
        for k2 in range(i):
            s = s - L[i, k2] * ys[k2]
        ys.append(s / L[i, i])
    xs = [None] * n
    for i in reversed(range(n)):
        s = ys[i]
        for k2 in range(i + 1, n):
            s = s - L[k2, i] * xs[k2]
        xs[i] = s / L[i, i]
    return jnp.stack(xs)


def _matvec(M, v):
    """(n, n, TB) @ (n, TB) -> (n, TB)."""
    return jnp.sum(M * v[None, :, :], axis=1)


def _kernel(M_ref, qf_ref, qv_ref, J_ref, pos_ref, k_ref, b_ref, d_ref,
            hd_ref, dt_ref,
            qacc_ref, qvn_ref, f_ref, qfc_ref,
            *, nv, ne, niter, ls_grid):
    M = M_ref[...]            # (nv, nv, TB)
    qf = qf_ref[...]          # (nv, TB)
    qv = qv_ref[...]          # (nv, TB)
    J = J_ref[...]            # (nv, ne, TB)  dof-major rows
    pos = pos_ref[...]        # (ne, TB)
    kk = k_ref[...]
    bb = b_ref[...]
    dd = d_ref[...]
    hd = hd_ref[...]          # (nv, TB)  dt * dof_damping
    dtv = dt_ref[...]         # (1, TB)

    x, qvn, f, qfc = _solve_core(M, qf, qv, J, pos, kk, bb, dd, hd, dtv,
                                 nv=nv, niter=niter, ls_grid=ls_grid)
    qacc_ref[...] = x
    qvn_ref[...] = qvn
    f_ref[...] = f
    qfc_ref[...] = qfc


def _solve_core(M, qf, qv, J, pos, kk, bb, dd, hd, dtv, *, nv, niter,
                ls_grid):
    """The Newton contact solve + implicit-damping Euler on
    batch-in-lanes values — shared by the row-fed kernel (_kernel) and
    the row-BUILDING kernel (_rows_kernel). `J` is (nv, ne, TB) — a
    stacked array or a per-dof LIST of (ne, TB) blocks (the rows kernel
    passes the list so a stacked copy never doubles VMEM)."""
    Lm = _chol(M, nv)
    a_s = _chol_solve_vec(Lm, qf, nv)

    # diag(J M^-1 J^T) streamed via explicit M^-1 columns (nv x nv is
    # tiny) with O(1) live (ne, TB) temporaries — the L^-1 J forward
    # substitution held nv live (ne, TB) rows, which blew the 16 MB
    # scoped-VMEM limit at ne ~ 700 (selection-free humanoid). Same
    # structure as the JAX path's chol_solve(Mchol, J.T) finish.
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (nv, 1), 0)
    Minv = [_chol_solve_vec(Lm, (rows_iota == u).astype(qf.dtype), nv)
            for u in range(nv)]                     # columns, (nv, TB)
    diagA = None
    for u in range(nv):
        T = Minv[u][0][None, :] * J[0]
        for v in range(1, nv):
            T = T + Minv[u][v][None, :] * J[v]
        contrib = J[u] * T
        diagA = contrib if diagA is None else diagA + contrib
    diagA = jnp.maximum(diagA, 1e-10)
    R = jnp.maximum((1.0 - dd) / jnp.maximum(dd, 1e-4), 1e-6) * diagA
    D = 1.0 / R

    # aref = -b (J qvel) - k d pos
    jqv = J[0] * qv[0][None, :]
    for v in range(1, nv):
        jqv = jqv + J[v] * qv[v][None, :]
    aref = -bb * jqv - kk * dd * pos

    x = a_s
    for _ in range(niter):
        r = -aref
        for v in range(nv):
            r = r + J[v] * x[v][None, :]
        Da = jnp.where(r < 0, D, 0.0)
        Dar = Da * r
        Mx = _matvec(M, x - a_s)
        g = Mx + jnp.stack(
            [jnp.sum(J[v] * Dar, axis=0) for v in range(nv)])
        # J^T Da J, exploiting symmetry: each (u, w<=u) entry computed
        # once and mirrored — 45% off the kernel's dominant contraction
        Hent = [[None] * nv for _ in range(nv)]
        for u in range(nv):
            JuDa = J[u] * Da
            for w in range(u + 1):
                h_uw = jnp.sum(JuDa * J[w], axis=0)
                Hent[u][w] = h_uw
                Hent[w][u] = h_uw
        H = M + jnp.stack([jnp.stack(row) for row in Hent])
        Lh = _chol(H, nv)
        p = -_chol_solve_vec(Lh, g, nv)
        Jp = J[0] * p[0][None, :]
        for v in range(1, nv):
            Jp = Jp + J[v] * p[v][None, :]
        pMp = jnp.sum(p * _matvec(M, p), axis=0)
        b0 = jnp.sum(p * Mx, axis=0)
        DJp = D * Jp
        dphis = [b0 + a * pMp
                 + jnp.sum(DJp * jnp.minimum(r + a * Jp, 0.0), axis=0)
                 for a in ls_grid]
        # piecewise-linear monotone dphi: interpolate the sign crossing
        alpha = jnp.where(dphis[-1] < 0,
                          jnp.full_like(pMp, ls_grid[-1]),
                          jnp.zeros_like(pMp))
        for t in range(len(ls_grid) - 1):
            lo, hi = dphis[t], dphis[t + 1]
            cross = jnp.logical_and(lo < 0, hi >= 0)
            frac = jnp.clip(lo / jnp.minimum(lo - hi, -1e-12), 0.0, 1.0)
            cand = ls_grid[t] + frac * (ls_grid[t + 1] - ls_grid[t])
            alpha = jnp.where(cross, cand, alpha)
        x = x + alpha[None, :] * p

    r = -aref
    for v in range(nv):
        r = r + J[v] * x[v][None, :]
    f = jnp.where(r < 0, jnp.maximum(-D * r, 0.0), 0.0)
    qfc = jnp.stack([jnp.sum(J[v] * f, axis=0) for v in range(nv)])

    # implicit-damping Euler: (M + dt diag(damping)) dv = dt qfrc_total
    ii = jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 1)
    MhD = M + jnp.where(ii == jj, hd[:, None, :], 0.0)
    Le = _chol(MhD, nv)
    dv = dtv * _chol_solve_vec(Le, qf + qfc, nv)
    return x, qv + dv, f, qfc


def L_ik(L, i, k):
    """(TB,) scalar row of a (n, n, TB) matrix, broadcast over rows."""
    return L[i, k][None, :]


@functools.partial(jax.jit,
                   static_argnames=("niter", "ls_iter", "interpret"))
def fused_batched(M, qf, qv, J, pos, k, b, d, hdamp, dt,
                  niter: int = 8, ls_iter: int = 16,
                  interpret: bool = False):
    """Batched fused solve. Batch-leading inputs:

    M (B,nv,nv), qf/qv/hdamp (B,nv), J (B,ne,nv), pos/k/b/d (B,ne),
    dt (B,). Returns (qacc, qvel_new, f, qfrc_constraint) batch-leading.
    hdamp = dt * dof_damping per element.
    """
    B, ne, nv = J.shape
    dtype = jnp.float32
    Bp = pl.cdiv(B, _TB) * _TB
    pad = Bp - B

    def prep(x, perm):
        x = jnp.transpose(x.astype(dtype), perm)
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return x

    Mt = prep(M, (1, 2, 0))
    qft = prep(qf, (1, 0))
    qvt = prep(qv, (1, 0))
    Jt = prep(J, (2, 1, 0))            # (nv, ne, B)
    post = prep(pos, (1, 0))
    kt = prep(k, (1, 0))
    bt = prep(b, (1, 0))
    dt_rows = prep(d, (1, 0))
    hdt = prep(hdamp, (1, 0))
    dtt = prep(dt[:, None], (1, 0))    # (1, B)

    ls_grid = (0.0,) + tuple(
        float(a) for a in np.logspace(-3.0, np.log10(4.0), ls_iter - 1))

    kern = functools.partial(_kernel, nv=nv, ne=ne, niter=niter,
                             ls_grid=ls_grid)

    def vspec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape + (_TB,),
                            lambda i, nd=nd: (0,) * nd + (i,),
                            memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((nv, Bp), dtype),   # qacc
        jax.ShapeDtypeStruct((nv, Bp), dtype),   # qvel_new
        jax.ShapeDtypeStruct((ne, Bp), dtype),   # f
        jax.ShapeDtypeStruct((nv, Bp), dtype),   # qfrc_constraint
    ]
    qacc, qvn, f, qfc = pl.pallas_call(
        kern,
        grid=(Bp // _TB,),
        in_specs=[vspec(nv, nv), vspec(nv), vspec(nv), vspec(nv, ne),
                  vspec(ne), vspec(ne), vspec(ne), vspec(ne), vspec(nv),
                  vspec(1)],
        out_specs=[vspec(nv), vspec(nv), vspec(ne), vspec(nv)],
        out_shape=out_shape,
        interpret=interpret,
    )(Mt, qft, qvt, Jt, post, kt, bt, dt_rows, hdt, dtt)

    def unprep(x):
        return jnp.transpose(x[..., :B], (1, 0))

    return unprep(qacc), unprep(qvn), unprep(f), unprep(qfc)


# ---------------------------------------------------------------------------
# pure-JAX reference path + custom_vmap dispatch
# ---------------------------------------------------------------------------

def _jax_single(M, qf, qv, J, pos, k, b, d, hdamp, dt,
                niter: int, ls_iter: int):
    """Unbatched pure-JAX equivalent (solver.newton_solve + Euler)."""
    from .solver import Rows, finish_efc, newton_solve
    Mchol = linalg.chol_factor(M)
    efc = finish_efc(Rows(J=J, pos=pos, k=k, b=b, d=d), qv, Mchol)
    qacc, f, qfc = newton_solve(M, Mchol, qf, efc, niter=niter,
                                ls_iter=ls_iter)
    MhD = M + jnp.diag(hdamp)
    dv = dt * linalg.solve_psd(MhD, qf + qfc)
    return qacc, qv + dv, f, qfc


@functools.lru_cache(maxsize=None)
def _make_dispatch(niter: int, ls_iter: int):
    single = functools.partial(_jax_single, niter=niter, ls_iter=ls_iter)

    @jax.custom_batching.custom_vmap
    def fused(M, qf, qv, J, pos, k, b, d, hdamp, dt):
        # unbatched call: still run the kernel (batch of 1) so single-step
        # sim and batched plan rollouts see the SAME contact arithmetic
        # on TPU (plan/sim solver parity, docs/NOTES.md round 2)
        if enabled() and M.dtype == jnp.float32 and J.shape[0] > 0:
            outs = fused_batched(*[a[None] for a in
                                   (M, qf, qv, J, pos, k, b, d, hdamp)],
                                 jnp.reshape(dt, (1,)),
                                 niter=niter, ls_iter=ls_iter)
            return tuple(o[0] for o in outs)
        return single(M, qf, qv, J, pos, k, b, d, hdamp, dt)

    @fused.def_vmap
    def _rule(axis_size, in_batched, *args):
        bc = [a if ib else
              jnp.broadcast_to(a[None], (axis_size,) + jnp.shape(a))
              for a, ib in zip(args, in_batched)]
        M, qf, qv, J, pos, k, b, d, hdamp, dt = bc
        if enabled() and M.dtype == jnp.float32 and J.shape[1] > 0:
            outs = fused_batched(M, qf, qv, J, pos, k, b, d, hdamp, dt,
                                 niter=niter, ls_iter=ls_iter)
        else:
            outs = jax.vmap(single)(M, qf, qv, J, pos, k, b, d, hdamp, dt)
        return outs, (True, True, True, True)

    return fused


# ---------------------------------------------------------------------------
# row-BUILDING kernel: constraint rows constructed in VMEM
#
# Round-5 finding: at batch 1024 the XLA-side row assembly (make_rows'
# gathers, einsums, pyramid stack, concats + the (B, ne, nv) J
# materialization and its transpose into kernel layout) cost ~400 ms of
# the 646 ms rollout — 4x the fused solve itself — almost entirely
# fusion-launch overhead on tiny tensors. This kernel takes the RAW
# per-contact data (cdof, contact point/normal/gap/friction, chain dof
# masks) plus the per-row solref/solimp constants, builds the pyramid
# rows directly in VMEM (edge-major block order, so each edge is one
# contiguous (K, TB) slab — concatenation, not interleave). J never
# exists in HBM at all: per-env kernel input traffic drops from ~7.6k
# floats (J + per-row k/b/d/pos) to ~1.1k.
#
# The solve itself runs FACTORIZED in the 6-row base space
# (_solve_core_pyramid): every edge row is Jn + s*mu*Jt for one of 5
# tangent bases, so J-contractions (H = M + J^T Da J, g, diagA, J^T f)
# collapse onto the base Jacobians with per-slot coefficient combos —
# the contraction length drops from nlim + 10K rows to 6K base rows,
# which roughly halves the kernel's dominant VPU work. Limit rows have
# STATIC Jacobians (lim_tab), so their contributions unroll over the
# static nonzeros at trace time.
# ---------------------------------------------------------------------------


def _lim_nonzeros(lim_tab):
    """Static limit-row structure: per row, tuple of (dof, coef)."""
    return tuple(
        tuple((v, float(c)) for v, c in enumerate(row) if c != 0.0)
        for row in lim_tab)


def _solve_core_pyramid(M, qf, qv, JB, mu3, pos, kc, bb, dc,
                        lim_nz, lpos, kl, bl, dl, hd, dtv,
                        *, nv, niter, ls_grid):
    """Newton contact solve + implicit-damping Euler, factorized over
    the condim-6 pyramid structure.

    JB: 6 per-dof lists of (K, TB) base Jacobian rows
        [Jn, Jt1, Jt2, Js, Jr1, Jr2]; edge e of a slot is
        Jn + sign_e * mu_e * Jt_{t(e)} in the edge-major order of
        rows_from_raw. mu3: [mus, mut, mur] each (K, TB). kc/bb/dc/pos:
        per-slot constants (K, TB), shared by the slot's 10 edges.
    lim_nz: static ((dof, coef), ...) per limit row; lpos/kl/bl/dl
    (nlim, TB). Returns (qacc, qvel_new, fslot, qfrc_constraint) with
    fslot (K, TB) the per-slot summed normal force.

    Algebraically identical to running _solve_core on the expanded
    nlim + 10K rows (rows_from_raw layout) — only f32 reassociation
    differs.
    """
    mus, mut, mur = mu3
    # (tangent base index, mu) per edge pair i; edges are (2i, 2i+1)
    # with signs (+, -)
    pair_mu = ((1, mus), (2, mus), (3, mut), (4, mur), (5, mur))
    nlim = len(lim_nz)

    Lm = _chol(M, nv)
    a_s = _chol_solve_vec(Lm, qf, nv)

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (nv, 1), 0)
    Minv = [_chol_solve_vec(Lm, (rows_iota == u).astype(qf.dtype), nv)
            for u in range(nv)]                     # columns, (nv, TB)

    # ---- diagA in base space: per-slot Gram entries, streamed ----
    # A_ab = Jb_a M^-1 Jb_b^T computed via one (K, TB) temporary per
    # dof row (tmp = row u of M^-1 Jb_t^T), consumed immediately —
    # O(1) live temps, like _solve_core's streamed diagA.
    def grams(t):
        """(A_nt, A_tt) for tangent base t (A_nn for t == 0)."""
        A_nt_acc = None
        A_tt_acc = None
        for u in range(nv):
            tmp = Minv[u][0][None, :] * JB[t][0]
            for v in range(1, nv):
                tmp = tmp + Minv[u][v][None, :] * JB[t][v]
            nt = JB[0][u] * tmp
            tt = JB[t][u] * tmp
            A_nt_acc = nt if A_nt_acc is None else A_nt_acc + nt
            A_tt_acc = tt if A_tt_acc is None else A_tt_acc + tt
        return A_nt_acc, A_tt_acc

    A_nn, _ = grams(0)
    A_nt = []
    A_tt = []
    for t, _mu in pair_mu:
        ant, att = grams(t)
        A_nt.append(ant)
        A_tt.append(att)
    # per-edge diag(J M^-1 J^T): A_nn +- 2 mu A_nt + mu^2 A_tt
    diag_e = []
    for i, (_, mu) in enumerate(pair_mu):
        cross = 2.0 * mu * A_nt[i]
        quad = mu * mu * A_tt[i]
        diag_e.append(A_nn + cross + quad)
        diag_e.append(A_nn - cross + quad)
    # limit rows: static quadratic form over Minv
    diag_l = []
    for row in lim_nz:
        acc = None
        for (u, cu) in row:
            for (v, cv) in row:
                term = (cu * cv) * Minv[u][v]
                acc = term if acc is None else acc + term
        diag_l.append(acc if acc is not None
                      else jnp.zeros_like(qf[0]))

    def D_of(diag, dd):
        diag = jnp.maximum(diag, 1e-10)
        R = jnp.maximum((1.0 - dd) / jnp.maximum(dd, 1e-4), 1e-6) * diag
        return 1.0 / R

    D_e = [D_of(de, dc) for de in diag_e]            # 10 x (K, TB)
    D_l = ([D_of(jnp.stack(diag_l), dl)] if nlim else [])  # (nlim, TB)

    # ---- aref ----
    def base_dot(vec):
        """J_base @ vec for the 6 base types: 6 x (K, TB)."""
        out = []
        for a in range(6):
            acc = JB[a][0] * vec[0][None, :]
            for v in range(1, nv):
                acc = acc + JB[a][v] * vec[v][None, :]
            out.append(acc)
        return out

    def lim_dot(vec):
        """Static limit rows @ vec: (nlim, TB)."""
        rows = []
        for row in lim_nz:
            acc = None
            for (u, cu) in row:
                t = cu * vec[u]
                acc = t if acc is None else acc + t
            rows.append(acc if acc is not None
                        else jnp.zeros_like(vec[0]))
        return jnp.stack(rows)

    def edges_of(base6):
        """Expand 6 base values into the 10 edge values."""
        out = []
        for (t, mu) in pair_mu:
            mt = mu * base6[t]
            out.append(base6[0] + mt)
            out.append(base6[0] - mt)
        return out

    jqv_b = base_dot(qv)
    jqv_e = edges_of(jqv_b)
    aref_e = [-bb * jv - kc * dc * pos for jv in jqv_e]
    if nlim:
        jqv_l = lim_dot(qv)
        aref_l = -bl * jqv_l - kl * dl * lpos

    def JT_apply(y_e, y_l):
        """J^T y for per-edge values y_e (10 x (K,TB)) and limit values
        y_l (nlim, TB): returns (nv, TB)."""
        Y0 = y_e[0]
        for e in range(1, 10):
            Y0 = Y0 + y_e[e]
        Z = [mu * (y_e[2 * i] - y_e[2 * i + 1])
             for i, (_, mu) in enumerate(pair_mu)]
        outs = []
        for v in range(nv):
            acc = JB[0][v] * Y0
            for i, (t, _) in enumerate(pair_mu):
                acc = acc + JB[t][v] * Z[i]
            outs.append(jnp.sum(acc, axis=0))
        out = jnp.stack(outs)
        if nlim:
            rows = jax.lax.broadcasted_iota(jnp.int32, (nv, 1), 0)
            for l, row in enumerate(lim_nz):
                for (u, cu) in row:
                    out = out + jnp.where(rows == u, cu * y_l[l][None, :],
                                          0.0)
        return out

    x = a_s
    for _ in range(niter):
        rb = base_dot(x)
        r_e = [je - ae for je, ae in zip(edges_of(rb), aref_e)]
        Dar_e = [jnp.where(r < 0, De * r, 0.0)
                 for r, De in zip(r_e, D_e)]
        if nlim:
            r_l = lim_dot(x) - aref_l
            Dar_l = jnp.where(r_l < 0, D_l[0] * r_l, 0.0)
        else:
            r_l = Dar_l = None
        Mx = _matvec(M, x - a_s)
        g = Mx + JT_apply(Dar_e, Dar_l)

        # H = M + J^T Da J via per-slot coefficient combos:
        #   c0 = sum_e Da_e ; ci = mu_i (Da_2i - Da_2i+1) ;
        #   cii = mu_i^2 (Da_2i + Da_2i+1)
        Da_e = [jnp.where(r < 0, De, 0.0) for r, De in zip(r_e, D_e)]
        c0 = Da_e[0]
        for e in range(1, 10):
            c0 = c0 + Da_e[e]
        ci = [mu * (Da_e[2 * i] - Da_e[2 * i + 1])
              for i, (_, mu) in enumerate(pair_mu)]
        cii = [mu * mu * (Da_e[2 * i] + Da_e[2 * i + 1])
               for i, (_, mu) in enumerate(pair_mu)]
        # P[w] = c0 Jn[w] + sum_i ci Jt_i[w];
        # Q_i[w] = ci Jn[w] + cii Jt_i[w]
        P = []
        Q = [[None] * nv for _ in range(5)]
        for w in range(nv):
            acc = c0 * JB[0][w]
            for i, (t, _) in enumerate(pair_mu):
                acc = acc + ci[i] * JB[t][w]
                Q[i][w] = ci[i] * JB[0][w] + cii[i] * JB[t][w]
            P.append(acc)
        Hent = [[None] * nv for _ in range(nv)]
        for u in range(nv):
            for w in range(u + 1):
                acc = JB[0][u] * P[w]
                for i, (t, _) in enumerate(pair_mu):
                    acc = acc + JB[t][u] * Q[i][w]
                h_uw = jnp.sum(acc, axis=0)
                Hent[u][w] = h_uw
                Hent[w][u] = h_uw
        if nlim:
            Da_l = jnp.where(r_l < 0, D_l[0], 0.0)
            for l, row in enumerate(lim_nz):
                for (u, cu) in row:
                    for (v, cv) in row:
                        if v > u:
                            continue
                        h = Hent[u][v] + (cu * cv) * Da_l[l]
                        Hent[u][v] = h
                        if v != u:
                            Hent[v][u] = h
        H = M + jnp.stack([jnp.stack(row) for row in Hent])
        Lh = _chol(H, nv)
        p = -_chol_solve_vec(Lh, g, nv)

        Jp_e = edges_of(base_dot(p))
        pMp = jnp.sum(p * _matvec(M, p), axis=0)
        b0 = jnp.sum(p * Mx, axis=0)
        DJp_e = [De * jp for De, jp in zip(D_e, Jp_e)]
        if nlim:
            Jp_l = lim_dot(p)
            DJp_l = D_l[0] * Jp_l
        dphis = []
        for a in ls_grid:
            acc = b0 + a * pMp
            for e in range(10):
                acc = acc + jnp.sum(
                    DJp_e[e] * jnp.minimum(r_e[e] + a * Jp_e[e], 0.0),
                    axis=0)
            if nlim:
                acc = acc + jnp.sum(
                    DJp_l * jnp.minimum(r_l + a * Jp_l, 0.0), axis=0)
            dphis.append(acc)
        alpha = jnp.where(dphis[-1] < 0,
                          jnp.full_like(pMp, ls_grid[-1]),
                          jnp.zeros_like(pMp))
        for t in range(len(ls_grid) - 1):
            lo, hi = dphis[t], dphis[t + 1]
            cross = jnp.logical_and(lo < 0, hi >= 0)
            frac = jnp.clip(lo / jnp.minimum(lo - hi, -1e-12), 0.0, 1.0)
            cand = ls_grid[t] + frac * (ls_grid[t + 1] - ls_grid[t])
            alpha = jnp.where(cross, cand, alpha)
        x = x + alpha[None, :] * p

    rb = base_dot(x)
    r_e = [je - ae for je, ae in zip(edges_of(rb), aref_e)]
    f_e = [jnp.where(r < 0, jnp.maximum(-De * r, 0.0), 0.0)
           for r, De in zip(r_e, D_e)]
    if nlim:
        r_l = lim_dot(x) - aref_l
        f_l = jnp.where(r_l < 0, jnp.maximum(-D_l[0] * r_l, 0.0), 0.0)
    else:
        f_l = None
    qfc = JT_apply(f_e, f_l)
    fslot = f_e[0]
    for e in range(1, 10):
        fslot = fslot + f_e[e]

    # implicit-damping Euler: (M + dt diag(damping)) dv = dt qfrc_total
    ii = jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (nv, nv, 1), 1)
    MhD = M + jnp.where(ii == jj, hd[:, None, :], 0.0)
    Le = _chol(MhD, nv)
    dv = dtv * _chol_solve_vec(Le, qf + qfc, nv)
    return x, qv + dv, fslot, qfc

def _rows_kernel(M_ref, qf_ref, qv_ref, cdof_ref, rel_ref, nrm_ref,
                 dist_ref, mu_ref, dmask_ref, kc_ref, bc_ref, dc_ref,
                 lpos_ref, kl_ref, bl_ref, dl_ref, hd_ref,
                 dt_ref,
                 qacc_ref, qvn_ref, fslot_ref, qfc_ref,
                 *, nv, K, lim_nz, niter, ls_grid, dmask_static):
    M = M_ref[...]            # (nv, nv, TB)
    qf = qf_ref[...]          # (nv, TB)
    qv = qv_ref[...]          # (nv, TB)
    cdof = cdof_ref[...]      # (nv, 6, TB)
    rel = rel_ref[...]        # (3, K, TB) contact point - anchor
    nrm = nrm_ref[...]        # (3, K, TB)
    dist = dist_ref[...]      # (K, TB)
    mu = mu_ref[...]          # (3, K, TB) [slide, torsion, roll]
    # chain-difference dof masks: (nv, K, TB) per-env (top-k selection
    # reorders slots per env) or a STATIC (nv, K) table broadcast over
    # lanes (selection off — slot->bodies mapping is model structure)
    dmask = dmask_ref[...]
    kc = kc_ref[...]          # (K, TB)
    bc = bc_ref[...]
    dc = dc_ref[...]
    hd = hd_ref[...]          # (nv, TB)
    dtv = dt_ref[...]         # (1, TB)
    nlim = len(lim_nz)

    # tangent frame (collision.tangent_frame arithmetic, branch-free)
    nx, ny, nz = nrm[0], nrm[1], nrm[2]
    up = jnp.abs(nz) > 0.9
    rx = jnp.where(up, 1.0, 0.0)
    rz = jnp.where(up, 0.0, 1.0)
    t1x = -rz * ny
    t1y = rz * nx - rx * nz
    t1z = rx * ny
    inv1 = 1.0 / jnp.maximum(
        jnp.sqrt(t1x * t1x + t1y * t1y + t1z * t1z), 1e-9)
    t1x, t1y, t1z = t1x * inv1, t1y * inv1, t1z * inv1
    t2x = ny * t1z - nz * t1y
    t2y = nz * t1x - nx * t1z
    t2z = nx * t1y - ny * t1x

    # 6 base Jacobian rows per dof (K, TB): the solve runs factorized
    # on these (_solve_core_pyramid) — edges are never materialized
    JB = [[None] * nv for _ in range(6)]
    for v in range(nv):
        w0, w1, w2 = (cdof[v, 0][None, :], cdof[v, 1][None, :],
                      cdof[v, 2][None, :])
        l0, l1, l2 = (cdof[v, 3][None, :], cdof[v, 4][None, :],
                      cdof[v, 5][None, :])
        dm = dmask[v][:, None] if dmask_static else dmask[v]
        # point jacobian: cdof_lin + cdof_ang x rel, masked to the chain
        jx = dm * (l0 + w1 * rel[2] - w2 * rel[1])
        jy = dm * (l1 + w2 * rel[0] - w0 * rel[2])
        jz = dm * (l2 + w0 * rel[1] - w1 * rel[0])
        JB[0][v] = jx * nx + jy * ny + jz * nz          # Jn
        JB[1][v] = jx * t1x + jy * t1y + jz * t1z       # Jt1
        JB[2][v] = jx * t2x + jy * t2y + jz * t2z       # Jt2
        JB[3][v] = dm * (w0 * nx + w1 * ny + w2 * nz)   # Js
        JB[4][v] = dm * (w0 * t1x + w1 * t1y + w2 * t1z)  # Jr1
        JB[5][v] = dm * (w0 * t2x + w1 * t2y + w2 * t2z)  # Jr2

    lpos = lpos_ref[...] if nlim else None
    kl = kl_ref[...] if nlim else None
    bl = bl_ref[...] if nlim else None
    dl = dl_ref[...] if nlim else None

    x, qvn, fslot, qfc = _solve_core_pyramid(
        M, qf, qv, JB, (mu[0], mu[1], mu[2]), dist, kc, bc, dc,
        lim_nz, lpos, kl, bl, dl, hd, dtv,
        nv=nv, niter=niter, ls_grid=ls_grid)

    qacc_ref[...] = x
    qvn_ref[...] = qvn
    fslot_ref[...] = fslot
    qfc_ref[...] = qfc


@functools.partial(
    jax.jit, static_argnames=("lim_tab", "niter", "ls_iter", "interpret"))
def fused_rows_batched(M, qf, qv, cdof, rel, nrm, dist, mu3, dmask,
                       kc, bc, dc, lpos, kl, bl, dl, hdamp, dt,
                       lim_tab=(), niter: int = 8, ls_iter: int = 16,
                       interpret: bool = False):
    """Batched fused row-build + solve. Batch-leading inputs:

    M (B,nv,nv), qf/qv/hdamp (B,nv), cdof (B,nv,6), rel/nrm/mu3 (B,K,3),
    dist/kc/bc/dc (B,K), dmask (B,K,nv) — or (K,nv) UNBATCHED when the
    slot->chain mapping is static (no top-k selection) — lpos/kl/bl/dl
    (B,nlim), dt (B,). lim_tab: static (nlim, nv) nested tuple
    (solver.limit_rows_static). Returns
    (qacc, qvel_new, fslot, qfrc_constraint) batch-leading, with
    fslot (B, K) the per-slot summed normal forces.
    """
    B = M.shape[0]
    K, nv = dmask.shape[-2:]
    dmask_static = dmask.ndim == 2
    nlim = lpos.shape[1]
    dtype = jnp.float32
    Bp = pl.cdiv(B, _TB) * _TB
    pad = Bp - B

    def prep(x, perm):
        x = jnp.transpose(x.astype(dtype), perm)
        if pad:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        return x

    Mt = prep(M, (1, 2, 0))
    qft = prep(qf, (1, 0))
    qvt = prep(qv, (1, 0))
    cdoft = prep(cdof, (1, 2, 0))
    relt = prep(rel, (2, 1, 0))
    nrmt = prep(nrm, (2, 1, 0))
    distt = prep(dist, (1, 0))
    mut = prep(mu3, (2, 1, 0))
    kct = prep(kc, (1, 0))
    bct = prep(bc, (1, 0))
    dct = prep(dc, (1, 0))
    hdt = prep(hdamp, (1, 0))
    dtt = prep(dt[:, None], (1, 0))

    ls_grid = (0.0,) + tuple(
        float(a) for a in np.logspace(-3.0, np.log10(4.0), ls_iter - 1))

    # static limit-row structure: coefficients unroll into the kernel
    # program (limit Jacobians are configuration-independent)
    lim_nz = _lim_nonzeros(lim_tab)
    assert len(lim_nz) == nlim, (len(lim_nz), nlim)

    kern = functools.partial(_rows_kernel, nv=nv, K=K, lim_nz=lim_nz,
                             niter=niter, ls_grid=ls_grid,
                             dmask_static=dmask_static)

    def vspec(*shape):
        nd = len(shape)
        return pl.BlockSpec(shape + (_TB,),
                            lambda i, nd=nd: (0,) * nd + (i,),
                            memory_space=pltpu.VMEM)

    if dmask_static:
        dmaskt = jnp.transpose(dmask.astype(dtype), (1, 0))   # (nv, K)
        dmask_spec = pl.BlockSpec((nv, K), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        dmaskt = prep(dmask, (2, 1, 0))
        dmask_spec = vspec(nv, K)

    # nlim==0: feed 1-row dummies (pallas rejects 0-sized blocks); the
    # kernel never reads them (static nlim gate)
    nlim_spec = max(nlim, 1)
    if nlim:
        lim_args = tuple(prep(a, (1, 0)) for a in (lpos, kl, bl, dl))
    else:
        z = jnp.zeros((1, Bp), dtype)
        lim_args = (z, z, z, z)

    out_shape = [
        jax.ShapeDtypeStruct((nv, Bp), dtype),   # qacc
        jax.ShapeDtypeStruct((nv, Bp), dtype),   # qvel_new
        jax.ShapeDtypeStruct((K, Bp), dtype),    # fslot
        jax.ShapeDtypeStruct((nv, Bp), dtype),   # qfrc_constraint
    ]
    qacc, qvn, fslot, qfc = pl.pallas_call(
        kern,
        grid=(Bp // _TB,),
        in_specs=[vspec(nv, nv), vspec(nv), vspec(nv), vspec(nv, 6),
                  vspec(3, K), vspec(3, K), vspec(K), vspec(3, K),
                  dmask_spec, vspec(K), vspec(K), vspec(K),
                  vspec(nlim_spec), vspec(nlim_spec), vspec(nlim_spec),
                  vspec(nlim_spec), vspec(nv), vspec(1)],
        out_specs=[vspec(nv), vspec(nv), vspec(K), vspec(nv)],
        out_shape=out_shape,
        interpret=interpret,
    )(Mt, qft, qvt, cdoft, relt, nrmt, distt, mut, dmaskt, kct, bct, dct,
      *lim_args, hdt, dtt)

    def unprep(x):
        return jnp.transpose(x[..., :B], (1, 0))

    return unprep(qacc), unprep(qvn), unprep(fslot), unprep(qfc)


def _jax_single_raw(M, qf, qv, cdof, rel, nrm, dist, mu3, dmask,
                    kc, bc, dc, lpos, kl, bl, dl, hdamp, dt,
                    lim_tab, niter: int, ls_iter: int):
    """Unbatched pure-JAX mirror of the row-building kernel: build rows
    (edge-major, solver.rows_from_raw) then the standard solve+Euler."""
    from .solver import rows_from_raw
    rows = rows_from_raw(cdof, dmask, rel, nrm, dist, mu3, kc, bc, dc,
                         lim_tab, lpos, kl, bl, dl)
    qacc, qvn, f, qfc = _jax_single(M, qf, qv, rows.J, rows.pos, rows.k,
                                    rows.b, rows.d, hdamp, dt,
                                    niter=niter, ls_iter=ls_iter)
    K = dist.shape[0]
    nlim = lpos.shape[0]
    fslot = f[nlim:].reshape(10, K).sum(axis=0)
    return qacc, qvn, fslot, qfc


@functools.lru_cache(maxsize=None)
def _make_rows_dispatch(lim_tab, niter: int, ls_iter: int):
    single = functools.partial(_jax_single_raw, lim_tab=lim_tab,
                               niter=niter, ls_iter=ls_iter)

    @jax.custom_batching.custom_vmap
    def fused(M, qf, qv, cdof, rel, nrm, dist, mu3, dmask, kc, bc, dc,
              lpos, kl, bl, dl, hdamp, dt):
        if enabled() and M.dtype == jnp.float32:
            outs = fused_rows_batched(
                *[a[None] for a in (M, qf, qv, cdof, rel, nrm, dist, mu3,
                                    dmask, kc, bc, dc, lpos, kl, bl, dl,
                                    hdamp)],
                jnp.reshape(dt, (1,)), lim_tab=lim_tab, niter=niter,
                ls_iter=ls_iter)
            return tuple(o[0] for o in outs)
        return single(M, qf, qv, cdof, rel, nrm, dist, mu3, dmask,
                      kc, bc, dc, lpos, kl, bl, dl, hdamp, dt)

    @fused.def_vmap
    def _rule(axis_size, in_batched, *args):
        kernel_ok = enabled() and args[0].dtype == jnp.float32
        _DMASK = 8

        def bcast(a):
            return jnp.broadcast_to(a[None], (axis_size,) + jnp.shape(a))

        # an UNBATCHED dmask stays 2D for the kernel (static slot->chain
        # table broadcast in VMEM — no per-env gather/transpose)
        bc_args = [a if ib or (i == _DMASK and kernel_ok) else bcast(a)
                   for i, (a, ib) in enumerate(zip(args, in_batched))]
        (M, qf, qv, cdof, rel, nrm, dist, mu3, dmask, kc, bc_, dc,
         lpos, kl, bl, dl, hdamp, dt) = bc_args
        if kernel_ok:
            outs = fused_rows_batched(M, qf, qv, cdof, rel, nrm, dist,
                                      mu3, dmask, kc, bc_, dc, lpos, kl,
                                      bl, dl, hdamp, dt, lim_tab=lim_tab,
                                      niter=niter, ls_iter=ls_iter)
        else:
            outs = jax.vmap(single)(M, qf, qv, cdof, rel, nrm, dist, mu3,
                                    dmask, kc, bc_, dc, lpos, kl, bl, dl,
                                    hdamp, dt)
        return outs, (True, True, True, True)

    return fused


def solve_step_raw(M, qf, qv, cdof, rel, nrm, dist, mu3, dmask,
                   kc, bc, dc, lpos, kl, bl, dl, hdamp, dt,
                   lim_tab=(), niter: int = 8, ls_iter: int = 16,
                   force_jax: bool = False):
    """Row-building contact solve + implicit-damping Euler from RAW
    contact data — the step() fast path on TPU. Returns
    (qacc, qvel_new, fslot, qfrc_constraint); fslot (K,) per-slot
    summed normal forces.

    Dispatch mirrors solve_constraints_euler: fused TPU kernel under
    vmap and for unbatched f32 calls; plain JAX otherwise (no
    custom_vmap wrapper off-TPU, so every transform keeps working).
    """
    if force_jax or not enabled() or M.dtype != jnp.float32:
        return _jax_single_raw(M, qf, qv, cdof, rel, nrm, dist, mu3,
                               dmask, kc, bc, dc, lpos, kl, bl, dl,
                               hdamp, dt, lim_tab=lim_tab, niter=niter,
                               ls_iter=ls_iter)
    return _make_rows_dispatch(lim_tab, niter, ls_iter)(
        M, qf, qv, cdof, rel, nrm, dist, mu3, dmask, kc, bc, dc,
        lpos, kl, bl, dl, hdamp, dt)


def solve_constraints_euler(M, qf, qv, J, pos, k, b, d, hdamp, dt,
                            niter: int = 8, ls_iter: int = 16,
                            force_jax: bool = False):
    """Contact/limit Newton solve + implicit-damping Euler velocity update.

    Dispatches to the fused TPU kernel under vmap (rollout batches, RL
    env batches); unbatched calls and non-TPU backends use the pure-JAX
    path. Returns (qacc, qvel_new, efc_force, qfrc_constraint).

    Off-TPU (or f64, or HMT_NO_PALLAS=1, or `force_jax`) the plain JAX
    function is returned directly — no custom_vmap wrapper — so every
    jax transform (incl. jvp) keeps working there. `force_jax` is for
    callers that jit onto a NON-default device (e.g. the realtime-eval
    robot-proxy sim pinned to host CPU while the default backend is
    TPU): the backend gate can't see the jit target device, so they must
    opt out of the kernel explicitly.
    """
    if force_jax or not enabled() or M.dtype != jnp.float32:
        return _jax_single(M, qf, qv, J, pos, k, b, d, hdamp, dt,
                           niter=niter, ls_iter=ls_iter)
    return _make_dispatch(niter, ls_iter)(M, qf, qv, J, pos, k, b, d,
                                          hdamp, dt)
