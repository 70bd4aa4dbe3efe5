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

    Lm = _chol(M, nv)
    a_s = _chol_solve_vec(Lm, qf, nv)

    # diagA_i = || L^-1 J_i ||^2  via forward substitution on (ne, TB) rows
    ys = []
    for i in range(nv):
        s = J[i]
        for k2 in range(i):
            s = s - L_ik(Lm, i, k2) * ys[k2]
        ys.append(s / Lm[i, i][None, :])
    diagA = ys[0] * ys[0]
    for y in ys[1:]:
        diagA = diagA + y * y
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
        H = M + jnp.stack(
            [jnp.sum((J[u] * Da)[None, :, :] * J, axis=1)
             for u in range(nv)])
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

    qacc_ref[...] = x
    qvn_ref[...] = qv + dv
    f_ref[...] = f
    qfc_ref[...] = qfc


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
