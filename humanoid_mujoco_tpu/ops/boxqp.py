"""Box-constrained quadratic program — the mju_boxQP analog.

The reference's iLQG backward pass solves, at every Riccati step under
control limits (mjpc/planners/ilqg/backward_pass.cc:158-196, boxqp.h):

    min_x  0.5 x' H x + g' x   s.t.  lower <= x <= upper

via Tassa's projected-Newton active-set method (mju_boxQP), then reuses
the free-subspace Cholesky to compute feedback gains with CLAMPED ROWS
ZEROED — saturated actuators get no feedback, which is exactly what a
gain computed while ignoring the limits gets wrong.

TPU-native design: mju_boxQP's dynamic free-index compression
(boxqp.index) is replaced by a fixed-iteration projected Newton with a
MASKED dense factorization — the clamped rows/columns of H are replaced
by identity, so the matrix stays (n, n), SPD, and the whole solve is
branch-free, vmappable, and scannable. Dense-masked beats gather-based
compression on the MXU (see docs/NOTES.md perf notes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import linalg


class BoxQPResult(NamedTuple):
    x: jax.Array          # (n,) solution, inside [lower, upper]
    free: jax.Array       # (n,) float mask: 1 = free, 0 = clamped
    chol: jax.Array       # (n, n) Cholesky factor of the masked Hessian
    grad: jax.Array       # (n,) objective gradient at x (KKT check)


def _masked_hessian(H: jax.Array, free: jax.Array) -> jax.Array:
    """H with clamped rows/cols zeroed and unit diagonal there — SPD iff
    the free-free block is SPD (permutation-similar to blkdiag(Hff, I))."""
    M = free[:, None] * free[None, :]
    return H * M + jnp.diag(1.0 - free)


def box_qp(H: jax.Array, g: jax.Array, lower: jax.Array, upper: jax.Array,
           x0: jax.Array | None = None, iters: int = 8) -> BoxQPResult:
    """Fixed-iteration projected-Newton box QP (branch-free).

    Per iteration: identify the clamped set (at a bound with the gradient
    pushing outward), Newton-solve the free subspace with the clamped
    variables pinned, clip back into the box. `iters`=8 reaches the exact
    active set on nu<=12 problems in practice (the set is monotone after
    the first couple of flips).
    """
    n = g.shape[0]
    dtype = g.dtype
    eps = jnp.asarray(1e-7, dtype=dtype) * jnp.maximum(
        jnp.max(upper - lower), 1.0)
    x = jnp.clip(jnp.zeros(n, dtype=dtype) if x0 is None else x0,
                 lower, upper)

    def body(x, _):
        grad = g + H @ x
        at_lo = jnp.logical_and(x <= lower + eps, grad > 0)
        at_hi = jnp.logical_and(x >= upper - eps, grad < 0)
        free = 1.0 - jnp.logical_or(at_lo, at_hi).astype(dtype)
        Hm = _masked_hessian(H, free)
        L = linalg.chol_factor(Hm)
        # free-subspace Newton target: x_f = -Hff^{-1} (g_f + Hfc x_c).
        rhs = (g + H @ (x * (1.0 - free))) * free
        sol = linalg.chol_solve(L, rhs)
        x_new = jnp.where(free > 0, -sol, x)
        x_new = jnp.clip(x_new, lower, upper)
        return x_new, (free, L)

    x, (frees, Ls) = jax.lax.scan(body, x, None, length=iters)
    free, L = frees[-1], Ls[-1]
    return BoxQPResult(x=x, free=free, chol=L, grad=g + H @ x)


def free_solve(res: BoxQPResult, rhs: jax.Array) -> jax.Array:
    """Solve the free subspace against a matrix rhs (n, k): clamped rows
    of the result are zero — the gain-extraction step of the reference
    backward pass (backward_pass.cc:178-196)."""
    rhs_masked = rhs * res.free[:, None]
    return linalg.chol_solve(res.chol, rhs_masked) * res.free[:, None]
