"""Fixed-size batched linear algebra for small robot-scale systems.

The systems in this framework are tiny (nv = 18 for the humanoid) but run at
huge batch sizes (thousands of lockstep rollouts). XLA's LAPACK-style batched
factorizations are tuned for large matrices; for n <= ~32 an *unrolled*
Cholesky — a straight-line graph of fused multiply-adds, each elementwise over
the batch — maps far better onto the TPU VPU (batch rides the 128-wide lanes).

These helpers unroll at trace time over the static matrix dimension and are
fully `vmap`/`grad` compatible. TPU-native replacement for the reference's
mju_cholFactor/mju_cholSolve usage (mjpc/planners/ilqg/backward_pass.cc:198-216).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_JITTER = 1e-10

# When True, use XLA's native cholesky/triangular_solve ops instead of the
# unrolled straight-line code. The unrolled form is faster at runtime for
# tiny n on the VPU, but costs ~1000 HLO ops per factorization — under
# jax.jacfwd (planners/derivatives.py) that multiplies into minutes of
# XLA compile time, so the derivative path flips this on via
# `native_scope()`.
#
# Measured on TPU v5e (batch-1024 humanoid step scan): unrolled = 63k
# steps/s @ 593 s compile; native = 41k steps/s @ 22 s compile. Default
# stays unrolled (throughput); export HMT_NATIVE_LINALG=1 for fast
# iteration compiles.
import os as _os

_NATIVE = _os.environ.get("HMT_NATIVE_LINALG", "0") == "1"


class native_scope:
    """Context manager: route chol_factor/chol_solve to native XLA ops."""

    def __enter__(self):
        global _NATIVE
        self._prev = _NATIVE
        _NATIVE = True

    def __exit__(self, *exc):
        global _NATIVE
        _NATIVE = self._prev


def chol_factor(A: jax.Array) -> jax.Array:
    """Cholesky factor L (lower) of SPD A, unrolled over the static size.

    A: (..., n, n). Returns L with A = L @ L.T. Diagonal is clamped positive
    so near-singular inputs degrade gracefully instead of producing NaNs
    (rollout divergence is handled by the caller's failure guard).
    """
    n = A.shape[-1]
    if _NATIVE:
        eye = jnp.eye(n, dtype=A.dtype)
        return jnp.linalg.cholesky(A + _JITTER * eye)
    a = [[A[..., i, j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, _JITTER))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = a[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    zero = jnp.zeros_like(a[0][0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def chol_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b given L = chol_factor(A).

    L: (..., n, n); b: (..., n) or (..., n, m). Unrolled substitution.
    """
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    bb = b[..., None] if vec else b
    if _NATIVE:
        from jax import lax
        y = lax.linalg.triangular_solve(L, bb, left_side=True, lower=True)
        x = lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                        transpose_a=True)
        return x[..., 0] if vec else x
    Lc = [[L[..., i, j, None] for j in range(n)] for i in range(n)]
    # forward: L y = b
    y = [None] * n
    for i in range(n):
        s = bb[..., i, :]
        for k in range(i):
            s = s - Lc[i][k] * y[k]
        y[i] = s / Lc[i][i]
    # backward: L.T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - Lc[k][i] * x[k]
        x[i] = s / Lc[i][i]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


def solve_psd(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve SPD system A x = b (factor + solve)."""
    return chol_solve(chol_factor(A), b)


def symmetrize(A: jax.Array) -> jax.Array:
    return 0.5 * (A + jnp.swapaxes(A, -1, -2))
