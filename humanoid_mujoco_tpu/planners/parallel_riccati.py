"""Associative-scan Riccati backward pass — the long-horizon scaling
story (SURVEY §5 "long-context analog": the reference's horizon cap is
kMaxTrajectoryHorizon=512, handled sequentially; on TPU the backward
pass can run in O(log T) depth instead).

Formulation: temporal parallelization of dynamic programming (Sarkka &
Garcia-Fernandez): each step's conditional value function

    R_k(x, y) = 1/2 (y - A x - b)' C^+ (y - A x - b)
                + 1/2 x' J x - eta' x

is an element (A, b, C, eta, J); composing two (minimizing over the
intermediate state) is ASSOCIATIVE:

    A_ij = A_j (I + C_i J_j)^-1 A_i
    b_ij = A_j (I + C_i J_j)^-1 (b_i + C_i eta_j) + b_j
    C_ij = A_j (I + C_i J_j)^-1 C_i A_j' + C_j
    eta_ij = A_i' (I + J_j C_i)^-1 (eta_j - J_j b_i) + eta_i
    J_ij = A_i' (I + J_j C_i)^-1 J_j A_i + J_i

so `jax.lax.associative_scan` (reverse) produces every suffix value
function V_k(x) = 1/2 x' J_k x - eta_k' x in parallel, and the LQR
gains follow per-step. Control limits are NOT handled here — the
sequential boxQP pass (planners/ilqg.py) remains the limit-aware
default; this is the unconstrained long-horizon alternative
(cross/linear terms are folded in by completing the square first).

Adoption status (measured, single chip, humanoid dims n=18/nu=12):
both passes are dispatch/latency-bound through the TPU tunnel at
T<=512 (~26-37 ms either way; parallel 1.09x at T=128, below 1x at
T=512), so the sequential boxQP pass stays the planner default. The
O(log T) depth pays off when the backward pass is a fused inner stage
of a larger jit (no per-pass dispatch) or on longer horizons than the
reference's 512 cap — it is kept as the documented scaling path, at
1e-14 agreement with the sequential oracle in f64.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class _Elem(NamedTuple):
    A: jax.Array     # (T, n, n)
    b: jax.Array     # (T, n)
    C: jax.Array     # (T, n, n)
    eta: jax.Array   # (T, n)
    J: jax.Array     # (T, n, n)


def _combine(ei: _Elem, ej: _Elem) -> _Elem:
    """e_i then e_j (i earlier in time), minimized over the shared
    intermediate state; batched over the leading axis."""
    n = ei.A.shape[-1]
    I = jnp.eye(n, dtype=ei.A.dtype)

    def one(Ai, bi, Ci, etai, Ji, Aj, bj, Cj, etaj, Jj):
        M = jnp.linalg.solve(I + Ci @ Jj, jnp.concatenate(
            [Ai, (bi + Ci @ etaj)[:, None], Ci], axis=1))
        MAi, Mb, MCi = M[:, :n], M[:, n], M[:, n + 1:]
        N = jnp.linalg.solve(I + Jj @ Ci, jnp.concatenate(
            [(etaj - Jj @ bi)[:, None], Jj @ Ai], axis=1))
        Nv, NJAi = N[:, 0], N[:, 1:]
        return (Aj @ MAi, Aj @ Mb + bj, Aj @ MCi @ Aj.T + Cj,
                Ai.T @ Nv + etai, Ai.T @ NJAi + Ji)

    A, b, C, eta, J = jax.vmap(one)(ei.A, ei.b, ei.C, ei.eta, ei.J,
                                    ej.A, ej.b, ej.C, ej.eta, ej.J)
    return _Elem(A, b, C, eta, J)


def parallel_riccati(A: jax.Array, B: jax.Array, c: jax.Array,
                     cxx: jax.Array, cxu: jax.Array, cuu: jax.Array,
                     cx: jax.Array, cu: jax.Array, PT: jax.Array,
                     pT: jax.Array
                     ) -> Tuple[jax.Array, jax.Array, jax.Array,
                                jax.Array]:
    """LQR backward pass in O(log T) depth.

    Inputs (T steps): dynamics x' = A x + B u + c; stage cost
    1/2 x'cxx x + cx'x + 1/2 u'cuu u + cu'u + x'cxu u; terminal
    1/2 x'PT x + pT'x. Returns (K, k, P, p): the affine policy
    u_t = -K_t x_t - k_t and the value expansion V_t = 1/2 x'P x + p'x
    at every step.
    """
    T, n = A.shape[0], A.shape[-1]
    dtype = A.dtype

    # complete the square in u: u = v - cuu^-1 (cu + cxu' x)
    cuu_inv_cu = jnp.linalg.solve(cuu, cu[..., None])[..., 0]   # (T,nu)
    cuu_inv_cxuT = jnp.linalg.solve(cuu, jnp.swapaxes(cxu, -1, -2))
    At = A - jnp.einsum("tij,tjk->tik", B, cuu_inv_cxuT)
    ct = c - jnp.einsum("tij,tj->ti", B, cuu_inv_cu)
    Xt = cxx - jnp.einsum("tij,tjk->tik", cxu, cuu_inv_cxuT)
    xt = cx - jnp.einsum("tij,tj->ti", cxu, cuu_inv_cu)

    # elements: step k cost BEFORE transition + terminal element
    Cq = jnp.einsum("tij,tjk,tlk->til", B,
                    jnp.linalg.inv(cuu), B)              # B cuu^-1 B'
    elems = _Elem(
        A=jnp.concatenate([At, jnp.zeros((1, n, n), dtype)], axis=0),
        b=jnp.concatenate([ct, jnp.zeros((1, n), dtype)], axis=0),
        C=jnp.concatenate([Cq, jnp.zeros((1, n, n), dtype)], axis=0),
        eta=jnp.concatenate([-xt, -pT[None]], axis=0),
        J=jnp.concatenate([Xt, PT[None]], axis=0),
    )
    # reverse=True scans the flipped sequence, so the operator receives
    # (later-in-time, earlier-in-time); _combine wants (earlier, later)
    suffix = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), elems, reverse=True)

    # V_k(x) = 1/2 x' J x - eta' x for the suffix STARTING at k; the
    # cost-to-go AFTER step k is the suffix starting at k+1
    P_next = suffix.J[1:]                                # (T, n, n)
    p_next = -suffix.eta[1:]                             # (T, n)

    # standard gain recovery from V_{k+1}
    BtP = jnp.einsum("tji,tjk->tik", B, P_next)          # B' P
    Quu = cuu + jnp.einsum("tij,tjk->tik", BtP, B)
    Qux = jnp.swapaxes(cxu, -1, -2) + jnp.einsum(
        "tij,tjk->tik", BtP, A)
    qu = (cu + jnp.einsum("tij,tj->ti", BtP, c)
          + jnp.einsum("tji,tj->ti", B, p_next))
    K = jnp.linalg.solve(Quu, Qux)
    k = jnp.linalg.solve(Quu, qu[..., None])[..., 0]

    P = jnp.concatenate([suffix.J[:1], P_next], axis=0)[:-1]
    p = jnp.concatenate([-suffix.eta[:1], p_next], axis=0)[:-1]
    return K, k, suffix.J, -suffix.eta


def sequential_riccati(A, B, c, cxx, cxu, cuu, cx, cu, PT, pT):
    """Reference O(T)-depth backward pass (the lax.scan formulation the
    iLQG planner uses, without limits) — the oracle the parallel pass
    is tested against."""

    def step(carry, inp):
        P, p = carry
        A_, B_, c_, cxx_, cxu_, cuu_, cx_, cu_ = inp
        BtP = B_.T @ P
        Quu = cuu_ + BtP @ B_
        Qux = cxu_.T + BtP @ A_
        qu = cu_ + BtP @ c_ + B_.T @ p
        K = jnp.linalg.solve(Quu, Qux)
        kk = jnp.linalg.solve(Quu, qu)
        AtP = A_.T @ P
        Pn = (cxx_ + AtP @ A_ - Qux.T @ K)
        pn = (cx_ + AtP @ c_ + A_.T @ p - Qux.T @ kk)
        return (Pn, pn), (K, kk, Pn, pn)

    (PF, pF), (K, k, P, p) = jax.lax.scan(
        step, (PT, pT), (A, B, c, cxx, cxu, cuu, cx, cu), reverse=True)
    return K, k, P, p
