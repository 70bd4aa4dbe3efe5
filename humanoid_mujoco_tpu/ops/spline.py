"""Time-indexed control splines (zero / linear / cubic-Hermite), batched.

TPU-native equivalent of the reference's TimeSpline (mjpc/spline/spline.h:41)
and the Zero/Linear/Cubic interpolation helpers
(mjpc/utilities.cc:286-397, FiniteDifferenceSlope / CubicCoefficients):
fixed-size knot arrays instead of ring buffers, `jnp.searchsorted` instead of
binary search, and all query times evaluated in one vectorized gather so a
whole horizon of actions comes out of a single fused kernel.

A spline is just `(times (K,), values (K, dim))` — a pytree leaf pair, so
planners can carry policies through `lax.scan` and `vmap` untouched.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp

_EPS = 1e-9


class SplineOrder(enum.IntEnum):
    ZERO = 0    # piecewise-constant hold
    LINEAR = 1
    CUBIC = 2   # Hermite with finite-difference slopes


def fd_slopes(times: jax.Array, values: jax.Array) -> jax.Array:
    """Per-knot slopes by finite differences (reference utilities.cc:319-347).

    Interior knots average the two adjacent secants; the first knot uses the
    first secant; the last knot uses the last secant (zero when K == 2).
    times: (K,), values: (K, dim) -> (K, dim).
    """
    K = times.shape[0]
    if K == 1:
        return jnp.zeros_like(values)
    dt = jnp.maximum(times[1:] - times[:-1], _EPS)[:, None]  # (K-1, 1)
    secant = (values[1:] - values[:-1]) / dt                 # (K-1, dim)
    first = secant[0:1]
    last = secant[-1:] if K > 2 else jnp.zeros_like(secant[-1:])
    if K == 2:
        return jnp.concatenate([first, last], axis=0)
    interior = 0.5 * (secant[1:] + secant[:-1])              # (K-2, dim)
    return jnp.concatenate([first, interior, last], axis=0)


def spline_sample(times: jax.Array, values: jax.Array, t: jax.Array,
                  order: int = SplineOrder.ZERO) -> jax.Array:
    """Sample the spline at times t.

    times: (K,) non-decreasing; values: (K, dim); t: scalar or any shape.
    Returns values broadcast over t's shape: t.shape + (dim,).
    Out-of-range queries clamp to the end knots (reference FindInterval
    semantics, mjpc/utilities.h:122).
    """
    K = times.shape[0]
    t = jnp.asarray(t)
    if K == 1:
        return jnp.broadcast_to(values[0], t.shape + (values.shape[-1],))
    idx = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0, K - 1)
    if order == SplineOrder.ZERO:
        return values[idx]

    lo = jnp.clip(idx, 0, K - 2)
    hi = lo + 1
    t_lo, t_hi = times[lo], times[hi]
    h = jnp.maximum(t_hi - t_lo, _EPS)
    s = jnp.clip((t - t_lo) / h, 0.0, 1.0)[..., None]  # normalized + clamped

    v_lo, v_hi = values[lo], values[hi]
    if order == SplineOrder.LINEAR:
        return v_lo * (1.0 - s) + v_hi * s

    if order == SplineOrder.CUBIC:
        m = fd_slopes(times, values)
        m_lo, m_hi = m[lo], m[hi]
        s2, s3 = s * s, s * s * s
        a = 2 * s3 - 3 * s2 + 1
        b = (s3 - 2 * s2 + s) * h[..., None]
        c = -2 * s3 + 3 * s2
        d = (s3 - s2) * h[..., None]
        return a * v_lo + b * m_lo + c * v_hi + d * m_hi

    raise ValueError(f"unknown spline order {order}")


def spline_resample(times: jax.Array, values: jax.Array,
                    new_times: jax.Array,
                    order: int = SplineOrder.ZERO) -> jax.Array:
    """Evaluate the spline at a fresh knot grid (policy shift-to-now).

    Mirrors the reference's UpdateNominalPolicy resampling
    (mjpc/planners/sampling/planner.cc:236-310).
    """
    return spline_sample(times, values, new_times, order)
