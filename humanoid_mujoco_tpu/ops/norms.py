"""Scalar penalty norms with analytic value / gradient / Hessian.

TPU-native re-derivation of the reference's norms library
(mjpc/norm.h:24-35, mjpc/norm.cc:50-200): eight penalty shapes used by the
residual cost model. Each norm maps a residual slice x ∈ R^n to a scalar,
optionally with gradient (n,) and Hessian (n, n).

Everything is pure jnp and batchable: `x` may have leading batch axes; the
reduction is always over the last axis. Enum values keep the reference's
numbering (4 is intentionally unused) so task configs interoperate.
"""

from __future__ import annotations

import enum
from typing import Tuple

import jax
import jax.numpy as jnp

_MINVAL = 1e-15


class NormType(enum.IntEnum):
    NULL = -1
    QUADRATIC = 0
    L22 = 1
    L2 = 2
    COSH = 3
    POWER_LOSS = 5
    SMOOTH_ABS = 6
    SMOOTH_ABS2 = 7
    RECTIFY = 8


def norm_param_dim(norm_type: int) -> int:
    return {
        NormType.NULL: 0,
        NormType.QUADRATIC: 0,
        NormType.L22: 2,
        NormType.L2: 1,
        NormType.COSH: 1,
        NormType.POWER_LOSS: 1,
        NormType.SMOOTH_ABS: 1,
        NormType.SMOOTH_ABS2: 2,
        NormType.RECTIFY: 1,
    }[NormType(norm_type)]


# --- values ----------------------------------------------------------------
# Each `_<name>` returns the scalar norm over the last axis.

def _null(x, p, q):
    return x[..., 0]


def _quadratic(x, p, q):
    return 0.5 * jnp.sum(x * x, axis=-1)


def _l22(x, p, q):
    # ((x.x)^(q/2) + p^q)^(1/q) - p
    c = jnp.sum(x * x, axis=-1)
    a = jnp.power(jnp.maximum(c, _MINVAL), q / 2) + jnp.power(p, q)
    return jnp.power(a, 1.0 / q) - p


def _l2(x, p, q):
    return jnp.sqrt(jnp.sum(x * x, axis=-1) + p * p) - p


def _cosh(x, p, q):
    return jnp.sum(p * p * (jnp.cosh(x / p) - 1.0), axis=-1)


def _power(x, p, q):
    return jnp.sum(jnp.power(jnp.abs(x) + _MINVAL, p), axis=-1)


def _smooth_abs(x, p, q):
    return jnp.sum(jnp.sqrt(x * x + p * p) - p, axis=-1)


def _smooth_abs2(x, p, q):
    a = jnp.abs(x) + _MINVAL
    e = jnp.power(a, q) + jnp.power(p, q)
    return jnp.sum(jnp.power(e, 1.0 / q) - p, axis=-1)


def _rectify(x, p, q):
    # p * log(1 + exp(x / p)); p == 0 degenerates to relu(x)
    soft = p * jnp.logaddexp(0.0, x / jnp.maximum(p, _MINVAL))
    hard = jnp.maximum(x, 0.0)
    return jnp.sum(jnp.where(p > 0, soft, hard), axis=-1)


_NORM_FNS = {
    NormType.NULL: _null,
    NormType.QUADRATIC: _quadratic,
    NormType.L22: _l22,
    NormType.L2: _l2,
    NormType.COSH: _cosh,
    NormType.POWER_LOSS: _power,
    NormType.SMOOTH_ABS: _smooth_abs,
    NormType.SMOOTH_ABS2: _smooth_abs2,
    NormType.RECTIFY: _rectify,
}


def norm_value(x: jax.Array, norm_type: int, p: float = 0.0,
               q: float = 0.0) -> jax.Array:
    """Norm value; `norm_type` must be a static python int."""
    return _NORM_FNS[NormType(norm_type)](x, p, q)


def norm_grad(x: jax.Array, norm_type: int, p: float = 0.0,
              q: float = 0.0) -> Tuple[jax.Array, jax.Array]:
    """(value, gradient) — gradient via analytic forms (cheap, fused)."""
    t = NormType(norm_type)
    if t == NormType.NULL:
        return _null(x, p, q), jnp.ones_like(x)
    if t == NormType.QUADRATIC:
        return _quadratic(x, p, q), x
    if t == NormType.L22:
        c = jnp.sum(x * x, axis=-1, keepdims=True)
        cs = jnp.maximum(c, _MINVAL)
        a = jnp.power(cs, q / 2) + jnp.power(p, q)
        s = jnp.power(a, 1.0 / q)
        b = s / a * jnp.power(cs, q / 2 - 1)
        return s[..., 0] - p, b * x
    if t == NormType.L2:
        s = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + p * p)
        return s[..., 0] - p, x / jnp.maximum(s, _MINVAL)
    if t == NormType.COSH:
        return _cosh(x, p, q), p * jnp.sinh(x / p)
    if t == NormType.POWER_LOSS:
        a = jnp.abs(x) + _MINVAL
        return _power(x, p, q), jnp.sign(x) * p * jnp.power(a, p - 1)
    if t == NormType.SMOOTH_ABS:
        s = jnp.sqrt(x * x + p * p)
        return jnp.sum(s - p, axis=-1), x / jnp.maximum(s, _MINVAL)
    if t == NormType.SMOOTH_ABS2:
        a = jnp.abs(x) + _MINVAL
        d = jnp.power(a, q)
        e = d + jnp.power(p, q)
        s = jnp.power(e, 1.0 / q)
        ccoef = s * jnp.power(a, q - 2) / e
        return jnp.sum(s - p, axis=-1), ccoef * x
    if t == NormType.RECTIFY:
        ps = jnp.maximum(p, _MINVAL)
        sig = jax.nn.sigmoid(x / ps)
        g = jnp.where(p > 0, sig, (x > 0).astype(x.dtype))
        return _rectify(x, p, q), g
    raise ValueError(f"unknown norm type {norm_type}")


def norm_hess(x: jax.Array, norm_type: int, p: float = 0.0,
              q: float = 0.0) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(value, gradient, Hessian). Hessian shape (..., n, n)."""
    t = NormType(norm_type)
    n = x.shape[-1]
    eye = jnp.eye(n, dtype=x.dtype)
    y, g = norm_grad(x, norm_type, p, q)
    if t == NormType.NULL:
        H = jnp.zeros(x.shape + (n,), dtype=x.dtype)
    elif t == NormType.QUADRATIC:
        H = jnp.broadcast_to(eye, x.shape + (n,))
    elif t == NormType.L22:
        c = jnp.sum(x * x, axis=-1, keepdims=True)
        cs = jnp.maximum(c, _MINVAL)
        a = jnp.power(cs, q / 2) + jnp.power(p, q)
        s = jnp.power(a, 1.0 / q)
        d = jnp.power(cs, q / 2 - 1)
        b = (s / a * d)[..., None]
        cc = ((1 - q) * d / a + (q - 2) / cs)[..., None]
        H = b * (eye + x[..., :, None] * x[..., None, :] * cc)
    elif t == NormType.L2:
        s = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + p * p)
        H = (eye - g[..., :, None] * g[..., None, :]) / jnp.maximum(
            s[..., None], _MINVAL)
    elif t == NormType.COSH:
        H = eye * jnp.cosh(x / p)[..., None, :]
    elif t == NormType.POWER_LOSS:
        a = jnp.abs(x) + _MINVAL
        H = eye * ((p - 1) * p * jnp.power(a, p - 2))[..., None, :]
    elif t == NormType.SMOOTH_ABS:
        s = jnp.maximum(jnp.sqrt(x * x + p * p), _MINVAL)
        H = eye * ((1 - g * g) / s)[..., None, :]
    elif t == NormType.SMOOTH_ABS2:
        a = jnp.abs(x) + _MINVAL
        d = jnp.power(a, q)
        e = d + jnp.power(p, q)
        s = jnp.power(e, 1.0 / q)
        cc = s * jnp.power(a, q - 2) / e
        H = eye * (cc * (q - 1) * (1 - d / e))[..., None, :]
    elif t == NormType.RECTIFY:
        ps = jnp.maximum(p, _MINVAL)
        sig = jax.nn.sigmoid(x / ps)
        h = jnp.where(p > 0, sig * (1 - sig) / ps, jnp.zeros_like(x))
        H = eye * h[..., None, :]
    else:
        raise ValueError(f"unknown norm type {norm_type}")
    return y, g, H
