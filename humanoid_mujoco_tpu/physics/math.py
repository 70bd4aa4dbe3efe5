"""Quaternion / rotation / spatial-vector math, batched and jit-friendly.

All functions are pure, operate on the trailing axes, and are safe under
`jax.vmap` / `jax.grad`. Quaternions use MuJoCo's (w, x, y, z) convention.

TPU-native counterpart of the reference's quaternion utilities
(mjpc/utilities.h:174 StateDiff and MuJoCo's mju_quat* routines) — written
from scratch for f32 with normalization guards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


# ---------------------------------------------------------------------------
# quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_id(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q (active rotation, R(q) v)."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    # v' = v + 2 qv x (qv x v + qw v)
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by the inverse of q (world -> body for body-pose quats)."""
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Rotation matrix R with R @ v == quat_rotate(q, v). Shape (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion, branch-free (Shepperd via max trace)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    # four candidate constructions; pick numerically best by largest pivot
    qw = jnp.stack([1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
                    1 - m00 + m11 - m22, 1 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, _EPS)) * 0.5
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cand = jnp.stack(
        [
            jnp.stack([w0, (m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0),
                       (m10 - m01) / (4 * w0)], axis=-1),
            jnp.stack([(m21 - m12) / (4 * x1), x1, (m01 + m10) / (4 * x1),
                       (m02 + m20) / (4 * x1)], axis=-1),
            jnp.stack([(m02 - m20) / (4 * y2), (m01 + m10) / (4 * y2), y2,
                       (m12 + m21) / (4 * y2)], axis=-1),
            jnp.stack([(m10 - m01) / (4 * z3), (m02 + m20) / (4 * z3),
                       (m12 + m21) / (4 * z3), z3], axis=-1),
        ],
        axis=-2,
    )
    best = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    # canonical sign (w >= 0)
    return quat_normalize(q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0))


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit axis + angle -> quaternion."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def safe_norm(v: jax.Array, axis: int = -1, keepdims: bool = False,
              eps: float = 1e-20) -> jax.Array:
    """sqrt(|v|^2 + eps): smooth at v = 0 with ZERO gradient there.

    jnp.linalg.norm has a NaN derivative at exactly 0, which poisons
    jax.jacfwd through state_diff / quat integration when nominal and
    query states coincide (they always do along a nominal trajectory) —
    this is the AD-safe replacement used everywhere on that path.
    """
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims) + eps)


def quat_exp(v: jax.Array) -> jax.Array:
    """exp map: rotation vector v (axis*angle) -> quaternion. AD-safe
    at v = 0 (smooth safe_norm + sinc series)."""
    angle = safe_norm(v, keepdims=True)
    s = jnp.where(angle < 1e-6, 0.5 - angle * angle / 48.0,
                  jnp.sin(0.5 * angle) / angle)
    return jnp.concatenate([jnp.cos(0.5 * angle), v * s], axis=-1)


def quat_log(q: jax.Array) -> jax.Array:
    """log map: quaternion -> rotation vector (inverse of quat_exp).
    AD-safe at q = identity."""
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)  # shortest arc
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    vnorm = safe_norm(q[..., 1:4], keepdims=True)
    angle = 2.0 * jnp.arctan2(vnorm, w)
    # smooth near identity: angle/vnorm -> 2/w as vnorm -> 0
    scale = angle / vnorm
    return q[..., 1:4] * scale


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
    """Integrate quaternion by angular velocity expressed in the LOCAL frame.

    Matches MuJoCo's mju_quatIntegrate semantics used by mj_integratePos for
    free/ball joints: q' = q ⊗ exp(ω_local dt).
    """
    return quat_normalize(quat_mul(q, quat_exp(omega * dt)))


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """Tangent-space difference: ω_local such that qa = qb ⊗ exp(ω).

    The velocity-dimension analog of the reference's StateDiff
    (mjpc/utilities.h:174 / mj_differentiatePos).
    """
    return quat_log(quat_mul(quat_conj(qb), qa))


# ---------------------------------------------------------------------------
# spatial vectors: 6-vectors [angular(3); linear(3)] in the world frame
# about a common anchor point.
# ---------------------------------------------------------------------------

def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
    """Spatial cross product v ×m m (motion × motion), 6-vectors (...,6)."""
    vang, vlin = v[..., :3], v[..., 3:]
    mang, mlin = m[..., :3], m[..., 3:]
    ang = jnp.cross(vang, mang)
    lin = jnp.cross(vlin, mang) + jnp.cross(vang, mlin)
    return jnp.concatenate([ang, lin], axis=-1)


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial cross product v ×f f (motion × force), 6-vectors (...,6)."""
    vang, vlin = v[..., :3], v[..., 3:]
    fang, flin = f[..., :3], f[..., 3:]
    ang = jnp.cross(vang, fang) + jnp.cross(vlin, flin)
    lin = jnp.cross(vang, flin)
    return jnp.concatenate([ang, lin], axis=-1)


def spatial_inertia(mass: jax.Array, inertia_world: jax.Array,
                    com_offset: jax.Array) -> jax.Array:
    """Spatial inertia (6,6) about the anchor, [angular; linear] layout.

    mass: (...,) — body mass
    inertia_world: (..., 3, 3) — rotational inertia about the body COM, world axes
    com_offset: (..., 3) — COM position minus anchor point
    """
    c = com_offset
    cx = skew(c)
    m = mass[..., None, None]
    top_left = inertia_world + m * jnp.matmul(
        cx, jnp.swapaxes(cx, -1, -2), precision=jax.lax.Precision.HIGHEST)
    top_right = m * cx
    bot_left = m * jnp.swapaxes(cx, -1, -2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cx.dtype), cx.shape)
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix such that skew(v) @ u == cross(v, u)."""
    z = jnp.zeros_like(v[..., 0])
    rows = jnp.stack(
        [z, -v[..., 2], v[..., 1],
         v[..., 2], z, -v[..., 0],
         -v[..., 1], v[..., 0], z],
        axis=-1,
    )
    return rows.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def normalize(v: jax.Array, axis: int = -1) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), _EPS)


def local_gravity(quat_wxyz: jax.Array) -> jax.Array:
    """World -z expressed in the body frame (IMU gravity direction)."""
    g = jnp.broadcast_to(
        jnp.array([0.0, 0.0, -1.0], dtype=quat_wxyz.dtype),
        quat_wxyz.shape[:-1] + (3,),
    )
    return quat_rotate_inv(quat_wxyz, g)
