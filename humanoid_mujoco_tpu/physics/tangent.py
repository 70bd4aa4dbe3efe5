"""Tangent-space (velocity-coordinate) state arithmetic.

The analog of mj_integratePos / mj_differentiatePos and the reference's
quaternion-aware StateDiff (mjpc/utilities.h:174): configurations live on
a manifold (free/ball quaternions), derivatives and DDP algebra live in
the 2*nv tangent space. These two maps are the bridge:

    state_add(m, qpos, dq)  : qpos ⊞ dq   (dq in R^nv)
    qpos_diff(m, q1, q0)    : q1 ⊟ q0     -> R^nv

Both are exact inverses to first order and jax.jacfwd-able, which is what
planners/derivatives.py exploits to get analytic A, B matrices instead of
the reference's finite differences (mjd_transitionFD).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import math as pm
from .model import JointType, Model


def state_add(m: Model, qpos: jax.Array, dq: jax.Array) -> jax.Array:
    """qpos ⊞ dq with quaternion exp-map for free/ball joints."""
    s = m.struct
    out = qpos
    for j in range(s.njnt):
        qadr, vadr = s.jnt_qadr[j], s.jnt_vadr[j]
        t = s.jnt_type[j]
        if t == JointType.FREE:
            out = out.at[qadr:qadr + 3].set(
                qpos[qadr:qadr + 3] + dq[vadr:vadr + 3])
            q = pm.quat_mul(pm.quat_normalize(qpos[qadr + 3:qadr + 7]),
                            pm.quat_exp(dq[vadr + 3:vadr + 6]))
            out = out.at[qadr + 3:qadr + 7].set(q)
        elif t == JointType.BALL:
            q = pm.quat_mul(pm.quat_normalize(qpos[qadr:qadr + 4]),
                            pm.quat_exp(dq[vadr:vadr + 3]))
            out = out.at[qadr:qadr + 4].set(q)
        else:
            out = out.at[qadr].set(qpos[qadr] + dq[vadr])
    return out


def qpos_diff(m: Model, q1: jax.Array, q0: jax.Array) -> jax.Array:
    """q1 ⊟ q0 -> (nv,) tangent vector (local-frame quaternion log)."""
    s = m.struct
    parts = []
    for j in range(s.njnt):
        qadr = s.jnt_qadr[j]
        t = s.jnt_type[j]
        if t == JointType.FREE:
            parts.append(q1[qadr:qadr + 3] - q0[qadr:qadr + 3])
            parts.append(pm.quat_sub(pm.quat_normalize(q1[qadr + 3:qadr + 7]),
                                     pm.quat_normalize(q0[qadr + 3:qadr + 7])))
        elif t == JointType.BALL:
            parts.append(pm.quat_sub(pm.quat_normalize(q1[qadr:qadr + 4]),
                                     pm.quat_normalize(q0[qadr:qadr + 4])))
        else:
            parts.append(q1[qadr:qadr + 1] - q0[qadr:qadr + 1])
    return jnp.concatenate(parts) if parts else jnp.zeros(0, dtype=q1.dtype)


def state_diff(m: Model, qpos1: jax.Array, qvel1: jax.Array,
               qpos0: jax.Array, qvel0: jax.Array) -> jax.Array:
    """Full-state tangent difference (2*nv,): [qpos ⊟ ; qvel -]."""
    return jnp.concatenate([qpos_diff(m, qpos1, qpos0), qvel1 - qvel0])
