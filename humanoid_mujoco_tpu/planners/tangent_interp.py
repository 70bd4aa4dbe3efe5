"""Tangent-space interpolation of nominal states (shared by policies)."""

from __future__ import annotations

import jax

from ..physics.model import Model
from ..physics.tangent import qpos_diff, state_add


def interp_nominal_state(m: Model, qpos_lo: jax.Array, qvel_lo: jax.Array,
                         qpos_hi: jax.Array, qvel_hi: jax.Array, frac):
    """x(frac) between two knot states: qpos via the quaternion-aware
    geodesic (q_lo ⊞ frac*(q_hi ⊟ q_lo)), qvel linearly."""
    dq = qpos_diff(m, qpos_hi, qpos_lo)
    qpos_t = state_add(m, qpos_lo, frac * dq)
    qvel_t = qvel_lo * (1 - frac) + qvel_hi * frac
    return qpos_t, qvel_t
