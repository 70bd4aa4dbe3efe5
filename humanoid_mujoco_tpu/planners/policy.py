"""Spline action policies shared by the sampling-family planners.

The reference's SamplingPolicy is a TimeSpline plus interpolation order
(mjpc/planners/sampling/policy.h); here it is a fixed-size pytree
(times (K,), values (K, nu)) — see ops/spline.py for the interpolants.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.spline import SplineOrder, spline_sample
from ..physics.model import Model


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SplinePolicy:
    times: jax.Array    # (K,)
    values: jax.Array   # (K, nu)

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def init_policy(m: Model, nknots: int, dtype=None) -> SplinePolicy:
    dtype = dtype or m.body_pos.dtype
    mid = 0.5 * (m.act_ctrlrange[:, 0] + m.act_ctrlrange[:, 1])
    return SplinePolicy(
        times=jnp.linspace(0.0, 1.0, nknots).astype(dtype),
        values=jnp.broadcast_to(mid, (nknots, m.nu)).astype(dtype))


def knot_times(t0: jax.Array, horizon_s, nknots: int,
               order: int) -> jax.Array:
    """Fresh knot grid starting at t0 (UpdateNominalPolicy spacing,
    sampling/planner.cc:284-289: horizon/K for zero-order, else
    horizon/(K-1))."""
    if order == SplineOrder.ZERO:
        shift = horizon_s / nknots
    else:
        shift = horizon_s / max(nknots - 1, 1)
    return t0 + shift * jnp.arange(nknots, dtype=jnp.asarray(t0).dtype)


def resample_policy(policy: SplinePolicy, t0: jax.Array, horizon_s,
                    nknots: int, order: int) -> SplinePolicy:
    """Shift-to-now: evaluate the current plan on a fresh knot grid
    (sampling/planner.cc:284-309)."""
    new_times = knot_times(t0, horizon_s, nknots, order)
    new_values = spline_sample(policy.times, policy.values, new_times, order)
    return SplinePolicy(times=new_times, values=new_values)


def policy_action(m: Model, policy: SplinePolicy, t: jax.Array,
                  order: int) -> jax.Array:
    """Query the policy at time t, clamped to ctrlrange
    (SamplingPolicy::Action)."""
    a = spline_sample(policy.times, policy.values, t, order)
    return jnp.clip(a, m.act_ctrlrange[:, 0], m.act_ctrlrange[:, 1])
