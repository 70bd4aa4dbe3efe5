"""Direct (batch) trajectory optimizer — the mjpc/direct/ rebuild.

The reference's "Direct" optimizer (direct/direct.cc, docs/DIRECT.md)
estimates a configuration trajectory q_{0:T} from noisy sensor data by
minimizing

    sum_t |y_t - h(q_t, v_t)|^2_Rinv  +  w_f * |id(q, v, a)_t - tau_t|^2

with velocities/accelerations by finite difference on the configuration
manifold, Gauss-Newton on a banded Hessian (nband = 3*nv,
direct.cc:136, band Cholesky at 504-506).

TPU-native: residual Jacobians come from ONE jax.jacfwd over the whole
stacked tangent perturbation (the per-knot FD Jacobians + band assembly
collapse into a single compiled kernel), solved densely with XLA's
native Cholesky — at W*nv of a few hundred the compiler's fused dense
solve beats hand-banded code on the MXU. Optional joint model-parameter
estimation (mass scaling) mirrors direct/model_parameters.cc.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..estimators.sensors import SensorModel, measure
from ..ops import linalg
from ..physics.engine import inverse_dynamics
from ..physics.model import Model
from ..physics.tangent import qpos_diff, state_add


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DirectConfig:
    gn_iters: int = dataclasses.field(default=6, metadata=dict(static=True))
    estimate_mass: bool = dataclasses.field(default=False,
                                            metadata=dict(static=True))
    # force residual weight: FD accelerations at small dt amplify config
    # noise by 1/dt^2, so the force term needs down-weighting relative to
    # the sensor term (the reference exposes the same trade-off as
    # per-term weights in direct/direct.cc)
    force_weight: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-4))
    reg: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-4))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DirectResult:
    qpos: jax.Array      # (T, nq) optimized configurations
    qvel: jax.Array      # (T-1, nv) FD velocities
    cost: jax.Array      # () final cost
    cost_initial: jax.Array
    mass_scale: jax.Array  # () estimated mass multiplier (1 if disabled)


def _fd_velocities(m: Model, qpos_seq: jax.Array, dt) -> jax.Array:
    """v_t = (q_{t+1} ⊖ q_t) / dt on the configuration manifold."""
    def diff(q0, q1):
        return qpos_diff(m, q1, q0) / dt
    return jax.vmap(diff)(qpos_seq[:-1], qpos_seq[1:])


def direct_residuals(m: Model, cfg: DirectConfig, sensor: SensorModel,
                     qpos_seq: jax.Array, y_seq: jax.Array,
                     ctrl_seq: jax.Array, dt, mass_scale) -> jax.Array:
    """Stacked weighted residual vector for the whole window."""
    mm = m.replace(body_mass=m.body_mass * mass_scale) \
        if cfg.estimate_mass else m
    v = _fd_velocities(mm, qpos_seq, dt)                  # (T-1, nv)
    a = (v[1:] - v[:-1]) / dt                             # (T-2, nv)

    # sensor residuals at interior knots (velocity available)
    def sres(q, vv, y):
        return (y - measure(mm, q, vv)) / sensor.noise

    r_y = jax.vmap(sres)(qpos_seq[1:-1], 0.5 * (v[1:] + v[:-1]),
                         y_seq[1:-1])                     # (T-2, ny)

    # force residuals: id(q, v, a) - applied actuation
    from ..physics.engine import actuation

    def fres(q, vv, aa, u):
        tau = actuation(mm, q, vv, u)
        return jnp.sqrt(cfg.force_weight) * (
            inverse_dynamics(mm, q, vv, aa) - tau)

    r_f = jax.vmap(fres)(qpos_seq[1:-1], 0.5 * (v[1:] + v[:-1]), a,
                         ctrl_seq[1:-1])                  # (T-2, nv)
    return jnp.concatenate([r_y.reshape(-1), r_f.reshape(-1)])


def direct_optimize(m: Model, cfg: DirectConfig, sensor: SensorModel,
                    qpos_init: jax.Array, y_seq: jax.Array,
                    ctrl_seq: jax.Array, dt: float) -> DirectResult:
    """Gauss-Newton over tangent corrections to the whole window
    (Direct::Optimize). qpos_init: (T, nq) initial guess (e.g. the
    measured configurations), y_seq: (T, ny), ctrl_seq: (T, nu)."""
    T = qpos_init.shape[0]
    nv = m.nv
    dtype = qpos_init.dtype
    nvar = T * nv + (1 if cfg.estimate_mass else 0)

    def apply(qpos_seq, dx):
        dq = dx[:T * nv].reshape(T, nv)
        qp = jax.vmap(lambda q, d: state_add(m, q, d))(qpos_seq, dq)
        ms = (1.0 + dx[-1]) if cfg.estimate_mass else jnp.asarray(
            1.0, dtype)
        return qp, ms

    def res_of(qpos_seq, mass_scale, dx):
        qp, ms_delta = apply(qpos_seq, dx)
        ms = mass_scale * ms_delta if cfg.estimate_mass else mass_scale
        return direct_residuals(m, cfg, sensor, qp, y_seq, ctrl_seq, dt,
                                ms)

    def gn_iter(carry, _):
        qpos_seq, mass_scale, _ = carry
        z = jnp.zeros(nvar, dtype=dtype)
        r0 = res_of(qpos_seq, mass_scale, z)
        with linalg.native_scope():
            J = jax.jacfwd(lambda dx: res_of(qpos_seq, mass_scale, dx))(z)
            H = J.T @ J + cfg.reg * jnp.eye(nvar, dtype=dtype)
            dx = -linalg.solve_psd(H, J.T @ r0)
        dx = jnp.nan_to_num(dx, nan=0.0, posinf=0.0, neginf=0.0)
        qp_new, ms_delta = apply(qpos_seq, dx)
        ms_new = (mass_scale * ms_delta if cfg.estimate_mass
                  else mass_scale)
        r1 = res_of(qp_new, ms_new, z)
        c0 = jnp.sum(r0 ** 2)
        c1 = jnp.sum(r1 ** 2)
        # accept only if improved AND finite (simple trust guard)
        better = jnp.logical_and(jnp.isfinite(c1), c1 < c0)
        qpos_seq = jnp.where(better, qp_new, qpos_seq)
        ms = jnp.where(better, ms_new, mass_scale)
        return (qpos_seq, ms, jnp.where(better, c1, c0)), c0

    ms0 = jnp.asarray(1.0, dtype)
    (qp, ms, cost), costs0 = jax.lax.scan(
        gn_iter, (qpos_init, ms0, jnp.asarray(0.0, dtype)), None,
        length=cfg.gn_iters)
    v = _fd_velocities(m, qp, dt)
    return DirectResult(qpos=qp, qvel=v, cost=cost,
                        cost_initial=costs0[0], mass_scale=ms)
