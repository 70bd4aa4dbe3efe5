"""Direct (batch) trajectory optimizer — the mjpc/direct/ rebuild.

The reference's "Direct" optimizer (direct/direct.cc, docs/DIRECT.md)
estimates a configuration trajectory q_{0:T} from noisy sensor data by
minimizing

    sum_t |y_t - h(q_t, v_t)|^2_Rinv  +  w_f * |f(q, v, a)_t|^2

with velocities/accelerations by finite difference on the configuration
manifold, Gauss-Newton on a banded Hessian (nband = 3*nv,
direct.cc:136, band Cholesky at 504-506). The reference's force residual
uses the FULL model including constraint forces (direct.cc:136,504-506);
here `contact_forces=True` (default) runs the contact Newton solve at
each knot with IFT derivatives, so windows that touch the ground fit
against the correct force model:

    f_t = M(q_t) a_t - qfrc_total(q_t, v_t, u_t)
        = M a + bias - passive - tau - qfrc_constraint

TPU-native: residual Jacobians come from ONE jax.jacfwd over the whole
stacked tangent perturbation (the per-knot FD Jacobians + band assembly
collapse into a single compiled kernel), solved densely with XLA's
native Cholesky — at W*nv of a few hundred the compiler's fused dense
solve beats hand-banded code on the MXU.

Model-parameter estimation (direct/model_parameters.cc analog) supports
a named set of global parameters jointly estimated with the trajectory:
mass_scale / damping_scale / friction_scale.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..estimators.sensors import SensorModel, measure
from ..ops import linalg
from ..physics.engine import inverse_dynamics
from ..physics.model import Model, State
from ..physics.tangent import qpos_diff, state_add

# named global parameters: theta is a small vector of fractional
# corrections; transform(m, theta_i) applies one of them
PARAM_TRANSFORMS = {
    "mass_scale": lambda m, v: m.replace(
        body_mass=m.body_mass * (1.0 + v)),
    "damping_scale": lambda m, v: m.replace(
        dof_damping=m.dof_damping * (1.0 + v)),
    "friction_scale": lambda m, v: m.replace(
        floor_friction=m.floor_friction * (1.0 + v)),
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DirectConfig:
    gn_iters: int = dataclasses.field(default=6, metadata=dict(static=True))
    estimate_mass: bool = dataclasses.field(default=False,
                                            metadata=dict(static=True))
    # additional named parameters estimated jointly with the trajectory
    # (direct/model_parameters.cc); estimate_mass is kept as a shorthand
    # for ("mass_scale",)
    estimate_params: Tuple[str, ...] = dataclasses.field(
        default=(), metadata=dict(static=True))
    # include constraint forces from the contact Newton solve in the
    # force residual (the reference's full-model force residual)
    contact_forces: bool = dataclasses.field(default=True,
                                             metadata=dict(static=True))
    solver_iters: int = dataclasses.field(default=6,
                                          metadata=dict(static=True))
    # force residual weight: FD accelerations at small dt amplify config
    # noise by 1/dt^2, so the force term needs down-weighting relative to
    # the sensor term (the reference exposes the same trade-off as
    # per-term weights in direct/direct.cc)
    force_weight: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-4))
    reg: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(1e-4))


def _param_names(cfg: DirectConfig) -> Tuple[str, ...]:
    names = tuple(cfg.estimate_params)
    if cfg.estimate_mass and "mass_scale" not in names:
        names = ("mass_scale",) + names
    return names


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DirectResult:
    qpos: jax.Array      # (T, nq) optimized configurations
    qvel: jax.Array      # (T-1, nv) FD velocities
    cost: jax.Array      # () final cost
    cost_initial: jax.Array
    mass_scale: jax.Array  # () estimated mass multiplier (1 if disabled)
    params: jax.Array    # (nparam,) estimated fractional corrections


def _fd_velocities(m: Model, qpos_seq: jax.Array, dt) -> jax.Array:
    """v_t = (q_{t+1} ⊖ q_t) / dt on the configuration manifold."""
    def diff(q0, q1):
        return qpos_diff(m, q1, q0) / dt
    return jax.vmap(diff)(qpos_seq[:-1], qpos_seq[1:])


def _apply_params(m: Model, cfg: DirectConfig, theta: jax.Array) -> Model:
    for i, name in enumerate(_param_names(cfg)):
        m = PARAM_TRANSFORMS[name](m, theta[i])
    return m


def direct_residuals(m: Model, cfg: DirectConfig, sensor: SensorModel,
                     qpos_seq: jax.Array, y_seq: jax.Array,
                     ctrl_seq: jax.Array, dt, theta) -> jax.Array:
    """Stacked weighted residual vector for the whole window.

    The force residual is DISCRETE-CONSISTENT with the simulator's
    semi-implicit Euler + implicit damping (step.py):
        (M(q_t) + h D) (v_{t+1} - v_t) / h - qfrc_total(q_t, v_t, u_t)
    with v_{t+1} = (q_{t+1} ⊖ q_t)/h — exactly zero on noise-free sim
    data, unlike a continuous midpoint id() whose O(dt) mismatch is
    amplified by 1/dt^2 and buries the parameter signal.
    """
    mm = _apply_params(m, cfg, theta)
    v = _fd_velocities(mm, qpos_seq, dt)       # v[i] = vel AT knot i+1

    # sensor residuals at interior knots; the sim's velocity at knot t
    # is v[t-1] (the velocity that carried q_{t-1} -> q_t)
    def sres(q, vv, y):
        return (y - measure(mm, q, vv)) / sensor.noise

    r_y = jax.vmap(sres)(qpos_seq[1:-1], v[:-1],
                         y_seq[1:-1])                     # (T-2, ny)

    # force residuals at knots t = 1..T-2: v_old = v[t-1], v_new = v[t]
    from ..physics.engine import actuation, crb_mass_matrix, fwd_position, \
        fwd_velocity, passive_force, rnea_bias
    from ..physics.step import forward

    def fres(q, v_old, v_new, u):
        if cfg.contact_forces:
            # IFT keeps the contact solve differentiable for the outer
            # GN jacfwd
            _, qfrc_total, M, _ = forward(
                mm, State(q, v_old, jnp.zeros((), q.dtype)), u,
                solver_iters=cfg.solver_iters, ift=True)
        else:
            kin = fwd_position(mm, q)
            vel = fwd_velocity(mm, kin, v_old)
            M = crb_mass_matrix(mm, kin)
            qfrc_total = (actuation(mm, q, v_old, u)
                          + passive_force(mm, q, v_old)
                          - rnea_bias(mm, kin, vel, v_old))
        MhD = M + dt * jnp.diag(mm.dof_damping)
        return jnp.sqrt(cfg.force_weight) * (
            MhD @ (v_new - v_old) / dt - qfrc_total)

    r_f = jax.vmap(fres)(qpos_seq[1:-1], v[:-1], v[1:],
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
    pnames = _param_names(cfg)
    npar = len(pnames)
    nvar = T * nv + npar

    def apply(qpos_seq, dx):
        dq = dx[:T * nv].reshape(T, nv)
        qp = jax.vmap(lambda q, d: state_add(m, q, d))(qpos_seq, dq)
        dtheta = dx[T * nv:] if npar else jnp.zeros((0,), dtype)
        return qp, dtheta

    def res_of(qpos_seq, theta, dx):
        qp, dtheta = apply(qpos_seq, dx)
        return direct_residuals(m, cfg, sensor, qp, y_seq, ctrl_seq, dt,
                                theta + dtheta)

    def gn_iter(carry, _):
        qpos_seq, theta, _ = carry
        z = jnp.zeros(nvar, dtype=dtype)
        r0 = res_of(qpos_seq, theta, z)
        with linalg.native_scope():
            J = jax.jacfwd(lambda dx: res_of(qpos_seq, theta, dx))(z)
            H = J.T @ J + cfg.reg * jnp.eye(nvar, dtype=dtype)
            dx = -linalg.solve_psd(H, J.T @ r0)
        dx = jnp.nan_to_num(dx, nan=0.0, posinf=0.0, neginf=0.0)
        qp_new, dtheta = apply(qpos_seq, dx)
        th_new = theta + dtheta
        r1 = res_of(qp_new, th_new, z)
        c0 = jnp.sum(r0 ** 2)
        c1 = jnp.sum(r1 ** 2)
        # accept only if improved AND finite (simple trust guard)
        better = jnp.logical_and(jnp.isfinite(c1), c1 < c0)
        qpos_seq = jnp.where(better, qp_new, qpos_seq)
        theta = jnp.where(better, th_new, theta)
        return (qpos_seq, theta, jnp.where(better, c1, c0)), c0

    theta0 = jnp.zeros((npar,), dtype)
    (qp, theta, cost), costs0 = jax.lax.scan(
        gn_iter, (qpos_init, theta0, jnp.asarray(0.0, dtype)), None,
        length=cfg.gn_iters)
    v = _fd_velocities(m, qp, dt)
    if "mass_scale" in pnames:
        ms = 1.0 + theta[pnames.index("mass_scale")]
    else:
        ms = jnp.asarray(1.0, dtype)
    return DirectResult(qpos=qp, qvel=v, cost=cost,
                        cost_initial=costs0[0], mass_scale=ms,
                        params=theta)
