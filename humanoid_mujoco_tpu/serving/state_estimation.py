"""Partial-state re-estimation for robot serving.

The real robot reports only (joint_pos, joint_vel, ang_vel, quat) —
no root height. The reference recovers height by scanning 200 candidate
offsets and picking the one minimizing the vertical inverse-dynamics
force |qfrc_inverse[2]| (find_ideal_distance_to_ground,
controllers/mpc_utils.py:36-56, via mj_inverse per candidate).

TPU-native version: the scan is one vmap over candidate heights; the
"inverse dynamics force" is the net vertical force needed to hold the
pose statically = gravity load minus available contact support — we
directly pick the height where the contact solve best balances gravity
(equivalently, minimal |residual vertical acceleration| at qacc=0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..physics.model import Model, State, make_state
from ..physics.step import forward


@functools.partial(jax.jit, static_argnums=(3, 4))
def find_ideal_root_height(m: Model, joint_pos: jax.Array,
                           quat: jax.Array, n_candidates: int = 200,
                           z_range=(-0.7, -0.2)) -> jax.Array:
    """Best root z for the given joint pose: the height at which the
    static contact forces support the robot with minimal residual
    vertical acceleration (the mpc_utils.py:36-56 scan, vectorized)."""
    dtype = m.body_pos.dtype
    zs = jnp.linspace(z_range[0], z_range[1], n_candidates).astype(dtype)

    def score(z):
        q = make_state(m).qpos
        q = q.at[0:3].set(jnp.asarray([0.0, 0.0, z], dtype=dtype))
        q = q.at[3:7].set(jnp.asarray(quat, dtype=dtype))
        q = q.at[7:].set(jnp.asarray(joint_pos, dtype=dtype))
        s = State(qpos=q, qvel=jnp.zeros(m.nv, dtype=dtype),
                  time=jnp.asarray(0.0, dtype=dtype))
        qacc, _, _, info = forward(m, s, jnp.zeros(m.nu, dtype=dtype),
                                   solver_iters=6)
        # penalize: vertical residual acceleration + deep penetration
        pen = jnp.sum(jnp.clip(-info.contact_dist, 0.0, jnp.inf))
        return jnp.abs(qacc[2]) + 100.0 * pen

    scores = jax.vmap(score)(zs)
    return zs[jnp.argmin(scores)]


def set_robot_state(m: Model, joint_pos, joint_vel, ang_vel, quat,
                    height=None) -> State:
    """Build a full State from the robot's partial observation
    (set_mujoco_state, controllers/mpc_utils.py:58-72)."""
    dtype = m.body_pos.dtype
    joint_pos = jnp.asarray(joint_pos, dtype=dtype)
    quat = jnp.asarray(quat, dtype=dtype)
    if height is None:
        height = find_ideal_root_height(m, joint_pos, quat)
    q = make_state(m).qpos
    q = q.at[0:3].set(jnp.asarray([0.0, 0.0, height], dtype=dtype))
    q = q.at[3:7].set(quat / jnp.linalg.norm(quat))
    q = q.at[7:].set(joint_pos)
    v = jnp.zeros(m.nv, dtype=dtype)
    v = v.at[3:6].set(jnp.asarray(ang_vel, dtype=dtype))
    v = v.at[6:].set(jnp.asarray(joint_vel, dtype=dtype))
    return State(qpos=q, qvel=v, time=jnp.asarray(0.0, dtype=dtype))
