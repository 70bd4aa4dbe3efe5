"""RL reward functions — jittable rebuild of the reference's
simulation/reward_functions.py (standupReward at :247-374 and
controlInputReward at :116-244).

All terms are exp-kernel bonuses scaled_exp(x) = exp(-x / 0.5)
(reward_functions.py:17-19); weights are per-function constants kept
exactly as the reference sets them. Inputs mirror the reference's
signature; everything is branch-free (terminal/truncated returned as
bools, the -100 terminal override applied with jnp.where).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..physics import math as pm
from ..physics.humanoid import ACTUATED_JOINT_ORDER, STAND_POS

_EXP_SCALE = 0.5
Z_INITIAL_POS = STAND_POS[2]          # -0.375
CONTROL_FREQUENCY = 500.0             # simulation_parameters.py:51

# symmetry pairs (reward_functions.py:197-210)
_EQUAL = (("left_elbow", "right_elbow"),)
_OPPOSITE = (("left_hip_roll", "right_hip_roll"),
             ("left_hip_pitch", "right_hip_pitch"),
             ("left_knee", "right_knee"),
             ("left_shoulder_pitch", "right_shoulder_pitch"),
             ("left_shoulder_roll", "right_shoulder_roll"))
# ctrl vectors are in ACTUATOR order; the reference's JOINT_NAMES
# (simulation_parameters.py:84) matches its actuator order, so symmetry
# pairs index ctrl by that order.
_JIDX = {n: i for i, n in enumerate(ACTUATED_JOINT_ORDER)}


def _sexp(x):
    return jnp.exp(-x / _EXP_SCALE)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RewardResult:
    reward: jax.Array
    terminal: jax.Array
    truncated: jax.Array


def _symmetry(ctrl):
    r = 0.0
    for a, b in _EQUAL:
        r = r + _sexp((ctrl[_JIDX[a]] - ctrl[_JIDX[b]]) ** 2)
    for a, b in _OPPOSITE:
        r = r + _sexp((ctrl[_JIDX[a]] + ctrl[_JIDX[b]]) ** 2)
    return r / (len(_EQUAL) + len(_OPPOSITE))


def _common_terms(w_hvel, w_upright, w_vvel, w_height, min_z, target_z,
                  velocity, target_velocity, torso_quat, z_pos,
                  joint_torques, previous_ctrl, latest_ctrl):
    """The term stack shared by both reward functions (weights differ)."""
    r = w_hvel * _sexp(jnp.sum((velocity[:2] - target_velocity) ** 2))

    local_gravity = pm.quat_rotate_inv(
        pm.quat_normalize(torso_quat),
        jnp.asarray([0.0, 0.0, -1.0], dtype=torso_quat.dtype))
    target_down = jnp.asarray([0.0, 0.0, -1.0], dtype=torso_quat.dtype)
    r = r + w_upright * _sexp(jnp.sum((local_gravity - target_down) ** 2))

    r = r + w_vvel * _sexp(velocity[2] ** 2)

    r = r + jnp.interp(z_pos, jnp.asarray([min_z, target_z]),
                       jnp.asarray([0.0, w_height]))

    # joint torque above 1 Nm penalty-shaped bonus (per-joint mean)
    over = jnp.clip(jnp.abs(joint_torques) - 1.0, 0.0, jnp.inf)
    r = r + 2.5 * jnp.mean(_sexp(over ** 2))

    # control change + regularization + symmetry
    dctrl = (latest_ctrl - previous_ctrl) * CONTROL_FREQUENCY
    r = r + 2.0 * jnp.mean(_sexp(dctrl ** 2))
    r = r + 0.5 * jnp.mean(_sexp(latest_ctrl ** 2))
    r = r + 1.0 * _symmetry(latest_ctrl)
    return r, local_gravity


def standup_reward(velocity, target_velocity, torso_quat, target_yaw,
                   z_pos, joint_torques, previous_ctrl, latest_ctrl,
                   is_self_colliding, time, max_simulation_time
                   ) -> RewardResult:
    """standupReward (reward_functions.py:247-374): get up from lying.

    Terminal only on timeout; truncated (success) when torso is back at
    stand height AND upright.
    """
    r, local_gravity = _common_terms(
        5.0, 10.0, 0.0, 15.0, -0.6, Z_INITIAL_POS,
        velocity, target_velocity, torso_quat, z_pos, joint_torques,
        previous_ctrl, latest_ctrl)
    r = r + jnp.where(is_self_colliding, -20.0, 0.0)

    terminal = time >= max_simulation_time
    r = jnp.where(terminal, -100.0, r)
    upright = jnp.max(jnp.abs(local_gravity[:2])) < 0.7
    truncated = jnp.logical_and(z_pos >= Z_INITIAL_POS, upright)
    return RewardResult(reward=r, terminal=terminal, truncated=truncated)


def control_input_reward(velocity, target_velocity, torso_quat, target_yaw,
                         z_pos, joint_torques, previous_ctrl, latest_ctrl,
                         is_self_colliding, time, max_simulation_time
                         ) -> RewardResult:
    """controlInputReward (reward_functions.py:116-244): walk/balance at a
    commanded velocity. Terminal on fall (not upright or below -0.5 m)."""
    r, local_gravity = _common_terms(
        15.0, 10.0, 5.0, 5.0, Z_INITIAL_POS - 0.75, Z_INITIAL_POS,
        velocity, target_velocity, torso_quat, z_pos, joint_torques,
        previous_ctrl, latest_ctrl)
    r = r + jnp.where(is_self_colliding, -20.0, 0.0)

    grounded = z_pos < -0.5
    upright = jnp.max(jnp.abs(local_gravity[:2])) < 0.7
    terminal = jnp.logical_or(~upright, grounded)
    r = jnp.where(terminal, -100.0, r)
    truncated = time >= jnp.where(max_simulation_time > 0,
                                  max_simulation_time, jnp.inf)
    return RewardResult(reward=r, terminal=terminal, truncated=truncated)
