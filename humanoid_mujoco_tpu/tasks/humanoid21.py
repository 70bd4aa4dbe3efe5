"""Upstream humanoid Stand + Walk tasks (21-DOF dm_control humanoid).

Re-derivations of the reference's humanoid task family residuals:
  Stand: mjpc/tasks/humanoid/stand/stand.cc:40-105 (head-feet height,
         capture-point balance, CoM velocity, joint velocity, control)
  Walk:  mjpc/tasks/humanoid/walk/walk.cc:44-166 (torso height,
         pelvis-feet, projected-capture-point balance, upright set,
         posture, gait velocity terms, control)
with weights / norms / parameters from the task.xml user sensors
(humanoid/stand/task.xml:18-22, humanoid/walk/task.xml:29-36).

Note on the Walk "Velocity"/"Walk" slices: the reference's residual fn
emits [walk(1), move_feet(2)] while its XML declares the terms as
[Velocity(2), Walk(1)], so upstream the norm boundaries straddle the
semantic boundary. Here the terms are mapped semantically — Walk(1) is
the walk-speed residual, Velocity(2) the move-feet residual — with the
XML's weights/norms attached to their intended slices.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import NormType
from ..physics.humanoid_upstream import build_humanoid21
from ..physics.math import quat_rotate, safe_norm
from ..physics.model import Model, State
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task

K_FALL_TIME_STAND = 0.2   # stand.cc:62
K_FALL_TIME_WALK = 0.3    # walk.cc:66


def _subtree_mask(struct, root_name: str) -> np.ndarray:
    """Static 0/1 mask of bodies in the subtree rooted at `root_name`."""
    root = struct.body_id(root_name)
    mask = np.zeros(struct.nbody)
    for b in range(struct.nbody):
        cur = b
        while cur >= 0:
            if cur == root:
                mask[b] = 1.0
                break
            cur = struct.body_parent[cur]
    return mask


def _standing(torso_z, dtype):
    """walk.cc:93-95 standing gate."""
    return (torso_z / jnp.sqrt(torso_z * torso_z + 0.45 * 0.45)
            - jnp.asarray(0.4, dtype=dtype))


# ---------------------------------------------------------------------------
# Stand
# ---------------------------------------------------------------------------

def h21_stand_residual(m: Model, task: Task, state: State, info: StepInfo,
                       ctrl: jax.Array) -> jax.Array:
    s = m.struct
    head = s.body_id("head")
    sp = jnp.stack([info.site_xpos[s.site_id(n)]
                    for n in ("sp0", "sp1", "sp2", "sp3")])   # (4, 3)

    # head-above-feet height vs goal (stand.cc:44-55)
    height = (info.xpos[head, 2] - jnp.mean(sp[:, 2]) - task.params[0])

    # capture point vs feet centroid (stand.cc:57-75)
    capture = info.com[:2] + K_FALL_TIME_STAND * info.com_vel[:2]
    balance = safe_norm(jnp.mean(sp[:, :2], axis=0) - capture)

    com_vel = info.com_vel[:2]                     # stand.cc:77-80
    joint_vel = state.qvel[6:]
    return jnp.concatenate([
        jnp.stack([height, balance]), com_vel, joint_vel, ctrl])


_STAND_TERMS = (
    TermSpec("Height", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Balance", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("CoM Vel.", 2, NormType.QUADRATIC),
    TermSpec("Joint Vel.", 21, NormType.QUADRATIC),
    TermSpec("Control", 21, NormType.COSH, num_params=1),
)


def h21_stand_task(height_goal: float = 1.4) -> Task:
    """humanoid/stand/task.xml:18-22 weights + norms; Height Goal 1.4."""
    return make_task(
        "Humanoid Stand", _STAND_TERMS, h21_stand_residual,
        weights=(100.0, 50.0, 10.0, 0.01, 0.025),
        norm_params=((0.1, 0), (0.1, 0), (0, 0), (0, 0), (0.3, 0)),
        params=(height_goal,), param_names=("Height Goal",))


# ---------------------------------------------------------------------------
# Walk
# ---------------------------------------------------------------------------

def h21_walk_residual(m: Model, task: Task, state: State, info: StepInfo,
                      ctrl: jax.Array) -> jax.Array:
    s = m.struct
    dtype = state.qpos.dtype
    torso = s.body_id("torso")
    pelvis = s.body_id("pelvis")
    fr = s.body_id("foot_right")
    fl = s.body_id("foot_left")
    z_ref = jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)
    x_ref = jnp.asarray([1.0, 0.0, 0.0], dtype=dtype)

    torso_z = info.xpos[torso, 2]
    standing = _standing(torso_z, dtype)

    # (1) torso height vs goal (walk.cc:48-50)
    height = torso_z - task.params[0]

    # (2) pelvis-feet alignment (walk.cc:52-57)
    pelvis_feet = (0.5 * (info.xpos[fl, 2] + info.xpos[fr, 2])
                   - info.xpos[pelvis, 2] - 0.2)

    # (3) balance: capture point projected onto the feet segment
    # (walk.cc:59-97)
    capture = info.com[:2] + K_FALL_TIME_WALK * info.com_vel[:2]
    axis = info.xpos[fr, :2] - info.xpos[fl, :2]
    axis_len = safe_norm(axis)
    axis = axis / jnp.maximum(axis_len, 1e-9)
    length = 0.5 * axis_len - 0.05
    center = 0.5 * (info.xpos[fr, :2] + info.xpos[fl, :2])
    t = jnp.clip(jnp.dot(capture - center, axis), -length, length)
    pcp = center + t * axis
    balance = standing * (capture - pcp)            # (2,)

    # (4) upright set (walk.cc:99-119): torso, pelvis, both feet
    torso_up = quat_rotate(info.xquat[torso], z_ref)
    pelvis_up = quat_rotate(info.xquat[pelvis], z_ref)
    fr_up = quat_rotate(info.xquat[fr], z_ref)
    fl_up = quat_rotate(info.xquat[fl], z_ref)
    upright = jnp.concatenate([
        jnp.stack([torso_up[2] - 1.0, 0.3 * (pelvis_up[2] - 1.0)]),
        0.1 * standing * (fr_up - z_ref),
        0.1 * standing * (fl_up - z_ref)])          # (8,)

    # (5) posture (walk.cc:121-123)
    posture = state.qpos[7:]                        # (21,)

    # (6) heading-forward average (walk.cc:125-136)
    fwd = (quat_rotate(info.xquat[torso], x_ref)[:2]
           + quat_rotate(info.xquat[pelvis], x_ref)[:2]
           + quat_rotate(info.xquat[fr], x_ref)[:2]
           + quat_rotate(info.xquat[fl], x_ref)[:2])
    fwd = fwd / jnp.maximum(safe_norm(fwd), 1e-9)

    # com velocity: mean of lower-body subtree com-vel and torso body
    # velocity (walk.cc:138-144; subtree computed exactly from the
    # static mass tree and per-body COM velocities)
    sub = jnp.asarray(_subtree_mask(s, "waist_lower"), dtype=dtype)
    msub = sub * m.body_mass
    sub_vel = (msub[:, None] * info.body_com_vel).sum(0) \
        / jnp.maximum(msub.sum(), 1e-9)
    com_vel2 = 0.5 * (sub_vel[:2] + info.body_com_vel[torso, :2])

    # walk forward at the commanded speed (walk.cc:146-148)
    walk = standing * (jnp.dot(com_vel2, fwd) - task.params[1])

    # move feet relative to the com (walk.cc:150-161)
    move_feet = standing * (com_vel2
                            - 0.5 * info.body_com_vel[fr, :2]
                            - 0.5 * info.body_com_vel[fl, :2])  # (2,)

    return jnp.concatenate([
        jnp.stack([height, pelvis_feet]), balance, upright, posture,
        jnp.stack([walk]), move_feet, ctrl])


_WALK_TERMS = (
    TermSpec("Height", 1, NormType.SMOOTH_ABS2, num_params=2),
    TermSpec("Pelvis/Feet", 1, NormType.RECTIFY, num_params=1),
    TermSpec("Balance", 2, NormType.L22, num_params=2),
    TermSpec("Upright", 8, NormType.L2, num_params=1),
    TermSpec("Posture", 21, NormType.QUADRATIC),
    TermSpec("Walk", 1, NormType.SMOOTH_ABS2, num_params=2),
    TermSpec("Velocity", 2, NormType.SMOOTH_ABS2, num_params=2),
    TermSpec("Control", 21, NormType.COSH, num_params=1),
)


def h21_walk_task(height_goal: float = 1.35, speed: float = 0.5) -> Task:
    """humanoid/walk/task.xml:29-36 weights + norms; residual_Torso 1.35,
    residual_Speed 0.5."""
    return make_task(
        "Humanoid Walk", _WALK_TERMS, h21_walk_residual,
        weights=(5.0, 1.0, 5.0, 5.0, 0.025, 1.0, 0.625, 0.1),
        norm_params=((0.1, 4.0), (0.05, 0), (0.02, 4.0), (0.01, 0),
                     (0, 0), (0.5, 3.0), (0.2, 4.0), (0.3, 0)),
        params=(height_goal, speed),
        param_names=("Torso", "Speed"))


def humanoid21_model(**kwargs) -> Model:
    return build_humanoid21(**kwargs)
