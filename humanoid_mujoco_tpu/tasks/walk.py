"""Humanoid Walk task for the cap robot — the upstream humanoid Walk
(mjpc/tasks/humanoid/walk/walk.cc:40-170) re-derived for the 12-DOF
mini humanoid, with the reference's two-mode structure (Stand / Walk)
expressed through the jittable `Task.mode` leaf:

  mode 0 "Stand": velocity target is zero — hold position
  mode 1 "Walk":  track the commanded horizontal speed along the torso's
                  heading (walk.cc velocity residual: com_vel vs
                  speed * forward)

Residual terms (walk.cc structure, cap-robot scales):
  Height:   torso z above feet mean minus the height goal
  Balance:  capture point vs feet midpoint (stand.cc:50-70 style)
  Upright:  torso local-up xy components (walk.cc upright)
  Velocity: com xy velocity minus the mode-gated target
  JointVel: qvel[6:]
  Control:  ctrl
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.norms import NormType
from ..physics.humanoid import JOINT_NAMES
from ..physics.math import quat_rotate, safe_norm
from ..physics.model import Model, State
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task
from .stand import DEFAULT_HEIGHT_GOAL, K_FALL_TIME


def walk_residual(m: Model, task: Task, state: State, info: StepInfo,
                  ctrl: jax.Array) -> jax.Array:
    s = m.struct
    dtype = state.qpos.dtype
    torso = s.body_id("torso")
    f1 = info.site_xpos[s.site_id("right_bottom_foot")]
    f2 = info.site_xpos[s.site_id("left_bottom_foot")]

    height_err = (info.xpos[torso, 2] - 0.5 * (f1[2] + f2[2])
                  - task.params[0])

    com_pos = info.xipos[torso]
    com_vel = info.com_vel
    capture = com_pos[:2] + K_FALL_TIME * com_vel[:2]
    feet_xy = 0.5 * (f1[:2] + f2[:2])
    balance = safe_norm(feet_xy - capture)

    # upright: torso local z-axis should point up (walk.cc upright term
    # penalizes the xy components of torso_up)
    up_world = quat_rotate(info.xquat[torso],
                           jnp.asarray([0.0, 0.0, 1.0], dtype=dtype))
    upright = up_world[:2]

    # velocity: speed target along the torso heading, gated by mode
    # (mode 0 Stand -> 0, mode 1 Walk -> params[1])
    fwd_world = quat_rotate(info.xquat[torso],
                            jnp.asarray([1.0, 0.0, 0.0], dtype=dtype))
    heading = fwd_world[:2] / safe_norm(fwd_world[:2])
    speed = jnp.where(task.mode == 1, task.params[1], 0.0).astype(dtype)
    vel_err = com_vel[:2] - speed * heading

    return jnp.concatenate([
        jnp.stack([height_err, balance]),
        upright,
        vel_err,
        state.qvel[6:18],
        ctrl,
    ])


def walk_task(height_goal: float = DEFAULT_HEIGHT_GOAL,
              speed: float = 0.3, dtype=jnp.float32) -> Task:
    terms = (
        TermSpec("Height", 1, NormType.SMOOTH_ABS, 1),
        TermSpec("Balance", 1, NormType.SMOOTH_ABS, 1),
        TermSpec("Upright", 2, NormType.QUADRATIC),
        TermSpec("Velocity", 2, NormType.QUADRATIC),
        TermSpec("Joint Vel.", len(JOINT_NAMES), NormType.QUADRATIC),
        TermSpec("Control", len(JOINT_NAMES), NormType.COSH, 1),
    )
    weights = (100.0, 50.0, 10.0, 10.0, 0.01, 0.025)
    norm_params = ((0.1, 0.0), (0.1, 0.0), (0.0, 0.0), (0.0, 0.0),
                   (0.0, 0.0), (0.3, 0.0))
    return make_task("Humanoid Cap Walk", terms, walk_residual, weights,
                     norm_params=norm_params,
                     params=(height_goal, speed),
                     param_names=("Height Goal", "Speed"),
                     mode_names=("Stand", "Walk"), dtype=dtype)
