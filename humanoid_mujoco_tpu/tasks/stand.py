"""Humanoid Cap Stand task — the repo's own MPC task.

Residual terms re-derived from the reference
(mjpc/tasks/humanoid_cap/stand/stand.cc:40-99), weights/norms from the
task XML user-sensors (tasks/humanoid_cap/stand/task.xml:23-27):

  0 Height  (1)  SmoothAbs p=0.1, w=100 : torso z - mean(feet z) - goal
  1 Balance (1)  SmoothAbs p=0.1, w=50  : |capture point - feet centroid|_xy
  2 CoM Vel (2)  Quadratic,      w=10   : robot COM xy velocity
  3 JointVel(12) Quadratic,      w=0.01 : qvel[6:]
  4 Control (12) Cosh p=0.3,     w=0.025: ctrl

Sensor semantics (task.xml:29-40): "torso_position" = torso body frame
origin; "torso_subtreecom" = torso subtree COM (torso is a LEAF body in
the reference model, so this is torso's own COM); "torso_subtreelinvel"
is rooted at humanoid_world_link = whole-robot COM velocity; feet are
the *_bottom_foot sites. Capture point = com + kFallTime * com_vel with
kFallTime = 0.2 s (stand.cc:59).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.norms import NormType
from ..physics.humanoid import JOINT_NAMES
from ..physics.model import Model, State
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task

K_FALL_TIME = 0.2          # stand.cc:59
DEFAULT_HEIGHT_GOAL = 0.425  # task.xml:16 residual_Height Goal


def stand_residual(m: Model, task: Task, state: State, info: StepInfo,
                   ctrl: jax.Array) -> jax.Array:
    s = m.struct
    torso = s.body_id("torso")
    f1 = info.site_xpos[s.site_id("right_bottom_foot")]
    f2 = info.site_xpos[s.site_id("left_bottom_foot")]

    # Height: torso frame z minus mean feet z, minus the goal parameter
    height_err = (info.xpos[torso, 2] - 0.5 * (f1[2] + f2[2])
                  - task.params[0])

    # Balance: capture point (torso COM + kFallTime * robot COM vel) vs
    # feet centroid, xy distance
    com_pos = info.xipos[torso]          # torso subtree COM (leaf body)
    com_vel = info.com_vel               # whole-robot COM velocity
    capture = com_pos[:2] + K_FALL_TIME * com_vel[:2]
    feet_xy = 0.5 * (f1[:2] + f2[:2])
    from ..physics.math import safe_norm
    balance = safe_norm(feet_xy - capture)

    return jnp.concatenate([
        jnp.stack([height_err, balance]),
        com_vel[:2],
        state.qvel[6:18],
        ctrl,
    ])


def stand_task(height_goal: float = DEFAULT_HEIGHT_GOAL, risk: float = 0.0,
               dtype=jnp.float32) -> Task:
    terms = (
        TermSpec("Height", 1, NormType.SMOOTH_ABS, 1),
        TermSpec("Balance", 1, NormType.SMOOTH_ABS, 1),
        TermSpec("CoM Vel.", 2, NormType.QUADRATIC),
        TermSpec("Joint Vel.", len(JOINT_NAMES), NormType.QUADRATIC),
        TermSpec("Control", len(JOINT_NAMES), NormType.COSH, 1),
    )
    weights = (100.0, 50.0, 10.0, 0.01, 0.025)
    norm_params = ((0.1, 0.0), (0.1, 0.0), (0.0, 0.0), (0.0, 0.0),
                   (0.3, 0.0))
    return make_task("Humanoid Cap Stand", terms, stand_residual, weights,
                     norm_params=norm_params, params=(height_goal,),
                     param_names=("Height Goal",), risk=risk, dtype=dtype)
