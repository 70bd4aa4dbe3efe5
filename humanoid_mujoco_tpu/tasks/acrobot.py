"""Acrobot swing-up task — the reference's "Acrobot" registry entry
(mjpc/tasks/acrobot/acrobot.cc, tasks.cc:49).

Model: two 1 m / 1 kg links hanging from a fixed shoulder at z = 2;
only the elbow is actuated (acrobot.xml.patch / dm_control acrobot,
constraints disabled). Residual (acrobot.cc:36-50):

    Distance (2): goal site − tip site, (z, x) components
    Velocity (2): joint velocities
    Control  (1): elbow effort

with the task.xml:21-23 quadratic norms and weights 50 / 1 / 0.05. The
goal is the fixed "target" site at (0, 0, 4) — full upright extension —
held here as a mocap body so it is runtime-movable (the reference's
residual_Goal parameter moves the target along x, task.xml:17).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.norms import NormType
from ..physics.model import (ActuatorType, JointType, Model, ModelBuilder,
                             State)
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task


def acrobot_model(dt: float = 0.01, dtype=jnp.float32) -> Model:
    """Two slender links (1 kg, 1 m, joint damping 0.05) about y-axis
    hinges; motor gear 2 on the elbow only."""
    b = ModelBuilder(dt=dt)
    b.has_floor = False        # <flag constraint="disable"/>
    # links point +z at qpos=0 (tip at z=4 == goal); home hangs down
    rod = (8.4e-2, 8.4e-2, 1.0e-4)     # I_com = m L²/12, m=1, L=1
    upper = b.add_body("upper_arm", -1, pos=(0.0, 0.0, 2.0), mass=1.0,
                       ipos=(0.0, 0.0, 0.5), inertia=rod)
    b.add_joint("shoulder", upper, JointType.HINGE, axis=(0, 1, 0),
                damping=0.05)
    lower = b.add_body("lower_arm", upper, pos=(0.0, 0.0, 1.0), mass=1.0,
                       ipos=(0.0, 0.0, 0.5), inertia=rod)
    elbow = b.add_joint("elbow", lower, JointType.HINGE, axis=(0, 1, 0),
                        damping=0.05)
    b.add_site("tip", lower, pos=(0.0, 0.0, 1.0))
    b.add_actuator(elbow, ActuatorType.MOTOR, gear=2.0,
                   ctrlrange=(-1.0, 1.0), forcerange=(-2.0, 2.0))
    return b.finalize(dtype=dtype)


def acrobot_home_qpos(m: Model) -> jax.Array:
    """Hanging rest (shoulder rotated π, tip at z = 0)."""
    return jnp.zeros(m.nq, dtype=m.dt.dtype).at[0].set(jnp.pi)


def _acrobot_residual(m: Model, task: Task, state: State, info: StepInfo,
                      ctrl: jax.Array) -> jax.Array:
    """[goal−tip (z,x); qvel (2); u] (acrobot.cc:36-50)."""
    goal = task.mocap_pos[0]
    tip = info.site_xpos[m.struct.site_id("tip")]
    return jnp.concatenate([
        jnp.stack([goal[2] - tip[2], goal[0] - tip[0]]),
        state.qvel,
        ctrl,
    ])


_TERMS = (
    TermSpec("Distance", 2, NormType.QUADRATIC),
    TermSpec("Velocity", 2, NormType.QUADRATIC),
    TermSpec("Control", 1, NormType.QUADRATIC),
)
_WEIGHTS = (50.0, 1.0, 0.05)


def acrobot_task(dtype=jnp.float32) -> Task:
    return make_task("Acrobot", _TERMS, _acrobot_residual, _WEIGHTS,
                     mocap={"goal": (0.0, 0.0, 4.0)}, dtype=dtype)
