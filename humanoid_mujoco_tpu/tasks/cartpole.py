"""Cartpole swing-up task — the reference's "Cartpole" registry entry
(mjpc/tasks/cartpole/cartpole.cc, tasks.cc:55).

Model: cart on a limited slide rail + 1 m pole on a passive hinge, one
motor on the cart (cartpole.xml.patch / dm_control cart-pole, contact
disabled). Residual (cartpole.cc:36-49):

    Vertical:  cos(pole_angle) - 1          (pole upright)
    Centered:  cart_x - Goal                (cart at goal position)
    Velocity:  pole angular velocity
    Control:   motor effort

with the task.xml:31-34 norms/weights: SmoothAbs(p=0.01) w=10 on
Vertical, SmoothAbs(p=0.1) w=10 on Centered, Quadratic w=0.1 on
Velocity/Control, and the "Goal" task parameter (residual_Goal,
task.xml:18). Home keyframe = pole hanging down (task.xml:41-44).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.norms import NormType
from ..physics.model import (ActuatorType, JointType, Model, ModelBuilder,
                             State)
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task


def cartpole_model(dt: float = 0.01, dtype=jnp.float32) -> Model:
    """Cart (1 kg box on ±1.8 m slide) + pole (0.1 kg, 1 m, hinge about
    y), motor gear 10 on the slide — the dm_control cart-pole numbers
    the reference patches (cartpole.xml.patch)."""
    b = ModelBuilder(dt=dt)
    b.has_floor = False        # <flag contact="disable"/>
    cart = b.add_body("cart", -1, pos=(0.0, 0.0, 1.0), mass=1.0,
                      # box half-extents (0.2, 0.15, 0.1): I = m/3 (b²+c²)
                      inertia=(0.0108, 0.0167, 0.0208))
    slider = b.add_joint("slider", cart, JointType.SLIDE, axis=(1, 0, 0),
                         jrange=(-1.8, 1.8), limited=True, damping=1e-4)
    # pole: slender rod, COM at mid-length, I_com = m L²/12 (+ capsule r)
    pole = b.add_body("pole", cart, pos=(0.0, 0.0, 0.0), mass=0.1,
                      ipos=(0.0, 0.0, 0.5),
                      inertia=(8.4e-3, 8.4e-3, 1.0e-4))
    b.add_joint("hinge", pole, JointType.HINGE, axis=(0, 1, 0),
                damping=1e-4)
    b.add_site("tip", pole, pos=(0.0, 0.0, 1.0))
    b.add_actuator(slider, ActuatorType.MOTOR, gear=10.0,
                   ctrlrange=(-1.0, 1.0), forcerange=(-10.0, 10.0))
    return b.finalize(dtype=dtype)


def cartpole_home_qpos(m: Model) -> jax.Array:
    """Start from the bottom position (task.xml keyframe qpos="3.142 0")."""
    return jnp.zeros(m.nq, dtype=m.dt.dtype).at[1].set(3.142)


def _cartpole_residual(m: Model, task: Task, state: State, info: StepInfo,
                       ctrl: jax.Array) -> jax.Array:
    """[cos(θ)-1; x-goal; θ̇; u] (cartpole.cc:36-49)."""
    return jnp.concatenate([
        jnp.cos(state.qpos[1:2]) - 1.0,
        state.qpos[0:1] - task.params[0],
        state.qvel[1:2],
        ctrl,
    ])


_TERMS = (
    TermSpec("Vertical", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Centered", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Velocity", 1, NormType.QUADRATIC),
    TermSpec("Control", 1, NormType.QUADRATIC),
)
_WEIGHTS = (10.0, 10.0, 0.1, 0.1)
# (p, q) per term — task.xml:31-34 user="6 10.0 0 100.0 <p>"
_NORM_PARAMS = ((0.01, 0.0), (0.1, 0.0), (0.0, 0.0), (0.0, 0.0))


def cartpole_task(goal: float = 0.0, dtype=jnp.float32) -> Task:
    return make_task("Cartpole", _TERMS, _cartpole_residual, _WEIGHTS,
                     norm_params=_NORM_PARAMS, params=(goal,),
                     param_names=("Goal",), dtype=dtype)
