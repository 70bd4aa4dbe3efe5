"""Particle task — the reference's canonical small task + test fixture
(mjpc/tasks/particle/particle.cc, test/testdata/particle*.xml).

A planar point mass with two slide joints chases a goal. Two variants,
matching the reference's registry pair:

  * "Particle"       — the goal follows a Lissajous curve through the
    task TRANSITION each step (Particle::TransitionLocked,
    particle.cc:58-66: goal = [0.25 sin(t), 0.25 cos(t/pi)])
  * "ParticleFixed"  — static goal from task parameters

This exercises the multi-mode/transition machinery (Task::Transition,
mjpc/task.h:85) that the humanoid stand task never uses.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.norms import NormType
from ..physics.model import (ActuatorType, JointType, Model, ModelBuilder,
                             State)
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task


def particle_model(dt: float = 0.01, dtype=jnp.float32) -> Model:
    """Planar point mass: 2 slide joints (x, y), 2 motors (the particle
    task model, mjpc/tasks/particle/particle.xml)."""
    b = ModelBuilder(dt=dt)
    b.has_floor = False
    body = b.add_body("particle", -1, mass=0.1,
                      inertia=(1e-4, 1e-4, 1e-4))
    jx = b.add_joint("slide_x", body, JointType.SLIDE, axis=(1, 0, 0),
                     damping=1.0)
    jy = b.add_joint("slide_y", body, JointType.SLIDE, axis=(0, 1, 0),
                     damping=1.0)
    b.add_actuator(jx, ActuatorType.MOTOR, gear=1.0, ctrlrange=(-1, 1),
                   forcerange=(-1, 1))
    b.add_actuator(jy, ActuatorType.MOTOR, gear=1.0, ctrlrange=(-1, 1),
                   forcerange=(-1, 1))
    return b.finalize(dtype=dtype)


def _particle_residual(m: Model, task: Task, state: State, info: StepInfo,
                       ctrl: jax.Array) -> jax.Array:
    """[position - goal (2); velocity (2); ctrl (2)]
    (particle.cc ResidualImpl). The goal lives in the task's "goal"
    mocap body, like the reference (particle.cc reads
    data->mocap_pos)."""
    goal = task.mocap_pos[0, :2]
    return jnp.concatenate([state.qpos[:2] - goal, state.qvel[:2], ctrl])


def _lissajous_transition(task: Task, m: Model, state: State,
                          info: StepInfo) -> Task:
    """Goal mocap body rides the Lissajous curve (particle.cc:58-66
    writes data->mocap_pos)."""
    t = state.time
    goal = jnp.stack([0.25 * jnp.sin(t), 0.25 * jnp.cos(t / jnp.pi),
                      jnp.zeros_like(t)]).astype(task.mocap_pos.dtype)
    return dataclasses.replace(task,
                               mocap_pos=task.mocap_pos.at[0].set(goal))


_TERMS = (
    TermSpec("Position", 2, NormType.QUADRATIC),
    TermSpec("Velocity", 2, NormType.QUADRATIC),
    TermSpec("Control", 2, NormType.QUADRATIC),
)
_WEIGHTS = (10.0, 0.1, 0.1)


def particle_task(dtype=jnp.float32) -> Task:
    """Moving-goal variant (registered as "Particle")."""
    return make_task("Particle", _TERMS, _particle_residual, _WEIGHTS,
                     mocap={"goal": (0.0, 0.0, 0.0)},
                     transition_fn=_lissajous_transition, dtype=dtype)


def particle_fixed_task(goal=(0.25, 0.0), dtype=jnp.float32) -> Task:
    """Static-goal variant (registered as "ParticleFixed"); move the
    goal with task.set_mocap("goal", pos) / Agent.set_mocap."""
    return make_task("ParticleFixed", _TERMS, _particle_residual,
                     _WEIGHTS, mocap={"goal": (*goal, 0.0)},
                     dtype=dtype)
