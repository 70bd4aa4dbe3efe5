"""Swimmer task — the reference registry's "Swimmer" entry
(mjpc/tasks/swimmer/swimmer.cc, tasks.cc:73).

Model: the dm_control 6-link planar swimmer as modified by the
reference (mjpc/tasks/swimmer/swimmer.xml.patch): a head body with
slide-x / slide-y / hinge-z root joints and five chained segments with
z-hinges (range +-90 deg, stiffness 1e-3, armature 1e-6), each link a
0.01 kg inertia box of full dims (0.002, 0.1, 0.02) m. Propulsion is
purely hydrodynamic: the model disables contact and sets medium
density 1000 — rebuilt here via the engine's inertia-box fluid drag
(physics/engine.fluid_force). The reference's first-order `filter`
actuator dynamics (dyntype filter, dynprm 0.6) are approximated by a
direct torque motor with the same 2e-3 gain: the sampling planner's
spline smoothing plays the same low-pass role on TPU.

Residual (swimmer.cc:33-44, 7 terms):
    Control  (5): ctrl                      [quadratic, weight 0.1]
    Distance (2): nose xy - target xy       [L2(0.04),  weight 10]

Transition (swimmer.cc:49-60): when the nose is within 0.04 m of the
target, the target mocap body jumps to a uniform random point in
[-0.8, 0.8]^2 — reproduced jittably by folding the sim time into a PRNG
key (the reference uses absl::BitGen on the host).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.norms import NormType
from ..physics.model import ActuatorType, JointType, Model, ModelBuilder
from ..physics.model import State
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task

_N_SEGMENTS = 5
_LINK_MASS = 0.01
# inertia box per link: full dims (0.002, 0.1, 0.02) m (geom class
# "inertial": box half-size .001 .05 .01, mass .01)
_DIMS = (0.002, 0.1, 0.02)
_GOAL_TOL = 0.04        # swimmer.cc:55


def _box_inertia(mass, dims):
    dx, dy, dz = dims
    return (mass / 12.0 * (dy * dy + dz * dz),
            mass / 12.0 * (dx * dx + dz * dz),
            mass / 12.0 * (dx * dx + dy * dy))


def swimmer_model(dt: float = 0.01, dtype=jnp.float32) -> Model:
    """6-link planar swimmer in a density-1000 medium, contact disabled
    (swimmer.xml.patch option block)."""
    b = ModelBuilder(dt=dt)
    b.has_floor = False
    b.fluid_density = 1000.0
    b.limit_solref = (0.05, 0.3)      # solreflimit ".05 .3"
    b.limit_solimp = (0.0, 0.8, 0.1)  # solimplimit "0 .8 .1"

    inertia = _box_inertia(_LINK_MASS, _DIMS)
    head = b.add_body("head", -1, pos=(0.0, 0.0, 0.05), mass=_LINK_MASS,
                      inertia=inertia)
    b.add_joint("rootx", head, JointType.SLIDE, axis=(1, 0, 0))
    b.add_joint("rooty", head, JointType.SLIDE, axis=(0, 1, 0))
    b.add_joint("rootz", head, JointType.HINGE, axis=(0, 0, 1),
                pos=(0.0, -0.05, 0.0))
    b.add_site("nose", head, pos=(0.0, -0.06, 0.0))
    b.add_site("head", head, pos=(0.0, 0.0, 0.0))

    parent = head
    lim = jnp.pi / 2.0
    for i in range(_N_SEGMENTS):
        seg = b.add_body(f"segment_{i}", parent, pos=(0.0, 0.1, 0.0),
                         mass=_LINK_MASS, inertia=inertia)
        j = b.add_joint(f"joint_{i}", seg, JointType.HINGE,
                        axis=(0, 0, 1), pos=(0.0, -0.05, 0.0),
                        jrange=(-float(lim), float(lim)), limited=True,
                        stiffness=1e-3, armature=1e-6)
        b.add_actuator(j, ActuatorType.MOTOR, gear=2e-3,
                       ctrlrange=(-1.0, 1.0), forcerange=(-1.0, 1.0))
        parent = seg
    return b.finalize(dtype=dtype)


def _swimmer_residual(m: Model, task: Task, state: State, info: StepInfo,
                      ctrl: jax.Array) -> jax.Array:
    nose = info.site_xpos[m.struct.site_id("nose")][:2]
    target = task.mocap_pos[0, :2]
    return jnp.concatenate([ctrl, nose - target])


def _swimmer_transition(task: Task, m: Model, state: State,
                        info: StepInfo) -> Task:
    """Target respawns uniformly in [-0.8, 0.8]^2 once reached
    (Swimmer::TransitionLocked, swimmer.cc:49-60)."""
    nose = info.site_xpos[m.struct.site_id("nose")][:2]
    cur = task.mocap_pos[0]
    reached = jnp.linalg.norm(cur[:2] - nose) < _GOAL_TOL
    tick = jnp.round(state.time * 1e3).astype(jnp.int32)
    key = jax.random.fold_in(jax.random.PRNGKey(24), tick)
    new_xy = jax.random.uniform(key, (2,), dtype=cur.dtype,
                                minval=-0.8, maxval=0.8)
    new = jnp.concatenate([new_xy, cur[2:]])
    goal = jnp.where(reached, new, cur)
    return dataclasses.replace(task,
                               mocap_pos=task.mocap_pos.at[0].set(goal))


_TERMS = (
    TermSpec("Control", _N_SEGMENTS, NormType.QUADRATIC),
    TermSpec("Distance", 2, NormType.L2, num_params=1),
)
_WEIGHTS = (0.1, 10.0)
_NORM_PARAMS = ((0.0, 0.0), (_GOAL_TOL, 0.0))   # task.xml:35-36 user rows


def swimmer_task(target=(1.0, 1.0), dtype=jnp.float32) -> Task:
    return make_task("Swimmer", _TERMS, _swimmer_residual, _WEIGHTS,
                     norm_params=_NORM_PARAMS,
                     mocap={"target": (*target, 0.05)},
                     transition_fn=_swimmer_transition, dtype=dtype)
