"""Quadrotor racing task — the reference's "Quadrotor" registry entry
(mjpc/tasks/quadrotor/quadrotor.cc, tasks.cc:70).

Model: the Skydio X2 free-flyer the reference plans on
(quadrotor_modified.xml): one free body, four rotors as SITE_THRUST
actuators with gear (0,0,1,0,0,±0.0201) — thrust along body z at each
rotor site plus a yaw drag torque, ctrlrange [0,13] N. Masses from the
XML (4 × 0.25 kg rotors + 0.325 kg core = 1.325 kg); the diagonal
inertia is the point-mass/ellipsoid sum of that layout about its COM.

Residual (quadrotor.cc:38-57):

    Position (3): body position − mocap goal
    Lin. Vel (3): linear velocity
    Ang. Vel (3): angular velocity
    Control (nu): ctrl − hover thrust   (hover = m g / nu per rotor)

quadratic norms, weights 25 / 1.25 / 1.25 / 1e-3 (task.xml user
sensors; the Orientation term has weight 0 and is omitted like the
stand task's yaw term).

Transition (quadrotor.cc:60-88): a 12-waypoint circuit — when the
quadrotor is within 0.5 m of the goal the goal advances to the next
keyframe waypoint (mode = current waypoint, wrapping at 12). Mode 0 is
the auto-advancing "Loop"; like the reference's GUI mode list, setting
a nonzero mode pins the goal to that stage.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.norms import NormType
from ..physics.model import Model, ModelBuilder, JointType, State
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task

# the 12 keyframe waypoints (task.xml:82-93 key mpos entries)
_WAYPOINTS = (
    (1.2, 0.0, 0.75), (2.3, 0.6, 1.5), (2.7, 0.95, 1.5),
    (4.6, 0.4, 0.75), (5.0, -1.8, 0.75), (3.4, -2.5, 0.75),
    (2.5, -2.25, 1.45), (2.5, -2.25, 2.25), (1.5, -1.75, 1.85),
    (1.05, -1.75, 1.3), (0.1, -1.4, 0.75), (0.0, 0.0, 0.75),
)

_MASS = 1.325            # 4 x 0.25 rotor + 0.325 core (quadrotor_modified.xml)
_GRAVITY = 9.81
_YAW_DRAG = 0.0201       # rotor torque/thrust ratio (gear 6th component)
# rotor site positions in the body frame (quadrotor_modified.xml sites)
_ROTORS = ((-0.14, -0.18, 0.05, -1.0), (-0.14, 0.18, 0.05, 1.0),
           (0.14, 0.18, 0.08, 1.0), (0.14, -0.18, 0.08, -1.0))


def quadrotor_model(dt: float = 0.01, dtype=jnp.float32) -> Model:
    """Skydio X2: free body + 4 rotor thrust sites. dt from the task's
    agent_timestep 0.01 (task.xml:15)."""
    b = ModelBuilder(dt=dt)
    b.has_floor = True

    # diagonal inertia about the COM (z_com = 0.054): rotor point masses
    # at (+-0.14, +-0.18) plus rotor-disk and core-ellipsoid own terms
    body = b.add_body("x2", -1, pos=(0.0, 0.0, 0.1), mass=_MASS,
                      ipos=(0.0, 0.0, 0.054),
                      inertia=(0.037, 0.025, 0.060))
    b.add_joint("root", body, JointType.FREE)
    for i, (x, y, z, s) in enumerate(_ROTORS):
        site = b.add_site(f"thrust{i + 1}", body, pos=(x, y, z))
        b.add_thrust(site, gear=(0.0, 0.0, 1.0, 0.0, 0.0, s * _YAW_DRAG),
                     ctrlrange=(0.0, 13.0), forcerange=(0.0, 13.0))
    # landing-gear contact spheres so a crash lands instead of tunneling
    for sx in (-0.1, 0.1):
        for sy in (-0.1, 0.1):
            b.add_sphere(body, pos=(sx, sy, 0.0), radius=0.02, friction=0.7)
    return b.finalize(dtype=dtype)


def quadrotor_home_qpos(m: Model) -> jax.Array:
    q = jnp.zeros(m.nq, dtype=m.dt.dtype)
    return q.at[2].set(0.3).at[3].set(1.0)


def _quadrotor_residual(m: Model, task: Task, state: State, info: StepInfo,
                        ctrl: jax.Array) -> jax.Array:
    """[pos − goal; linvel; angvel; ctrl − hover] (quadrotor.cc:38-57)."""
    body = m.struct.body_id("x2")
    pos = info.xpos[body]
    linvel = state.qvel[0:3]
    angvel = state.qvel[3:6]
    hover = _MASS * _GRAVITY / m.nu
    return jnp.concatenate([
        pos - task.mocap_pos[0],
        linvel,
        angvel,
        ctrl - hover,
    ])


def _waypoint_transition(task: Task, m: Model, state: State,
                         info: StepInfo) -> Task:
    """Advance the goal around the 12-waypoint circuit once the craft is
    within 0.5 m (quadrotor.cc:73-88). Branch-free: the mode is a traced
    int leaf; reaching the goal increments it mod n_waypoints."""
    wps = jnp.asarray(_WAYPOINTS, dtype=task.mocap_pos.dtype)
    body = m.struct.body_id("x2")
    err = info.xpos[body] - task.mocap_pos[0]
    reached = jnp.linalg.norm(err) <= 0.5
    mode = jnp.where(reached, (task.mode + 1) % len(_WAYPOINTS), task.mode)
    return dataclasses.replace(
        task, mode=mode.astype(task.mode.dtype),
        mocap_pos=task.mocap_pos.at[0].set(wps[mode]))


_TERMS = (
    TermSpec("Position", 3, NormType.QUADRATIC),
    TermSpec("Lin. Vel.", 3, NormType.QUADRATIC),
    TermSpec("Ang. Vel.", 3, NormType.QUADRATIC),
    TermSpec("Control", 4, NormType.QUADRATIC),
)
_WEIGHTS = (25.0, 1.25, 1.25, 1.0e-3)


def quadrotor_task(dtype=jnp.float32) -> Task:
    return make_task(
        "Quadrotor", _TERMS, _quadrotor_residual, _WEIGHTS,
        mocap={"goal": _WAYPOINTS[0]},
        transition_fn=_waypoint_transition,
        mode_names=tuple(["Loop"] + [f"Stage{i + 1}" for i in range(11)]),
        dtype=dtype)
