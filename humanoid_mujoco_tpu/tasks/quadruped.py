"""Quadruped Flat locomotion — the reference's "Quadruped Flat" registry
entry (mjpc/tasks/quadruped/quadruped.cc:33-210, tasks.cc:71).

Model: the Unitree A1 the reference plans on (a1_modified.xml): trunk on
a free joint + 4 legs x (abduction / hip / knee) position-servo joints,
kp=50, forcerange +-33.5, masses/inertias/attachment offsets transcribed
from the XML's inertial blocks. Feet are the XML's own r=0.02 foot
spheres; the trunk box gets corner crash spheres. Joint zero-references
use the unmodified a1.xml convention (ref=0) with the standing pose in
the home keyframe (a1.xml:204: legs at 0 / 0.9 / -1.8, trunk z 0.27).

Residual (quadruped.cc:33-210, the Flat gait modes; Biped/Flip/Scramble
variants and the zero-weight Angmom term are not rebuilt):

    Upright     (3): trunk up-axis z - 1, 0, 0
    Height      (1): (trunk_z - avg foot z) - 0.25       [kHeightQuadruped]
    Position    (3): head site - goal mocap (z term 0)
    Gait        (4): per-foot swing tracking: foot_z - (ground + r + step)
                     where step = amplitude * StepHeight(phase, duty)
                     (quadruped.cc:653-673)
    Balance     (2): capture point - average foot position (xy)
    Effort     (12): 2e-2 * actuator torques
    Posture    (12): (qpos - home) * joint gains [2,1,1]
    Orientation (2): trunk heading - (cos, sin)(Heading goal)

norms/weights from task_flat.xml:102-109 (SmoothAbs 1/1/2, L2 0.2,
quadratic 0.03/0.02). Modes are the gaits Stand|Walk|Trot|Canter|Gallop;
the transition syncs cadence/amplitude/duty params and the
balance/upright/height weights from kGaitParam exactly like
QuadrupedFlat::TransitionLocked (quadruped.cc:290-296), and the gait
phase advances at 2*pi*cadence (GetPhase, quadruped.cc:622-624).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import NormType
from ..physics.model import (ActuatorType, JointType, Model, ModelBuilder,
                             State)
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task

_HEIGHT_GOAL = 0.25         # kHeightQuadruped (quadruped.h:119)
_FOOT_RADIUS = 0.02         # kFootRadius (quadruped.h:125)
_POSTURE_GAIN = (2.0, 1.0, 1.0)   # kJointPostureGain (quadruped.h:131)

# gait tables (quadruped.h:77-95): per-gait foot phase offsets and
# [duty ratio, cadence Hz, amplitude m, balance w, upright w, height w]
GAITS = ("Stand", "Walk", "Trot", "Canter", "Gallop")
_GAIT_PHASE = np.array([            # FL    HL    FR    HR
    [0.00, 0.00, 0.00, 0.00],
    [0.00, 0.75, 0.50, 0.25],
    [0.00, 0.50, 0.50, 0.00],
    [0.00, 0.33, 0.33, 0.66],
    [0.00, 0.40, 0.05, 0.35],
])
_GAIT_PARAM = np.array([
    [1.00, 1.0, 0.00, 0.00, 1.0, 1.0],
    [0.75, 1.0, 0.03, 0.00, 1.0, 1.0],
    [0.45, 2.0, 0.03, 0.20, 1.0, 1.0],
    [0.40, 4.0, 0.05, 0.03, 0.5, 0.2],
    [0.30, 3.5, 0.10, 0.03, 0.2, 0.1],
])

_FEET = ("FL", "HL", "FR", "HR")    # A1Foot order (quadruped.h:50-57)
_HOME_LEG = (0.0, 0.9, -1.8)        # abduction/hip/knee (a1.xml:204)

# leg attachment: (name, hip x, hip y sign)
_LEGS = (("FL", 0.183, 1.0), ("HL", -0.183, 1.0),
         ("FR", 0.183, -1.0), ("HR", -0.183, -1.0))


def quadruped_model(dt: float = 0.004, dtype=jnp.float32,
                    hfield_shape=None, hfield_halfsize=None) -> Model:
    """Unitree A1 (a1_modified.xml numbers, ref=0 joint convention).

    `hfield_shape`/`hfield_halfsize` size the floor heightfield for the
    Hill variant (task_hill.xml terrain) — shape is static topology, so
    it must be set at build time."""
    b = ModelBuilder(dt=dt)
    b.has_floor = True
    if hfield_shape is not None:
        b.hfield_shape = hfield_shape
    if hfield_halfsize is not None:
        b.hfield_halfsize = hfield_halfsize

    trunk = b.add_body("trunk", -1, pos=(0.0, 0.0, 0.27), mass=4.713,
                       ipos=(0.0, 0.0041, -0.0005),
                       inertia=(0.0158533, 0.0377999, 0.0456542))
    b.add_joint("root", trunk, JointType.FREE)
    b.add_site("head", trunk, pos=(0.3, 0.0, 0.0))
    # trunk crash spheres (collision box 0.125 x 0.04 x 0.057)
    for sx in (-0.12, 0.12):
        for sy in (-0.04, 0.04):
            b.add_sphere(trunk, pos=(sx, sy, 0.0), radius=0.055,
                         friction=0.6)

    for name, hx, ys in _LEGS:
        hip = b.add_body(f"{name}_hip", trunk, pos=(hx, ys * 0.047, 0.0),
                         mass=0.696,
                         ipos=(-0.003311 * np.sign(hx), ys * 0.000635, 0.0),
                         inertia=(0.000807752, 0.00055293, 0.000468983))
        abd = b.add_joint(f"{name}_hip_joint", hip, JointType.HINGE,
                          axis=(1, 0, 0), jrange=(-0.802851, 0.802851),
                          limited=True, damping=1.0, armature=0.01)
        thigh = b.add_body(f"{name}_thigh", hip, pos=(0.0, ys * 0.08505, 0.0),
                           mass=1.013,
                           ipos=(-0.003237, -ys * 0.022327, -0.027326),
                           inertia=(0.00555739, 0.00513936, 0.00133944))
        hipj = b.add_joint(f"{name}_thigh_joint", thigh, JointType.HINGE,
                           axis=(0, 1, 0), jrange=(-1.0472, 4.18879),
                           limited=True, damping=2.0, armature=0.01)
        calf = b.add_body(f"{name}_calf", thigh, pos=(0.0, 0.0, -0.2),
                          mass=0.226, ipos=(0.00472659, 0.0, -0.131975),
                          inertia=(0.00340344, 0.00339393, 3.54834e-05))
        knee = b.add_joint(f"{name}_calf_joint", calf, JointType.HINGE,
                           axis=(0, 1, 0), jrange=(-2.69653, -0.916298),
                           limited=True, damping=2.0, armature=0.01)
        b.add_sphere(calf, pos=(0.0, 0.0, -0.2), radius=_FOOT_RADIUS,
                     friction=0.6)
        b.add_site(name, calf, pos=(0.0, 0.0, -0.2))
        for j, rng in ((abd, (-0.802851, 0.802851)),
                       (hipj, (-1.0472, 4.18879)),
                       (knee, (-2.69653, -0.916298))):
            b.add_actuator(j, ActuatorType.POSITION, gear=1.0, kp=50.0,
                           kv=0.0, ctrlrange=rng,
                           forcerange=(-33.5, 33.5))
    return b.finalize(dtype=dtype)


def quadruped_home_qpos(m: Model) -> jax.Array:
    """Standing keyframe (a1.xml:204): trunk z 0.27, legs 0 / 0.9 / -1.8."""
    q = np.zeros(m.nq)
    q[2] = 0.27
    q[3] = 1.0
    q[7:] = np.tile(_HOME_LEG, 4)
    return jnp.asarray(q, dtype=m.dt.dtype)


def home_ctrl(m: Model) -> jax.Array:
    return jnp.asarray(np.tile(_HOME_LEG, 4), dtype=m.dt.dtype)


def _step_height(phase: jax.Array, footphase: jax.Array,
                 duty: jax.Array) -> jax.Array:
    """Swing-height profile (StepHeight, quadruped.cc:653-662): cosine
    bump over the swing fraction of the cycle, 0 during stance."""
    angle = jnp.mod(phase + jnp.pi - footphase, 2 * jnp.pi) - jnp.pi
    angle = angle * 0.5 / jnp.maximum(1.0 - duty, 1e-6)
    value = jnp.cos(jnp.clip(angle, -jnp.pi / 2, jnp.pi / 2))
    value = jnp.where(duty < 1.0, value, 0.0)
    return jnp.where(jnp.abs(value) < 1e-6, 0.0, value)


def _quadruped_residual(m: Model, task: Task, state: State, info: StepInfo,
                        ctrl: jax.Array) -> jax.Array:
    s = m.struct
    dtype = state.qpos.dtype
    trunk = s.body_id("trunk")
    R = _quat_to_up_and_heading(info.xquat[trunk], dtype)
    up_z, heading = R

    foot_pos = jnp.stack([info.site_xpos[s.site_id(f)] for f in _FEET])
    avg_foot = foot_pos.mean(axis=0)
    trunk_com = info.xipos[trunk]
    goal = task.mocap_pos[0]

    # Upright (3)
    upright = jnp.stack([up_z - 1.0, jnp.zeros((), dtype),
                         jnp.zeros((), dtype)])

    # Height (1)
    height = (trunk_com[2] - avg_foot[2] - _HEIGHT_GOAL)[None]

    # Position (3): head site to goal, z free
    head = info.site_xpos[s.site_id("head")]
    position = jnp.stack([head[0] - goal[0], head[1] - goal[1],
                          jnp.zeros((), dtype)])

    # Gait (4): cadence/amplitude/duty live in params (synced per gait)
    cadence, amplitude, duty = (task.params[0], task.params[1],
                                task.params[2])
    phase = 2 * jnp.pi * cadence * state.time
    footphase = 2 * jnp.pi * jnp.asarray(_GAIT_PHASE, dtype)[task.mode]
    step = amplitude * jax.vmap(
        lambda fp: _step_height(phase, fp, duty))(footphase)
    target_z = m.floor_z + _FOOT_RADIUS + step
    gait = jnp.where(step != 0.0, foot_pos[:, 2] - target_z, 0.0)

    # Balance (2): capture point vs average foot position
    fall_time = jnp.sqrt(2 * _HEIGHT_GOAL / 9.81).astype(dtype)
    capture = info.com[:2] + fall_time * info.com_vel[:2]
    balance = capture - avg_foot[:2]

    # Effort (12)
    effort = 2e-2 * info.actuator_force

    # Posture (12)
    gains = jnp.asarray(np.tile(_POSTURE_GAIN, 4), dtype)
    posture = (state.qpos[7:] - jnp.asarray(
        np.tile(_HOME_LEG, 4), dtype)) * gains

    # Orientation (2): heading vs Heading goal param
    hgoal = task.params[3]
    orientation = jnp.stack([heading[0] - jnp.cos(hgoal),
                             heading[1] - jnp.sin(hgoal)])

    return jnp.concatenate([upright, height, position, gait, balance,
                            effort, posture, orientation])


def _quat_to_up_and_heading(q: jax.Array, dtype):
    """(R[2,2], normalized R[:2,0]) from a unit quaternion — the
    torso_xmat[8] and heading columns the reference residual reads."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    up_z = 1 - 2 * (x * x + y * y)                 # R[2,2]
    fx = 1 - 2 * (y * y + z * z)                   # R[0,0]
    fy = 2 * (x * y + w * z)                       # R[1,0]
    n = jnp.maximum(jnp.sqrt(fx * fx + fy * fy), 1e-9)
    return up_z.astype(dtype), jnp.stack([fx / n, fy / n]).astype(dtype)


def _gait_transition(task: Task, m: Model, state: State,
                     info: StepInfo) -> Task:
    """Sync cadence/amplitude/duty + balance/upright/height weights to
    the active gait (TransitionLocked, quadruped.cc:290-296)."""
    gp = jnp.asarray(_GAIT_PARAM, task.params.dtype)[task.mode]
    params = task.params.at[0].set(gp[1]).at[1].set(gp[2]).at[2].set(gp[0])
    # term order: Upright(0) Height(1) Position(2) Gait(3) Balance(4) ...
    weights = (task.weights.at[4].set(gp[3]).at[0].set(gp[4])
               .at[1].set(gp[5]))
    return dataclasses.replace(task, params=params, weights=weights)


_TERMS = (
    TermSpec("Upright", 3, NormType.SMOOTH_ABS, 1),
    TermSpec("Height", 1, NormType.SMOOTH_ABS, 1),
    TermSpec("Position", 3, NormType.L2, 1),
    TermSpec("Gait", 4, NormType.SMOOTH_ABS, 1),
    TermSpec("Balance", 2, NormType.L2, 1),
    TermSpec("Effort", 12, NormType.QUADRATIC),
    TermSpec("Posture", 12, NormType.QUADRATIC),
    TermSpec("Orientation", 2, NormType.QUADRATIC),
)
_WEIGHTS = (1.0, 1.0, 0.2, 2.0, 0.2, 0.03, 0.02, 0.0)
_NORM_PARAMS = ((0.05, 0), (0.04, 0), (0.1, 0), (0.03, 0), (0.1, 0),
                (0, 0), (0, 0), (0, 0))


def quadruped_task(goal=(1.0, 0.0, 0.26), gait: str = "Stand",
                   dtype=jnp.float32) -> Task:
    t = make_task(
        "Quadruped Flat", _TERMS, _quadruped_residual, _WEIGHTS,
        norm_params=_NORM_PARAMS,
        params=(_GAIT_PARAM[0][1], _GAIT_PARAM[0][2], _GAIT_PARAM[0][0],
                0.0),
        param_names=("Cadence", "Amplitude", "Duty ratio", "Heading"),
        mocap={"goal": tuple(goal)},
        transition_fn=_gait_transition,
        mode_names=GAITS, dtype=dtype)
    return t.set_mode(gait) if gait != "Stand" else t
