"""Rubik solve — the reference registry's "Rubik" entry
(mjpc/tasks/rubik/{solve.cc,task.xml}, tasks.cc:68): the Shadow hand
unscrambles a Rubik's cube, face goals scored as the six face-hinge
angles vs goal angles (solve.cc:100-111), while keeping the cube on
the palm at a goal orientation.

Mechanism: the reference uses MuJoCo's 26-cubie cube (20 ball joints;
nq 93) whose face turns emerge from cubie-cubie contact. That
mechanism is deliberately simplified here to stay inside the engine's
fixed-capacity contact budget: a free cube core carries SIX hinged
face plates (one rotational DOF per face about its outward normal,
light damping), each a thin box the fingertips turn by contact
friction. The solve-level interface is identical — qpos face angles
vs the six goal parameters, the same mode flow (Wait | Scramble |
Solve) with the scramble goal authored by `scramble_goals`.

Residual (solve.cc:60-133):
    In Hand    (3): cube - palm grasp site
    Orientation(3): goal-quat tangent error
    Cube Vel.  (3): cube linear velocity
    Actuator  (24): actuator force
    Faces      (6): face angles - goal angles (Manual/Solve modes)
    Grasp     (24): hand qpos - grasp keyframe
    Joint Vel.(24): hand qvel
    Remaining  (1): 12 * remaining-goal count (params[6])
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import NormType
from ..physics.math import quat_sub
from ..physics.model import (ActuatorType, JointType, Model, ModelBuilder,
                             State)
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task
from .hands import _KEY_HAND, _load

_CUBE_HALF = 0.0285                     # 57 mm cube
_CUBE_START = (0.33326, -0.00362331, 0.045)
_FACE_AXES = ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
              (0, 0, 1), (0, 0, -1))
_FACE_NAMES = ("red", "orange", "blue", "green", "white", "yellow")
_SOLVE_TOL = 0.085                      # solve.cc:214


def rubik_model(dt: float = 0.01, max_contacts: int = 16,
                dtype=jnp.float32) -> Model:
    d = _load("shadow")
    b = ModelBuilder(dt=dt)
    b.has_floor = True
    b.max_contacts = max_contacts

    ids = {}
    for name, parent, pos, quat, mass, ipos, iquat, diag in d.BODIES:
        pid = -1 if parent is None else ids[parent]
        ids[name] = b.add_body(name, pid, pos=pos, quat=quat, mass=mass,
                               ipos=ipos, iquat=iquat, inertia=diag)
    for (name, body, axis, pos, rng, damping, armature, kp, cr,
         fr) in d.JOINTS:
        j = b.add_joint(name, ids[body], JointType.HINGE, axis=axis,
                        pos=pos, jrange=rng,
                        limited=rng != (0.0, 0.0), damping=damping,
                        armature=armature)
        b.add_actuator(j, ActuatorType.POSITION, kp=kp, ctrlrange=cr,
                       forcerange=fr)
    b.add_site("grasp_site", ids["rh_palm"], pos=(0.0, -0.035, 0.09))

    sphs = [b.add_sphere(ids["rh_palm"], pos=(0.0, -0.035, 0.09),
                         radius=0.03, friction=1.0, floor=False)]
    for name, parent, pos, quat, mass, ipos, iquat, diag in d.BODIES:
        if name == "rh_palm":
            continue
        sphs.append(b.add_sphere(ids[name], pos=ipos, radius=0.011,
                                 friction=1.0, floor=False))

    cube = b.add_body("cube", -1, pos=_CUBE_START, mass=0.0685,
                      inertia=(0.0685 / 6 * 2 * _CUBE_HALF ** 2,) * 3)
    b.add_joint("cube_free", cube, JointType.FREE)
    core = b.add_box(cube, size=(_CUBE_HALF * 0.98,) * 3, friction=1.0,
                     floor=True)
    plates = []
    for i, (ax, name) in enumerate(zip(_FACE_AXES, _FACE_NAMES)):
        axv = np.asarray(ax, dtype=float)
        face = b.add_body(f"face_{name}", cube,
                          pos=tuple(axv * _CUBE_HALF), mass=0.009,
                          inertia=(2.4e-06, 2.4e-06, 4.7e-06))
        b.add_joint(f"face_{name}_hinge", face, JointType.HINGE,
                    axis=tuple(axv), damping=0.02)
        # thin plate normal to the face axis (fingertips turn it by
        # contact friction, incl. the contact model's torsional term)
        half = np.full(3, _CUBE_HALF * 0.96)
        half[np.argmax(np.abs(axv))] = 0.004
        plates.append(b.add_box(face, size=tuple(half), friction=1.2,
                                friction_tor=0.02, floor=False))
    for s in sphs:
        b.add_pair_sb(s, core)
        for p in plates:
            b.add_pair_sb(s, p)
    return b.finalize(dtype=dtype)


def rubik_home_qpos(m: Model) -> jax.Array:
    key = np.asarray(_KEY_HAND["shadow"])
    q = np.zeros(m.nq)
    q[:24] = key
    q[24:27] = _CUBE_START
    q[27] = 1.0
    return jnp.asarray(q, dtype=m.dt.dtype)


def scramble_goals(key: jax.Array, n: int) -> np.ndarray:
    """Author a scramble: n quarter-turns on random faces, returned as
    the sequence of face-angle goal vectors (most-scrambled first —
    the goal_cache_ of solve.cc:150-199)."""
    rng = np.random.default_rng(int(jax.device_get(
        jax.random.randint(key, (), 0, 2 ** 31 - 1))))
    angles = np.zeros(6)
    cache = []
    for _ in range(n):
        cache.append(angles.copy())
        face = rng.integers(0, 6)
        angles[face] += rng.choice((-1.0, 1.0)) * 0.5 * np.pi
    cache.append(angles.copy())
    return np.stack(cache[::-1])    # [scrambled ... solved]


def _rubik_residual(m: Model, task: Task, state: State, info: StepInfo,
                    ctrl: jax.Array) -> jax.Array:
    s = m.struct
    dtype = info.xpos.dtype
    cube = s.body_id("cube")
    in_hand = info.xpos[cube] - info.site_xpos[s.site_id("grasp_site")]
    goal_q = task.mocap_quat[0]
    goal_q = goal_q / jnp.linalg.norm(goal_q)
    orient = quat_sub(goal_q, info.xquat[cube])
    cube_vel = info.body_com_vel[cube]
    act = info.actuator_force

    # face hinge angles live after the cube free joint (qpos 31:37)
    faces_on = task.mode != 0           # Wait gates the face term off
    faces = jnp.where(faces_on,
                      state.qpos[31:37] - task.params[:6],
                      jnp.zeros(6, dtype=dtype))
    pose = state.qpos[:24] - jnp.asarray(
        np.asarray(_KEY_HAND["shadow"]), dtype=dtype)
    jvel = state.qvel[:24]
    remaining = (task.params[6] * 12.0)[None]
    return jnp.concatenate([in_hand, orient, cube_vel, act, faces, pose,
                            jvel, remaining])


def _rubik_transition(task: Task, m: Model, state: State,
                      info: StepInfo) -> Task:
    """Solve-mode success check (solve.cc:207-222): once the face
    angles match within 0.085, decrement the remaining-goal counter;
    at zero, drop to Wait (solved)."""
    err = jnp.linalg.norm(state.qpos[31:37] - task.params[:6])
    solving = task.mode == 2
    solved_one = jnp.logical_and(solving, err < _SOLVE_TOL)
    remaining = jnp.maximum(task.params[6] - jnp.where(solved_one, 1.0,
                                                       0.0), 0.0)
    new_mode = jnp.where(
        jnp.logical_and(solved_one, remaining <= 0.0), 0, task.mode)
    return dataclasses.replace(
        task, mode=new_mode.astype(task.mode.dtype),
        params=task.params.at[6].set(remaining))


_TERMS = (
    TermSpec("In Hand", 3, NormType.L22, num_params=2),
    TermSpec("Orientation", 3, NormType.QUADRATIC),
    TermSpec("Cube Vel.", 3, NormType.QUADRATIC),
    TermSpec("Actuator", 24, NormType.QUADRATIC),
    TermSpec("Faces", 6, NormType.QUADRATIC),
    TermSpec("Grasp", 24, NormType.QUADRATIC),
    TermSpec("Joint Vel.", 24, NormType.QUADRATIC),
    TermSpec("Remaining", 1, NormType.NULL),
)
_WEIGHTS = (20.0, 5.0, 10.0, 0.1, 10.0, 2.5, 1.0e-4, 1.0)
_NORM_PARAMS = ((0.02, 2.0),) + ((0.0, 0.0),) * 7


def rubik_task(dtype=jnp.float32) -> Task:
    params = np.zeros(7)                # 6 face goals + remaining count
    return make_task("Rubik", _TERMS, _rubik_residual, _WEIGHTS,
                     norm_params=_NORM_PARAMS,
                     params=tuple(params),
                     param_names=tuple(f"Goal {n}"
                                       for n in _FACE_NAMES)
                     + ("Remaining",),
                     mocap={"goal": ((0.325, 0.17, 0.0475),
                                     (1.0, 0.0, 0.0, 0.0))},
                     transition_fn=_rubik_transition,
                     mode_names=("Wait", "Scramble", "Solve"),
                     dtype=dtype)
