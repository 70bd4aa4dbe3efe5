"""Dexterous-hand cube reorientation — the reference registry's
"Allegro" (mjpc/tasks/allegro/allegro.cc) and "Shadow"
(mjpc/tasks/shadow_reorient/hand.cc) entries.

Models: the menagerie Wonik Allegro (16 servo DOF) and Shadow E3M5
(24 hinge DOF; the four J0 tendon-coupled distal pairs become
independently-servoed joints sharing their actuator's gains — the
transmission difference is documented in tools/gen_hand_data.py) with
a free reorientation cube. Mesh collision becomes sphere proxies at
every finger-link inertial center + a palm sphere, paired against the
cube box; the cube also collides with the floor.

Residual (allegro.cc:31-77 / hand.cc:31-84), shared structure:
    In Hand     (3): cube - grasp_site           [L22(p,2)]
    Orientation (3): goal quat (-) cube quat tangent  [Quadratic]
    Cube Vel.   (3): cube linear velocity        [Quadratic]
    Actuator   (nu): actuator force              [Quadratic]
    Grasp      (nj): hand qpos - grasp keyframe  [Quadratic]
    Joint Vel. (nj): hand qvel                   [Quadratic]

(The Shadow reference model carries 2 extra wrist DOF in its task
scene — its Grasp/Joint Vel rows are 26-D; this hand is the 24-DOF
right_hand.xml, so they are 24-D here.)

Transition: the reference teleports a dropped cube back into the hand
(stateful, hand.cc:88-118); the pure-task analog respawns a fresh
random goal orientation once the current one is matched within 0.1 rad
— dropped-cube resets belong to the harness/env reset.
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

# cube free-joint starting poses (task.xml keyframes)
_CUBE = {
    "allegro": dict(half=0.03, mass=0.122, pos=(0.2, 0.025, 0.075),
                    quat=(1.0, 0.0, 0.0, 0.0)),
    "shadow": dict(half=0.022, mass=0.126,
                   pos=(0.33326, -0.00362331, 0.0375343),
                   quat=(0.707635, 0.70405, 0.0500937, -0.0325089)),
}
# hand-joint keyframe poses (task.xml home/grasp keys, hand segment)
_KEY_HAND = {
    "allegro": (0, 0.58058, 0.701595, 0.538675, 0, 0.60767, 0.758085,
                0.741625, 0, 0.8876, 0.720425, 0.5848, 0.263, 0.32612,
                1.08493, 0.806715),
    "shadow": (0, -0.235248, -0.178041, 0.480484, 0.730515, 0.6284,
               -0.059347, 0.535468, 0.746225, 0.56556, -0.03491,
               0.544632, 0.53414, 0.793355, 0.384846, -0.254843,
               0.178072, 0.761935, 0.746225, -0.90042, 0.06721, 0.01047,
               0.6981, 0.4255),
}
_GOAL_START = (0.325, 0.17, 0.0475)     # goal display body pos


def _load(hand: str):
    if hand == "allegro":
        from ..physics import allegro_data as d
    else:
        from ..physics import shadow_data as d
    return d


def _hand_model(hand: str, dt: float, max_contacts: int,
                dtype) -> Model:
    d = _load(hand)
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

    palm_name = "palm" if hand == "allegro" else "rh_palm"
    grasp_pos = ((0.0, 0.0, 0.0) if hand == "allegro"
                 else (0.0, -0.035, 0.09))
    b.add_site("grasp_site", ids[palm_name], pos=grasp_pos)

    # hand proxies never touch the floor (the fixed base sits at the
    # plane; a floor slot there would inject huge static violations)
    sphs = [b.add_sphere(ids[palm_name], pos=grasp_pos, radius=0.03,
                         friction=1.0, floor=False)]
    for name, parent, pos, quat, mass, ipos, iquat, diag in d.BODIES:
        if name == palm_name:
            continue
        sphs.append(b.add_sphere(ids[name], pos=ipos, radius=0.011,
                                 friction=1.0, floor=False))

    # palm face as a box so the cube can rest on it (a single sphere
    # leaves fall-through gaps)
    palm_box = None
    if hand == "allegro":
        palm_box = b.add_box(ids[palm_name], pos=(-0.009, 0.0, -0.04),
                             size=(0.0125, 0.05, 0.0555), friction=1.0,
                             floor=False)

    c = _CUBE[hand]
    cube = b.add_body("cube", -1, pos=c["pos"], mass=c["mass"],
                      inertia=(c["mass"] / 6 * (2 * c["half"] ** 2),) * 3)
    b.add_joint("cube_free", cube, JointType.FREE)
    box = b.add_box(cube, size=(c["half"],) * 3, friction=1.0,
                    floor=True)
    for s in sphs:
        b.add_pair_sb(s, box)
    if palm_box is not None:
        b.add_pair_bb(palm_box, box)
    return b.finalize(dtype=dtype)


def allegro_model(dt: float = 0.01, max_contacts: int = 16,
                  dtype=jnp.float32) -> Model:
    return _hand_model("allegro", dt, max_contacts, dtype)


def shadow_model(dt: float = 0.01, max_contacts: int = 16,
                 dtype=jnp.float32) -> Model:
    return _hand_model("shadow", dt, max_contacts, dtype)


def _home_qpos(hand: str, m: Model) -> jax.Array:
    key = np.asarray(_KEY_HAND[hand])
    c = _CUBE[hand]
    q = np.zeros(m.nq)
    q[:key.size] = key
    q[key.size:key.size + 3] = c["pos"]
    q[key.size + 3:key.size + 7] = c["quat"]
    return jnp.asarray(q, dtype=m.dt.dtype)


def allegro_home_qpos(m: Model) -> jax.Array:
    return _home_qpos("allegro", m)


def shadow_home_qpos(m: Model) -> jax.Array:
    return _home_qpos("shadow", m)


def _make_residual(hand: str, nj: int):
    key_hand = np.asarray(_KEY_HAND[hand], dtype=np.float32)

    def residual(m: Model, task: Task, state: State, info: StepInfo,
                 ctrl: jax.Array) -> jax.Array:
        s = m.struct
        dtype = info.xpos.dtype
        cube = s.body_id("cube")
        cube_pos = info.xpos[cube]
        grasp = info.site_xpos[s.site_id("grasp_site")]
        in_hand = cube_pos - grasp

        goal_q = task.mocap_quat[0]
        goal_q = goal_q / jnp.linalg.norm(goal_q)
        orient = quat_sub(goal_q, info.xquat[cube])

        cube_vel = info.body_com_vel[cube]
        act = info.actuator_force
        pose = state.qpos[:nj] - jnp.asarray(key_hand, dtype=dtype)
        jvel = state.qvel[:nj]
        return jnp.concatenate([in_hand, orient, cube_vel, act, pose,
                                jvel])

    return residual


def _make_transition(nj: int):
    def transition(task: Task, m: Model, state: State,
                   info: StepInfo) -> Task:
        """Fresh random goal orientation once matched within 0.1 rad
        (the success-side of the reference's cube-management
        transition)."""
        cube = m.struct.body_id("cube")
        goal_q = task.mocap_quat[0]
        goal_q = goal_q / jnp.linalg.norm(goal_q)
        err = jnp.linalg.norm(quat_sub(goal_q, info.xquat[cube]))
        solved = jnp.logical_and(state.time > 0, err < 0.1)
        tick = jnp.round(state.time * 1e3).astype(jnp.int32)
        key = jax.random.fold_in(jax.random.PRNGKey(17), tick)
        q = jax.random.normal(key, (4,), dtype=goal_q.dtype)
        q = q / jnp.linalg.norm(q)
        newq = jnp.where(solved, q, task.mocap_quat[0])
        return dataclasses.replace(
            task, mocap_quat=task.mocap_quat.at[0].set(newq))
    return transition


def _make_task(name: str, hand: str, nj: int, nu: int, pos_weight: float,
               orient_weight: float, act_weight: float,
               grasp_weight: float, jvel_weight: float, dtype):
    terms = (
        TermSpec("In Hand", 3, NormType.L22, num_params=2),
        TermSpec("Orientation", 3, NormType.QUADRATIC),
        TermSpec("Cube Vel.", 3, NormType.QUADRATIC),
        TermSpec("Actuator", nu, NormType.QUADRATIC),
        TermSpec("Grasp", nj, NormType.QUADRATIC),
        TermSpec("Joint Vel.", nj, NormType.QUADRATIC),
    )
    weights = (pos_weight, orient_weight, 10.0, act_weight,
               grasp_weight, jvel_weight)
    norm_params = ((0.02, 2.0),) + ((0.0, 0.0),) * 5
    return make_task(name, terms, _make_residual(hand, nj), weights,
                     norm_params=norm_params,
                     mocap={"goal": (_GOAL_START, (1.0, 0.0, 0.0, 0.0))},
                     transition_fn=_make_transition(nj), dtype=dtype)


def allegro_task(dtype=jnp.float32) -> Task:
    # task.xml:51-56 weights
    return _make_task("Allegro", "allegro", 16, 16, 75.0, 7.5, 1.0,
                      0.1, 1.0e-3, dtype)


def shadow_task(dtype=jnp.float32) -> Task:
    # task.xml:39-44 weights
    return _make_task("Shadow", "shadow", 24, 24, 20.0, 5.0, 0.1, 2.5,
                      1.0e-4, dtype)
