"""PickAndPlace — the reference registry's manipulation::Bring entry
(mjpc/tasks/manipulation/{manipulation.cc,common.cc,
task_panda_bring.xml}, tasks.cc:60).

Model: the Panda arm (shared builder with tasks/panda.py; the
reference merges a Robotiq 2f85 via merge_panda_robotiq.py — here the
same two-finger gripper as the Panda task stands in) + a small free
box with the XML's 8 corner sites (+-0.04) + a pedestal-top goal pose.

Residual (manipulation.cc:31-61):
    Reach   (3): hand (fingertip midpoint; ComputeRobotiqHandPos
                 analog) - object             [L2(0.005),     w 1]
    Bring   (8): |corner_i(object) - corner_i(target)|
                                              [SmoothAbs(0.01), w .2]
    Careful (1): log10(1 + sum of robot contact-force magnitudes NOT
                 involving the object) (CarefulCost, common.cc:210-229
                 — here the static contact-slot tables classify robot
                 contacts branch-free)        [SmoothAbs(0.01), w .2]
    Away    (1): min(0, hand_z - 0.6)        [SmoothAbs(0.01), w 0]

Transition (manipulation.cc:64-100), staged via task.mode:
    bring solved (raw Bring cost < 0.04)  -> reach off, away on
    away solved  (raw Away cost < 0.01)   -> reach on, away off,
                                             target respawns with a
                                             random orientation
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import norms
from ..ops.norms import NormType
from ..physics.math import quat_rotate
from ..physics.model import JointType, Model, ModelBuilder, State
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task
from .panda import _HOME_ARM, add_panda_actuators, build_panda_arm

_OBJ_SIZE = (0.011, 0.0151, 0.021)      # task_panda_bring.xml:77
_CORNERS = tuple((sx, sy, sz)
                 for sz in (0.04, -0.04) for sy in (0.04, -0.04)
                 for sx in (0.04, -0.04))
_OBJ_START = (0.45, 0.0, 0.0305)        # on the pedestal
_TARGET_START = (0.45, 0.0, 0.15)       # reset pose (manipulation.cc:87)


def pickplace_model(dt: float = 0.005, dtype=jnp.float32) -> Model:
    b = ModelBuilder(dt=dt)
    b.has_floor = True
    eeff, tips = build_panda_arm(b)

    obj = b.add_body("object", -1, pos=_OBJ_START, mass=0.034,
                     inertia=(4.9e-06, 3.9e-06, 2.4e-06))
    b.add_joint("object_free", obj, JointType.FREE)
    box = b.add_box(obj, size=_OBJ_SIZE, friction=1.0, floor=True)
    for i, pos in enumerate(_CORNERS):
        b.add_site(str(i), obj, pos=pos)
    for t in tips:
        b.add_pair_sb(t, box)

    add_panda_actuators(b, eeff)
    return b.finalize(dtype=dtype)


def pickplace_home_qpos(m: Model) -> jax.Array:
    q = np.zeros(m.nq)
    q[:7] = _HOME_ARM
    q[7:9] = 0.04
    q[9:12] = _OBJ_START
    q[12] = 1.0
    return jnp.asarray(q, dtype=m.dt.dtype)


def _hand_pos(m: Model, info: StepInfo):
    """Fingertip midpoint (ComputeRobotiqHandPos analog)."""
    s = m.struct
    lt = info.site_xpos[s.site_id("tip_left_finger")]
    rt = info.site_xpos[s.site_id("tip_right_finger")]
    return 0.5 * (lt + rt)


def _careful_mask(m: Model) -> np.ndarray:
    """Static per-slot mask: 1 where the contact slot involves a robot
    body and NOT the object (CarefulCost's contact filter as a
    constant vector over the fixed slot tables)."""
    s = m.struct
    obj = s.body_id("object")
    a = np.asarray(s.slot_body_a)
    bvals = np.asarray(s.slot_body_b)
    is_robot_a = (a >= 0) & (a != obj)
    is_robot_b = (bvals >= 0) & (bvals != obj)
    involves_obj = (a == obj) | (bvals == obj)
    return ((is_robot_a | is_robot_b) & ~involves_obj).astype(np.float32)


def _pickplace_residual(m: Model, task: Task, state: State,
                        info: StepInfo, ctrl: jax.Array) -> jax.Array:
    s = m.struct
    dtype = info.xpos.dtype
    hand = _hand_pos(m, info)
    obj = info.xpos[s.body_id("object")]
    reach = hand - obj

    tpos = task.mocap_pos[0]
    tquat = task.mocap_quat[0]
    brings = []
    for i, local in enumerate(_CORNERS):
        op = info.site_xpos[s.site_id(str(i))]
        tp = tpos + quat_rotate(tquat, jnp.asarray(local, dtype=dtype))
        brings.append(jnp.linalg.norm(op - tp))
    bring = jnp.stack(brings)

    mask = jnp.asarray(_careful_mask(m), dtype=dtype)
    careful = jnp.log10(1.0 + jnp.sum(mask * info.contact_force))

    away = jnp.minimum(0.0, hand[2] - 0.6)
    return jnp.concatenate([reach, bring, careful[None], away[None]])


def _pickplace_transition(task: Task, m: Model, state: State,
                          info: StepInfo) -> Task:
    res = _pickplace_residual(m, task, state, info, jnp.zeros(m.nu))
    bring_cost = norms.norm_value(res[3:11], NormType.SMOOTH_ABS,
                                  task.norm_params[1, 0],
                                  task.norm_params[1, 1])
    away_cost = norms.norm_value(res[12:13], NormType.SMOOTH_ABS,
                                 task.norm_params[3, 0],
                                 task.norm_params[3, 1])
    in_bring = task.mode == 0
    bring_done = jnp.logical_and(
        jnp.logical_and(in_bring, state.time > 0), bring_cost < 0.04)
    away_done = jnp.logical_and(~in_bring, away_cost < 0.01)

    w = task.weights
    w = jnp.where(bring_done, w.at[0].set(0.0).at[3].set(1.0), w)
    w = jnp.where(away_done, w.at[0].set(1.0).at[3].set(0.0), w)
    mode = jnp.where(bring_done, 1, jnp.where(away_done, 0, task.mode))

    tick = jnp.round(state.time * 1e3).astype(jnp.int32)
    key = jax.random.fold_in(jax.random.PRNGKey(13), tick)
    q = jax.random.normal(key, (4,), dtype=task.mocap_quat.dtype)
    q = q / jnp.linalg.norm(q)
    newq = jnp.where(away_done, q, task.mocap_quat[0])
    return dataclasses.replace(
        task, weights=w, mode=mode.astype(task.mode.dtype),
        mocap_quat=task.mocap_quat.at[0].set(newq))


_TERMS = (
    TermSpec("Reach", 3, NormType.L2, num_params=1),
    TermSpec("Bring", 8, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Careful", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Away", 1, NormType.SMOOTH_ABS, num_params=1),
)
_WEIGHTS = (1.0, 0.2, 0.2, 0.0)         # task_panda_bring.xml:106-109
_NORM_PARAMS = ((0.005, 0.0), (0.01, 0.0), (0.01, 0.0), (0.01, 0.0))


def pickplace_task(dtype=jnp.float32) -> Task:
    return make_task("PickAndPlace", _TERMS, _pickplace_residual,
                     _WEIGHTS, norm_params=_NORM_PARAMS,
                     mocap={"target": _TARGET_START},
                     transition_fn=_pickplace_transition,
                     mode_names=("bring", "away"), dtype=dtype)
