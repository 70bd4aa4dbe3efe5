"""Humanoid Interact — the reference registry's scene-interaction task
(mjpc/tasks/humanoid/interact/{interact.cc,contact_keyframe.cc,
task.xml}, tasks.cc:57).

The 21-DOF humanoid interacts with furniture (the task.xml ships six
scenes and enables the armchair; its five boxes are rebuilt verbatim).
The reference's GUI lets the user author "contact keyframes": up to 5
(body, body, local point, local point) pairs the humanoid should bring
together (sit: pelvis -> seat). Here the keyframe is task state: the
pair table lives in `params` leaves (body indices + local points +
per-pair active flags), so SetTaskParameters/SetAnything edit it at
runtime exactly like the GUI — retrace-free.

Residual (interact.cc:28-160, task.xml:41-53), 68-D:
    Torso/Pelvis/RFoot/LFoot Up (1 each): |up_z - 1|  [SmoothAbs(0.1)]
    Head/Torso Height (1 each): |z - param|           [SmoothAbs(0.1)]
    Knee Feet XY / COM Feet XY (1 each)               [SmoothAbs(0.1)]
    Facing Dir (1): torso-forward vs target direction [SmoothAbs(0.1)]
    CoM Vel. (2), Joint Vel. (21)                     [Quadratic]
    Control (21)                                      [Cosh(0.05)]
    Contact (15): per-pair |p1 - p2| xyz (5 pairs)    [SmoothAbs(0.1)]
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import NormType
from ..physics.humanoid_upstream import build_humanoid21, stand_qpos
from ..physics.math import quat_rotate
from ..physics.model import Model, State
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task

N_CONTACT_PAIRS = 5       # kNumberOfContactPairsInteract

# armchair scene (interact/scenes/armchair.xml): (pos, quat, size)
_CHAIR_POS = (-0.35, 0.0, 0.2)
_CHAIR_BOXES = (
    ((0.0, 0.0, 0.12), (1, 0, 0, 0), (0.25, 0.35, 0.05)),      # seat
    ((-0.12, 0.0, -0.05), (1, 0, 0, 0), (0.30, 0.35, 0.15)),   # base
    ((-0.35, 0.0, 0.35), (0.984, 0, -0.178, 0), (0.05, 0.35, 0.3)),
    ((-0.12, 0.37, 0.1), (1, 0, 0, 0), (0.3, 0.05, 0.3)),
    ((-0.12, -0.37, 0.1), (1, 0, 0, 0), (0.3, 0.05, 0.3)),
)


def interact_model(dt: float = 0.005, max_contacts: int = 24,
                   dtype=jnp.float32) -> Model:
    """h21 + the armchair (fixed body); the humanoid's capsules/spheres
    gain narrowphase pairs against the seat/base/back boxes."""

    def extend(b, body_ids):
        chair = b.add_body("chair", -1, pos=_CHAIR_POS, mass=35.0,
                           inertia=(1.0, 1.0, 1.0))
        boxes = [b.add_box(chair, pos=p, quat=q, size=s, friction=1.0,
                           floor=False)
                 for p, q, s in _CHAIR_BOXES[:3]]   # seat/base/back
        for i, cap in enumerate(b._caps):
            for bx in boxes:
                b.add_pair_cb(i, bx)
        for i, sph in enumerate(b._sphs):
            for bx in boxes:
                b.add_pair_sb(i, bx)

    return build_humanoid21(dtype=dtype, dt=dt,
                            max_contacts=max_contacts, extend=extend)


def interact_home_qpos(m: Model) -> jax.Array:
    return stand_qpos(m)


# params layout: [head_h, torso_h, facing_x, facing_y, facing_on,
#                 then per pair i: (active, body1, body2,
#                                   p1x, p1y, p1z, p2x, p2y, p2z)]
_PAIR_STRIDE = 9
_PAIR_OFF = 5


def _param_names():
    names = ["Head Height", "Torso Height", "Facing X", "Facing Y",
             "Facing On"]
    for i in range(N_CONTACT_PAIRS):
        names += [f"P{i} Active", f"P{i} Body1", f"P{i} Body2",
                  f"P{i} X1", f"P{i} Y1", f"P{i} Z1",
                  f"P{i} X2", f"P{i} Y2", f"P{i} Z2"]
    return tuple(names)


def _interact_residual(m: Model, task: Task, state: State,
                       info: StepInfo, ctrl: jax.Array) -> jax.Array:
    s = m.struct
    dtype = info.xpos.dtype
    p = task.params

    def up_z(body_name):
        q = info.xquat[s.body_id(body_name)]
        return quat_rotate(q, jnp.asarray([0.0, 0.0, 1.0],
                                          dtype=dtype))[2]

    ups = jnp.stack([jnp.abs(up_z("torso") - 1.0),
                     jnp.abs(up_z("pelvis") - 1.0),
                     jnp.abs(up_z("foot_right") - 1.0),
                     jnp.abs(up_z("foot_left") - 1.0)])

    head = info.site_xpos[s.site_id("tracking[head]")]
    torso = info.xpos[s.body_id("torso")]
    head_h = jnp.abs(head[2] - p[0])
    torso_h = jnp.abs(torso[2] - p[1])

    fr = info.site_xpos[s.site_id("foot_right")][:2]
    fl = info.site_xpos[s.site_id("foot_left")][:2]
    kr = info.site_xpos[s.site_id("tracking[rknee]")][:2]
    kl = info.site_xpos[s.site_id("tracking[lknee]")][:2]
    feet = 0.5 * (fr + fl)
    knees = 0.5 * (kr + kl)
    knee_feet = jnp.linalg.norm(knees - feet)
    com_feet = jnp.linalg.norm(info.com[:2] - feet)

    fwd = quat_rotate(info.xquat[s.body_id("torso")],
                      jnp.asarray([1.0, 0.0, 0.0], dtype=dtype))[:2]
    tgt = p[2:4] - torso[:2]
    tgt = tgt / jnp.maximum(jnp.linalg.norm(tgt), 1e-9)
    facing = jnp.linalg.norm(tgt - fwd) * p[4]

    com_vel = info.com_vel[:2]
    jvel = state.qvel[6:]

    # contact pairs: body indices are runtime leaves -> gather
    contacts = []
    for i in range(N_CONTACT_PAIRS):
        o = _PAIR_OFF + i * _PAIR_STRIDE
        active = p[o]
        b1 = p[o + 1].astype(jnp.int32)
        b2 = p[o + 2].astype(jnp.int32)
        lp1 = p[o + 3:o + 6]
        lp2 = p[o + 6:o + 9]
        w1 = (jnp.take(info.xpos, b1, axis=0)
              + quat_rotate(jnp.take(info.xquat, b1, axis=0), lp1))
        w2 = (jnp.take(info.xpos, b2, axis=0)
              + quat_rotate(jnp.take(info.xquat, b2, axis=0), lp2))
        contacts.append(jnp.abs(w1 - w2) * active)
    contact = jnp.concatenate(contacts)

    return jnp.concatenate([
        ups, head_h[None], torso_h[None], knee_feet[None],
        com_feet[None], facing[None], com_vel, jvel, ctrl, contact])


_TERMS = (
    TermSpec("Torso Up", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Pelvis Up", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("RFoot Up", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("LFoot Up", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Head Height", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Torso Height", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Knee Feet XY", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("COM Feet XY", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Facing Dir", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("CoM Vel.", 2, NormType.QUADRATIC),
    TermSpec("Joint Vel.", 21, NormType.QUADRATIC),
    TermSpec("Control", 21, NormType.COSH, num_params=1),
    TermSpec("Contact", 15, NormType.SMOOTH_ABS, num_params=1),
)
# task.xml:41-53
_WEIGHTS = (10.0, 10.0, 5.0, 5.0, 0.0, 20.0, 30.0, 0.0, 0.0, 10.0,
            0.01, 0.8, 100.0)
_NORM_PARAMS = tuple(
    [(0.1, 0.0)] * 9 + [(0.0, 0.0), (0.0, 0.0), (0.05, 0.0),
                        (0.1, 0.0)])


def interact_task(dtype=jnp.float32) -> Task:
    params = np.zeros(_PAIR_OFF + N_CONTACT_PAIRS * _PAIR_STRIDE)
    params[0] = 1.4          # residual_Head Height default
    params[1] = 1.3          # residual_Torso Height default
    return make_task("Humanoid Interact", _TERMS, _interact_residual,
                     _WEIGHTS, norm_params=_NORM_PARAMS,
                     params=tuple(params),
                     param_names=_param_names(), dtype=dtype)


def set_contact_pair(task: Task, i: int, body1: int, body2: int,
                     local1, local2) -> Task:
    """Author one contact-keyframe pair (the GUI selection flow,
    contact_keyframe.cc) — e.g. pelvis onto the chair seat."""
    o = _PAIR_OFF + i * _PAIR_STRIDE
    vals = jnp.asarray(
        [1.0, float(body1), float(body2), *np.asarray(local1, float),
         *np.asarray(local2, float)], dtype=task.params.dtype)
    return dataclasses.replace(
        task, params=task.params.at[o:o + _PAIR_STRIDE].set(vals))
