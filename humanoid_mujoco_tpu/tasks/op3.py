"""ROBOTIS OP3 stand/handstand task — the reference registry's "OP3"
entry (mjpc/tasks/op3/{stand.cc,task.xml,op3.xml.patch}, tasks.cc:62).

Model: the menagerie robotis_op3 as the task patches it — 18 actuated
hinge DOF (head joints removed), free root, explicit inertials, kp-21.1
position servos with +-5 N m force limits; tables transcribed by
tools/gen_op3_data.py. Mesh collision becomes the XML's own foot boxes
plus hand/head/torso sphere proxies (the reference's convex-mesh
geoms).

Residual (stand.cc:35-152), two modes (Stand | Handstand):
    Height  (1): head-feet (stand) or feet-hands (handstand) height
                 error vs Height Goal        [SmoothAbs(0.1), w 100]
    Balance (1): capture point (com + 0.05 com_vel) xy distance to the
                 support centroid            [SmoothAbs(0.1), w 50]
    CoM Vel (2): com xy velocity             [Quadratic,      w 10]
    CtrlDiff(18): ctrl - mode keyframe pose  [Quadratic,      w 0.25]
    Upright (13): support-surface z-axes vs +-z, torso up
                                             [L2(0.01),       w 5]
    JointVel(18): qvel[6:]                   [Quadratic,      w 1e-5]

Mode switch sets Height Goal to kModeHeight = {0.38, 0.57}
(stand.h:61, stand.cc:154-166).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import NormType
from ..physics.math import quat_rotate
from ..physics.model import (ActuatorType, JointType, Model, ModelBuilder,
                             State)
from ..physics.op3_data import (BODIES, FOOT_BOXES, JOINTS, KEYFRAMES,
                                SERVO, SITES)
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task

_FALL_TIME = 0.05            # capture-point horizon (stand.cc:74)
_MODE_HEIGHT = (0.38, 0.57)  # kModeHeight (stand.h:61)


def op3_model(dt: float = 0.005, max_contacts: int = 16,
              dtype=jnp.float32) -> Model:
    b = ModelBuilder(dt=dt)
    b.has_floor = True

    ids = {}
    for name, parent, pos, quat, mass, ipos, iquat, diag in BODIES:
        pid = -1 if parent is None else ids[parent]
        ids[name] = b.add_body(name, pid, pos=pos, quat=quat, mass=mass,
                               ipos=ipos, iquat=iquat, inertia=diag)
    b.add_joint("root", ids["body_link"], JointType.FREE)
    for name, body, axis, pos, rng, damping, armature in JOINTS:
        limited = rng != (0.0, 0.0)
        j = b.add_joint(name, ids[body], JointType.HINGE, axis=axis,
                        pos=pos, jrange=rng, limited=limited,
                        damping=damping, armature=armature)
        cr = SERVO["ctrlrange"]
        b.add_actuator(j, ActuatorType.POSITION, kp=SERVO["kp"],
                       ctrlrange=(-cr, cr),
                       forcerange=(-SERVO["forcerange"],
                                   SERVO["forcerange"]))
    for body, pos, size in FOOT_BOXES:
        b.add_box(ids[body], pos=pos, size=size, friction=1.0,
                  floor=True)
    for name, body, pos in SITES:
        b.add_site(name, ids[body], pos=pos)
    # sphere proxies for the non-foot supports the task needs: hands
    # (handstand), head + torso (getting up from the keyframe crouch),
    # knees/shoulders (rolling through)
    for sname, body, pos, r in (
            ("hand_l", "l_el_link", (-0.02, 0.14, 0.0), 0.02),
            ("hand_r", "r_el_link", (-0.02, -0.14, 0.0), 0.02),
            ("head_s", "head_tilt_link", (0.0, -0.02, 0.03), 0.045),
            ("torso_f", "body_link", (0.02, 0.0, 0.08), 0.05),
            ("torso_b", "body_link", (-0.03, 0.0, 0.08), 0.05),
            ("knee_l", "l_knee_link", (0.0, 0.0, -0.06), 0.025),
            ("knee_r", "r_knee_link", (0.0, 0.0, -0.06), 0.025)):
        b.add_sphere(ids[body], pos=pos, radius=r, friction=1.0)
    b.max_contacts = max_contacts
    return b.finalize(dtype=dtype)


def op3_home_qpos(m: Model, key: str = "home") -> jax.Array:
    return jnp.asarray(np.asarray(KEYFRAMES[key]), dtype=m.dt.dtype)


def _site_zaxis(info: StepInfo, m: Model, site: str) -> jax.Array:
    """framezaxis sensor analog: world z-axis of the site's body frame
    (sites share their body frame orientation)."""
    s = m.struct
    bid = s.site_body[s.site_id(site)]
    q = info.xquat[bid]
    return quat_rotate(q, jnp.asarray([0.0, 0.0, 1.0], dtype=q.dtype))


def _site_yaxis(info: StepInfo, m: Model, site: str) -> jax.Array:
    s = m.struct
    bid = s.site_body[s.site_id(site)]
    q = info.xquat[bid]
    return quat_rotate(q, jnp.asarray([0.0, 1.0, 0.0], dtype=q.dtype))


def _op3_residual(m: Model, task: Task, state: State, info: StepInfo,
                  ctrl: jax.Array) -> jax.Array:
    s = m.struct
    dtype = info.xpos.dtype
    sp = info.site_xpos
    head = sp[s.site_id("head")]
    lf = sp[s.site_id("left_foot")]
    rf = sp[s.site_id("right_foot")]
    lh = sp[s.site_id("left_hand")]
    rh = sp[s.site_id("right_hand")]
    com = info.com
    com_vel = info.com_vel
    handstand = task.mode == 1

    # Height (stand.cc:58-70; the handstand branch's hand term is
    # l_hand - r_hand, kept verbatim)
    h_stand = head[2] - 0.5 * (lf[2] + rf[2])
    h_hand = 0.5 * (lf[2] + rf[2]) - 0.5 * (lh[2] - rh[2])
    height = jnp.where(handstand, h_hand, h_stand) - task.params[0]

    # Balance: capture point vs support centroid (stand.cc:72-91)
    cap = com[:2] + _FALL_TIME * com_vel[:2]
    support = jnp.where(handstand, 0.5 * (lh[:2] + rh[:2]),
                        0.5 * (lf[:2] + rf[:2]))
    balance = jnp.linalg.norm(support - cap)

    com_v = com_vel[:2]

    key_home = jnp.asarray(np.asarray(KEYFRAMES["home"])[7:],
                           dtype=dtype)
    key_hand = jnp.asarray(np.asarray(KEYFRAMES["handstand"])[7:],
                           dtype=dtype)
    ctrl_diff = ctrl - jnp.where(handstand, key_hand, key_home)

    z = jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)
    frz = _site_zaxis(info, m, "right_foot")
    flz = _site_zaxis(info, m, "left_foot")
    tz = _site_zaxis(info, m, "torso")
    hry = _site_yaxis(info, m, "right_hand")
    hly = _site_yaxis(info, m, "left_hand")
    up_stand = jnp.concatenate([
        0.1 * (frz - z), 0.1 * (flz - z), (tz[2] - 1.0)[None],
        jnp.zeros(6, dtype=dtype)])
    up_hand = jnp.concatenate([
        0.1 * (hry - z), 0.1 * (hly + z), 0.1 * (frz + z),
        0.1 * (flz + z), (tz[2] + 1.0)[None]])
    upright = jnp.where(handstand, up_hand, up_stand)

    jvel = state.qvel[6:]
    return jnp.concatenate([height[None], balance[None], com_v,
                            ctrl_diff, upright, jvel])


def _op3_transition(task: Task, m: Model, state: State,
                    info: StepInfo) -> Task:
    """Mode -> Height Goal hand-off (stand.cc:154-166)."""
    goal = jnp.where(task.mode == 1, _MODE_HEIGHT[1], _MODE_HEIGHT[0])
    return dataclasses.replace(task,
                               params=task.params.at[0].set(goal))


_TERMS = (
    TermSpec("Height", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Balance", 1, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("CoM Vel.", 2, NormType.QUADRATIC),
    TermSpec("Ctrl Diff", 18, NormType.QUADRATIC),
    TermSpec("Upright", 13, NormType.L2, num_params=1),
    TermSpec("Joint Vel", 18, NormType.QUADRATIC),
)
_WEIGHTS = (100.0, 50.0, 10.0, 0.25, 5.0, 1.0e-5)   # task.xml:22-27
_NORM_PARAMS = ((0.1, 0.0), (0.1, 0.0), (0.0, 0.0), (0.0, 0.0),
                (0.01, 0.0), (0.0, 0.0))


def op3_task(dtype=jnp.float32) -> Task:
    return make_task("OP3", _TERMS, _op3_residual, _WEIGHTS,
                     norm_params=_NORM_PARAMS,
                     params=(_MODE_HEIGHT[0],),
                     param_names=("Height Goal",),
                     transition_fn=_op3_transition,
                     mode_names=("Stand", "Handstand"), dtype=dtype)
