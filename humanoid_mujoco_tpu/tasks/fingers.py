"""FreeFingers task — the reference registry's "Fingers" entry
(mjpc/tasks/fingers/{fingers.cc,task.xml}, tasks.cc:55).

Model: two free-floating sphere fingers (3 slide DOF each, gravity-
compensated) manipulate a thin free box (half-size 0.05 x 0.01 x 0.1,
0.2 kg) on the floor toward a goal pose. The reference actuates the
fingers with Cartesian `intvelocity` site servos (integrating velocity
command, kp 1000); this build substitutes position servos on the slide
joints with the same kp and the intvelocity ACTRANGE as the position
ctrlrange — the same reachable workspace under a first-order servo,
without actuator state. The reference's inert free `target` body
becomes the task's goal mocap (pos + quat), which is what its
orientation-site sensors reduce to.

Residual (fingers.cc:31-57):
    Reach  (6): finger_a - object, finger_b - object  [L2(0.02), w .35]
    Bring  (3): |site_i(object) - site_i(target)| for the three
                orientation sites (0.12,0,0)/(0,0.08,0)/(0,0,0.08)
                                            [SmoothAbs(0.05), w 1]
    Control(6): commanded displacement (ctrl - finger qpos — the
                velocity-command analog)    [SmoothAbs(0.01), w .05]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import NormType
from ..physics.math import quat_rotate
from ..physics.model import (ActuatorType, JointType, Model, ModelBuilder,
                             State)
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task

_SITES = ((0.12, 0.0, 0.0), (0.0, 0.08, 0.0), (0.0, 0.0, 0.08))
_OBJ_SIZE = (0.05, 0.01, 0.1)
_TARGET_POS = (0.0, 0.0, 0.12)
_TARGET_QUAT = (0.7071068, 0.0, 0.7071068, 0.0)   # keyframe "1 0 1 0"


def fingers_model(dt: float = 0.005, dtype=jnp.float32) -> Model:
    b = ModelBuilder(dt=dt)
    b.has_floor = True

    obj = b.add_body("object", -1, pos=(0.0, 0.0, 0.3), mass=0.2,
                     # box inertia m/12*(b^2+c^2) etc for half-sizes
                     inertia=(0.2 / 12 * 4 * (0.01 ** 2 + 0.1 ** 2),
                              0.2 / 12 * 4 * (0.05 ** 2 + 0.1 ** 2),
                              0.2 / 12 * 4 * (0.05 ** 2 + 0.01 ** 2)))
    b.add_joint("object_free", obj, JointType.FREE)
    box = b.add_box(obj, size=_OBJ_SIZE, friction=0.2, floor=True)
    for i, pos in enumerate(_SITES):
        b.add_site(str(i), obj, pos=pos)

    for name, y0 in (("finger_a", 0.1), ("finger_b", -0.1)):
        fb = b.add_body(name, -1, pos=(0.0, y0, 0.3), mass=0.034,
                        inertia=(5.4e-06, 5.4e-06, 5.4e-06),
                        gravcomp=1.0)
        for ax, (axis, rng) in enumerate(
                ((((1, 0, 0)), (-1.0, 1.0)),
                 (((0, 1, 0)), (-1.0, 1.0)),
                 (((0, 0, 1)), (0.0, 1.4)))):
            j = b.add_joint(f"{name}_{'xyz'[ax]}", fb, JointType.SLIDE,
                            axis=axis, jrange=rng, limited=True,
                            damping=2.0)
            b.add_actuator(j, ActuatorType.POSITION, kp=1000.0, kv=30.0,
                           ctrlrange=rng, forcerange=(-60.0, 60.0))
        b.add_site(name, fb)
        sph = b.add_sphere(fb, radius=0.02, friction=0.2)
        b.add_pair_sb(sph, box)
    return b.finalize(dtype=dtype)


def fingers_home_qpos(m: Model) -> jax.Array:
    """Object lying flat (long axis along +x, rest height 0.05);
    fingers at their body spawn poses (0, +-0.1, 0.3) — the keyframe
    after the object's drop settles."""
    q = np.zeros(m.nq)
    q[0:3] = (0.0, 0.0, 0.05)
    q[3:7] = _TARGET_QUAT
    # finger slide offsets are zero: bodies spawn at the keyframe pose
    return jnp.asarray(q, dtype=m.dt.dtype)


def _fingers_residual(m: Model, task: Task, state: State, info: StepInfo,
                      ctrl: jax.Array) -> jax.Array:
    s = m.struct
    obj = info.xpos[s.body_id("object")]
    fa = info.site_xpos[s.site_id("finger_a")]
    fb = info.site_xpos[s.site_id("finger_b")]
    reach = jnp.concatenate([fa - obj, fb - obj])

    tpos = task.mocap_pos[0]
    tquat = task.mocap_quat[0]
    brings = []
    for i, local in enumerate(_SITES):
        op = info.site_xpos[s.site_id(str(i))]
        tp = tpos + quat_rotate(tquat, jnp.asarray(local,
                                                   dtype=op.dtype))
        brings.append(jnp.linalg.norm(op - tp))
    bring = jnp.stack(brings)

    # control effort: commanded displacement from the current finger
    # configuration (intvelocity-ctrl analog, fingers.cc:52-55)
    qf = jnp.concatenate([state.qpos[7:10], state.qpos[10:13]])
    control = ctrl - qf
    return jnp.concatenate([reach, bring, control])


_TERMS = (
    TermSpec("Reach", 6, NormType.L2, num_params=1),
    TermSpec("Bring", 3, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Control", 6, NormType.SMOOTH_ABS, num_params=1),
)
_WEIGHTS = (0.35, 1.0, 0.05)                  # task.xml:102-104
_NORM_PARAMS = ((0.02, 0.0), (0.05, 0.0), (0.01, 0.0))


def fingers_task(dtype=jnp.float32) -> Task:
    return make_task("FreeFingers", _TERMS, _fingers_residual, _WEIGHTS,
                     norm_params=_NORM_PARAMS,
                     mocap={"target": (_TARGET_POS, _TARGET_QUAT)},
                     dtype=dtype)
