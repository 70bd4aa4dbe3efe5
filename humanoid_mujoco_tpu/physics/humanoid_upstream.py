"""The upstream MJPC humanoid (dm_control-derived, 21 actuated DOF).

TPU-native rebuild of the model behind the reference's Humanoid
Stand/Walk/Tracking/Interact tasks
(/root/reference/mujoco_mpc/mjpc/tasks/humanoid/humanoid.xml.patch — the
patch carries the complete modified model: capsule limbs + sphere
head/hands, 21 hinge joints with per-class damping/stiffness/armature,
motor actuators with the MJPC gear set, and the hamstring fixed-tendon
limits).

Numeric tables live in `humanoid21_data.py`, recorded from ONE MuJoCo
compile of that spec (MJCF computes body inertials from geom density
1000; the tables pin exactly those values so this builder needs no
MuJoCo at runtime). Collision: the real geometry is already
primitive-based — capsules and spheres map 1:1 onto our narrowphase (no
proxy clouds needed, unlike the 12-DOF robot in `humanoid.py`).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import humanoid21_data as D
from .model import ActuatorType, Model, ModelBuilder

# Torso height at the declared (standing) pose; the Walk task's height
# goal is 1.35 and Stand's is 1.5 (task.xml residual_Torso numerics).
STAND_HEIGHT = 1.282


def build_humanoid21(dtype=jnp.float32, dt: float = 0.002,
                     max_contacts: int = 16, extend=None) -> Model:
    """Build the 21-DOF humanoid. `max_contacts` caps the contact slots
    entering the Newton solve (top-k most penetrating of the 35 static
    floor slots); standing uses ~8, so 16 is exact in normal operation
    while halving constraint rows.

    `extend(builder, body_ids)` runs before finalize — scene tasks
    (humanoid/interact) attach furniture and extra contact pairs."""
    b = ModelBuilder(dt=dt)
    b.hfield_shape = (2, 2)
    b.hfield_halfsize = (50.0, 50.0)
    b.max_contacts = max_contacts
    # class "body" geom contact params (humanoid.xml.patch):
    # solimp ".9 .99 .003" solref ".015 1"
    b.solref = (0.015, 1.0)
    b.solimp = (0.9, 0.99, 0.003)
    b.limit_solimp = (0.0, 0.99, 0.01)   # joint solimplimit "0 .99 .01"

    body_ids = {}
    for spec in D.BODIES:
        body_ids[spec["name"]] = b.add_body(
            spec["name"], spec["parent"], pos=spec["pos"],
            quat=spec["quat"], mass=spec["mass"], ipos=spec["ipos"],
            iquat=spec["iquat"], inertia=spec["inertia"])

    joint_ids = {}
    for spec in D.JOINTS:
        joint_ids[spec["name"]] = b.add_joint(
            spec["name"], spec["body"], spec["jtype"], axis=spec["axis"],
            pos=spec["pos"], jrange=spec["jrange"],
            limited=spec["limited"], damping=spec["damping"],
            armature=spec["armature"], stiffness=spec["stiffness"])

    for g in D.GEOMS:
        if g["kind"] == "capsule":
            b.add_capsule(g["body"], p0=g["p0"], p1=g["p1"],
                          radius=g["radius"], friction=g["friction"])
        else:
            b.add_sphere(g["body"], pos=g["pos"], radius=g["radius"],
                         friction=g["friction"])

    for s in D.SITES:
        b.add_site(s["name"], s["body"], pos=s["pos"])

    for a in D.ACTUATORS:
        b.add_actuator(joint_ids[a["joint"]], ActuatorType.MOTOR,
                       gear=a["gear"], ctrlrange=(-1.0, 1.0),
                       forcerange=(-1e9, 1e9))

    for t in D.TENDONS:
        b.add_tendon_limit([joint_ids[j] for j in t["joints"]],
                           t["coefs"], t["range"])

    if extend is not None:
        extend(b, body_ids)
    return b.finalize(dtype=dtype)


def stand_qpos(m: Model) -> jnp.ndarray:
    """The standing keyframe = the declared pose (MuJoCo qpos0)."""
    from .model import default_qpos
    return default_qpos(m)
