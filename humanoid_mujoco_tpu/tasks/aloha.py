"""ALOHA "Bimanual Handover" — the reference's own TPU showcase task
(mjpc/tasks/bimanual/handover/{handover.cc,task.xml}, registered at
tasks/tasks.cc; the MJX predictive-sampling demo plans on this model,
python/mujoco_mpc/mjx/visualize.py:29-43 with nsample=8191 horizon=128).

Model: two Interbotix ViperX-300s arms facing each other across a table
plane, a free cube between them, and a mocap target. Kinematics, masses,
full inertial blocks, joint ranges / damping / armature, actuator kp and
force ranges are transcribed from the task's MJX model
(build/mjpc/tasks/bimanual/mjx_aloha.xml); mesh collision becomes the
same primitive set that model's `primitive_collision`/`sphere_collision`
classes already use — finger capsules + 3 grasp-point spheres per finger
— paired against the cube, plus the cube / gripper capsules against the
table plane (the MJX scene's table is an infinite collision plane at
z~0, mjx_scene.xml `<geom name="table" type="plane">`; here it is the
model floor).

Two deliberate departures from the reference model, noted for parity
review: (1) actuation is joint-space position servos with the XML's kp
per joint class (the reference's MJX variant uses Cartesian site servos
with exact-filter dynamics, mjx_filtered_cartesian_actuators.xml — a
different transmission for the same 14-DOF arms); (2) each gripper's two
finger slides get their own servo instead of an equality-coupled pair
(nu = 16 vs 14) — MuJoCo joint-equality coupling is replaced by the
planner simply commanding both fingers.

Residual (handover.cc:34-130):
    Reach L (3): cube pos in the left gripper-site frame, y/z doubled
                 so the gripper orients its x-axis at the cube
    Reach R (3): same for the right gripper          [L2(0.01), w 0.1]
    Grasp   (1): geometric mean of per-hand "finger contact normals
                 oppose each other" scores; 1 when not grasping
                                                     [Null,     w 0.05]
    Bring   (3): cube - mocap target                 [L2(0.003), w 0.4]

The grasp term re-derives the reference's contact scan (handover.cc:
57-120) as a pure function: each finger's grasp-sphere normals are
recomputed from geometry with the XML's 0.02 activation margin (the
reference's `grasp` geom class margin/gap), giving the identical score
branch-free under vmap.

Transition (handover.cc:133-155): target respawns across the table at a
random pose once the cube is brought within 1 cm.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import NormType
from ..physics.math import quat_rotate, quat_rotate_inv, quat_to_mat
from ..physics.model import ActuatorType, JointType, Model, ModelBuilder
from ..physics.model import State
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task

_CUBE_HALF = 0.015                     # task.xml cube size
_CUBE_START = (0.0, 0.0, _CUBE_HALF + 0.0008)
_TARGET_START = (0.4, -0.25, 0.3)      # keyframe mpos
_GRASP_MARGIN = 0.02                   # grasp-sphere margin/gap (task.xml)

# (name, pos, quat, mass, ipos, iquat, diaginertia) fixed/jointed chain
# transcribed from mjx_aloha.xml; joint spec per joint-class defaults.
_Q2 = 0.7071067811865476


def _euler_xyz(ex, ey, ez):
    """MJCF euler (default eulerseq xyz, intrinsic) -> quat wxyz."""

    def q_axis(axis, a):
        h = 0.5 * a
        q = np.zeros(4)
        q[0] = np.cos(h)
        q[1 + axis] = np.sin(h)
        return q

    def mul(a, b):
        w1, x1, y1, z1 = a
        w2, x2, y2, z2 = b
        return np.array([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])

    q = mul(mul(q_axis(0, ex), q_axis(1, ey)), q_axis(2, ez))
    return tuple(q / np.linalg.norm(q))


# joint class: (axis, range, damping, armature, frcrange, kp)
_JOINT_CLASS = {
    "waist": ((0, 0, 1), (-3.14158, 3.14158), 5.76, 0.0, 35.0, 43.0),
    "shoulder": ((0, 1, 0), (-1.85005, 1.25664), 20.0, 0.395, 144.0, 265.0),
    "elbow": ((0, 1, 0), (-1.76278, 1.6057), 18.49, 0.383, 59.0, 227.0),
    "forearm_roll": ((1, 0, 0), (-3.14158, 3.14158), 6.78, 0.14, 22.0, 78.0),
    "wrist_angle": ((0, 1, 0), (-1.8675, 2.23402), 6.28, 0.008, 35.0, 37.0),
    "wrist_rotate": ((1, 0, 0), (-3.14158, 3.14158), 1.2, 0.0, 35.0, 10.4),
}

# arm link chain: (name, pos, quat, joint_class, mass, ipos, iquat, diag)
_ARM_LINKS = (
    ("shoulder_link", (0, 0, 0.079), (1, 0, 0, 0), "waist", 0.798614,
     (0.000259233, -3.3552e-06, 0.0116129),
     (-0.476119, 0.476083, 0.52279, 0.522826),
     (0.00120156, 0.00113744, 0.0009388)),
    ("upper_arm_link", (0, 0, 0.04805), (1, 0, 0, 0), "shoulder", 0.792592,
     (0.0206949, 4e-10, 0.226459), (0, 0.0728458, 0, 0.997343),
     (0.00911338, 0.008925, 0.000759317)),
    ("upper_forearm_link", (0.05955, 0, 0.3), (1, 0, 0, 0), "elbow",
     0.322228, (0.105723, 0, 0),
     (-0.000621631, 0.704724, 0.0105292, 0.709403),
     (0.00144107, 0.00134228, 0.000152047)),
    ("lower_forearm_link", (0.2, 0, 0), (1, 0, 0, 0), "forearm_roll",
     0.414823, (0.0513477, 0.00680462, 0),
     (-0.702604, -0.0796724, -0.702604, 0.0796724),
     (0.0005911, 0.000546493, 0.000155707)),
    ("wrist_link", (0.1, 0, 0), (1, 0, 0, 0), "wrist_angle", 0.115395,
     (0.046743, -7.6652e-06, 0.010565),
     (-0.00100191, 0.544586, 0.0026583, 0.8387),
     (5.45707e-05, 4.63101e-05, 4.32692e-05)),
    ("gripper_link", (0.069744, 0, 0), (1, 0, 0, 0), "wrist_rotate",
     0.251652, (0.0395662, -2.56311e-07, 0.00400649),
     (0.62033, 0.619916, -0.339682, 0.339869),
     (0.000689546, 0.000650316, 0.000468142)),
)

# grasp-point spheres in the finger-link frame (mjx_aloha.xml g0/g1/g2);
# ysign=-1 for the left finger of each gripper, +1 for the right.
_GRASP_PTS = ((0.013, 0.0892, 0.0268), (0.0222, 0.0892, 0.0268),
              (0.0182, 0.0845, 0.0266))
# the two primitive-collision capsules per finger: (p0, p1, radius)
_FINGER_CAPS = (((-0.01, 0.0192, 0.015), (0.015, 0.0852, 0.0228), 0.005),
                ((0.035, 0.0192, 0.015), (0.02, 0.0852, 0.0228), 0.005))

_HOME_ARM = (0.0, -0.96, 1.16, 0.0, -0.3, 0.0, 0.01, 0.01)


def _build_arm(b: ModelBuilder, side: str, base_pos, base_quat,
               cube_sphere_pairs, cube_cap_pairs):
    base = b.add_body(f"{side}/base_link", -1, pos=base_pos, quat=base_quat,
                      mass=0.969034,
                      ipos=(-0.0534774, -0.000562575, 0.0205961),
                      iquat=(-0.00292324, 0.712517, 0.00480387, 0.701633),
                      inertia=(0.0071633, 0.00602451, 0.00169819))
    parent = base
    for name, pos, quat, jcls, mass, ipos, iquat, diag in _ARM_LINKS:
        axis, rng, damp, arm, frc, kp = _JOINT_CLASS[jcls]
        body = b.add_body(f"{side}/{name}", parent, pos=pos, quat=quat,
                          mass=mass, ipos=ipos, iquat=iquat, inertia=diag)
        j = b.add_joint(f"{side}/{jcls}", body, JointType.HINGE, axis=axis,
                        jrange=rng, limited=True, damping=damp,
                        armature=arm)
        b.add_actuator(j, ActuatorType.POSITION, kp=kp,
                       ctrlrange=rng, forcerange=(-frc, frc))
        parent = body

    gripper_link = parent
    b.add_site(f"{side}/gripper", gripper_link, pos=(0.15, 0, 0))

    gbase = b.add_body(f"{side}/gripper_base", gripper_link,
                       pos=(0.035, 0, 0), quat=_euler_xyz(0, 1.57, -1.57),
                       mass=0.42158,
                       ipos=(0.000182154, -0.0341589, -0.0106026),
                       iquat=(0.435286, 0.557074, -0.551539, 0.442718),
                       inertia=(0.00110438, 0.000790537, 0.000469727))
    palm = b.add_capsule(gbase, p0=(0.055, 0, 0.015), p1=(-0.055, 0, 0.015),
                         radius=0.03, friction=1.0)
    cube_cap_pairs.append(palm)

    for fname, ysign, fpos, fquat, ipos, iquat in (
            ("left_finger_link", -1.0, (0.0191, -0.0141637, 0.0211727),
             (0.5, -0.5, -0.5, 0.5), (0.0143478, -0.0284791, 0.0122897),
             (0.535486, 0.458766, -0.450407, 0.547651)),
            ("right_finger_link", 1.0, (-0.0191, -0.0141637, 0.0211727),
             (0.5, 0.5, 0.5, 0.5), (0.0143711, 0.0284792, 0.0121421),
             (0.461317, 0.537615, -0.545478, 0.447894))):
        fb = b.add_body(f"{side}/{fname}", gbase, pos=fpos, quat=fquat,
                        mass=0.0862937, ipos=ipos, iquat=iquat,
                        inertia=(5.86848e-05, 4.46887e-05, 1.8397e-05))
        j = b.add_joint(f"{side}/{fname[:-5]}", fb, JointType.SLIDE,
                        axis=(0, 0, -1), jrange=(0.0, 0.041), limited=True,
                        damping=10.1, armature=0.243)
        b.add_actuator(j, ActuatorType.POSITION, kp=365.0,
                       ctrlrange=(0.002, 0.037), forcerange=(-35.0, 35.0))
        for gx, gy, gz in _GRASP_PTS:
            cube_sphere_pairs.append(
                b.add_sphere(fb, pos=(gx, ysign * gy, gz), radius=0.006,
                             friction=1.0))
        for p0, p1, r in _FINGER_CAPS:
            cap = b.add_capsule(
                fb, p0=(p0[0], ysign * p0[1], p0[2]),
                p1=(p1[0], ysign * p1[1], p1[2]), radius=r, friction=1.0,
                floor=False)
            cube_cap_pairs.append(cap)


def aloha_model(dt: float = 0.01, max_contacts: int = 16,
                dtype=jnp.float32) -> Model:
    """Dual ViperX-300s + free cube on a table plane (mjx_scene.xml).

    `max_contacts` caps the solver's active set via top-k selection
    (the MJX scene's own `max_contact_points=8` numeric is the same
    idea; 16 covers cube-on-table + a two-finger grasp per hand)."""
    b = ModelBuilder(dt=dt)
    b.has_floor = True
    b.floor_z = 0.0
    b.sol_iter = 6                      # mjx_scene.xml option iterations=6
    b.max_contacts = max_contacts

    sphs: list[int] = []
    caps: list[int] = []
    _build_arm(b, "left", (-0.469, -0.019, 0.02), (1, 0, 0, 0), sphs, caps)
    _build_arm(b, "right", (0.469, -0.019, 0.02), (0, 0, 0, 1), sphs, caps)

    cube = b.add_body("box", -1, pos=_CUBE_START,
                      mass=0.027,
                      inertia=(4.05e-06, 4.05e-06, 4.05e-06))
    b.add_joint("box_free", cube, JointType.FREE)
    cb = b.add_box(cube, size=(_CUBE_HALF,) * 3, friction=1.0, floor=True)
    for s in sphs:
        b.add_pair_sb(s, cb)
    for c in caps:
        b.add_pair_cb(c, cb)
    return b.finalize(dtype=dtype)


def aloha_home_qpos(m: Model) -> jax.Array:
    q = np.zeros(m.nq)
    q[0:8] = _HOME_ARM
    q[8:16] = _HOME_ARM
    q[16:19] = _CUBE_START
    q[19] = 1.0
    return jnp.asarray(q, dtype=m.dt.dtype)


def home_ctrl(m: Model) -> jax.Array:
    c = np.zeros(m.nu)
    c[0:6] = _HOME_ARM[:6]
    c[6:8] = max(0.01, 0.002)
    c[8:14] = _HOME_ARM[:6]
    c[14:16] = max(0.01, 0.002)
    return jnp.asarray(np.clip(c, -3.2, 3.2), dtype=m.dt.dtype)


def _finger_grasp_normal(info: StepInfo, fb: int, ysign, box_c, box_R,
                         dtype, half_xyz=None):
    """Summed activated grasp-sphere normals (finger -> box) and an
    any-active flag for one finger — the handover.cc:78-99 contact scan
    as closed-form geometry with the 0.02 m activation margin."""
    fq = info.xquat[fb]
    fp = info.xpos[fb]
    total = jnp.zeros(3, dtype=dtype)
    any_active = jnp.asarray(False)
    half = jnp.asarray(half_xyz if half_xyz is not None
                       else [_CUBE_HALF] * 3, dtype=dtype)
    for gx, gy, gz in _GRASP_PTS:
        local = jnp.asarray([gx, ysign * gy, gz], dtype=dtype)
        center = fp + quat_rotate(fq, local)
        # closest point on the cube to the sphere center
        lb = box_R.T @ (center - box_c)
        clamped = jnp.clip(lb, -half, half)
        closest = box_c + box_R @ clamped
        d = closest - center
        dn = jnp.linalg.norm(d)
        gap = dn - 0.006
        active = gap < _GRASP_MARGIN
        inside = dn < 1e-6
        fallback = box_c - center
        direction = jnp.where(inside, fallback, d)
        direction = direction / jnp.maximum(
            jnp.linalg.norm(direction), 1e-9)
        total = total + jnp.where(active, direction, 0.0)
        any_active = jnp.logical_or(any_active, active)
    return total, any_active


def _handover_residual(m: Model, task: Task, state: State, info: StepInfo,
                       ctrl: jax.Array) -> jax.Array:
    s = m.struct
    dtype = info.xpos.dtype
    box_id = s.body_id("box")
    box_c = info.xpos[box_id]
    box_R = quat_to_mat(info.xquat[box_id])

    # reach terms: cube in each gripper-site frame, y/z doubled
    # (handover.cc:39-55 — "encourage proper alignment")
    scale = jnp.asarray([1.0, 2.0, 2.0], dtype=dtype)
    reaches = []
    for side in ("left", "right"):
        gl = s.body_id(f"{side}/gripper_link")
        gpos = info.site_xpos[s.site_id(f"{side}/gripper")]
        rel = quat_rotate_inv(info.xquat[gl], box_c - gpos)
        reaches.append(rel * scale)

    # grasp term (handover.cc:57-123)
    hand_scores = []
    for side in ("left", "right"):
        nrm = {}
        act = {}
        for fname, ysign in (("left_finger_link", -1.0),
                             ("right_finger_link", 1.0)):
            fb = s.body_id(f"{side}/{fname}")
            nrm[fname], act[fname] = _finger_grasp_normal(
                info, fb, ysign, box_c, box_R, dtype)
        both = jnp.logical_and(act["left_finger_link"],
                               act["right_finger_link"])
        na = nrm["left_finger_link"]
        nb = nrm["right_finger_link"]
        na = na / jnp.maximum(jnp.linalg.norm(na), 1e-9)
        nb = nb / jnp.maximum(jnp.linalg.norm(nb), 1e-9)
        score = 0.5 * (jnp.dot(na, nb) + 1.0)
        hand_scores.append(jnp.where(both, score, 1.0))
    grasp = jnp.sqrt(jnp.maximum(hand_scores[0] * hand_scores[1], 0.0))

    bring = box_c - task.mocap_pos[0]
    return jnp.concatenate(
        [reaches[0], reaches[1], grasp[None], bring])


def _handover_transition(task: Task, m: Model, state: State,
                         info: StepInfo) -> Task:
    """Respawn the target across the table once the cube arrives
    (handover.cc:133-155: dist < 1 cm -> x flips side in U(.3,.4),
    y = +-U(.2,.3), z = U(.25,.7))."""
    s = m.struct
    box = info.xpos[s.body_id("box")]
    target = task.mocap_pos[0]
    solved = jnp.logical_and(state.time > 0,
                             jnp.linalg.norm(box - target) < 0.01)

    tick = jnp.round(state.time * 1e3).astype(jnp.int32)
    key = jax.random.fold_in(jax.random.PRNGKey(11), tick)
    kx, ky, ks, kz = jax.random.split(key, 4)
    dtype = target.dtype
    flip = jnp.where(target[0] > 0, -1.0, 1.0)
    x = flip * jax.random.uniform(kx, (), dtype=dtype, minval=0.3,
                                  maxval=0.4)
    side = jnp.where(jax.random.uniform(ks, ()) > 0.5, 1.0, -1.0)
    y = side * jax.random.uniform(ky, (), dtype=dtype, minval=0.2,
                                  maxval=0.3)
    z = jax.random.uniform(kz, (), dtype=dtype, minval=0.25, maxval=0.7)
    new = jnp.stack([x, y, z]).astype(dtype)
    pos = jnp.where(solved, new, target)
    return dataclasses.replace(
        task, mocap_pos=task.mocap_pos.at[0].set(pos))


_TERMS = (
    TermSpec("Reach L", 3, NormType.L2, num_params=1),
    TermSpec("Reach R", 3, NormType.L2, num_params=1),
    TermSpec("Grasp", 1, NormType.NULL),
    TermSpec("Bring", 3, NormType.L2, num_params=1),
)
_WEIGHTS = (0.1, 0.1, 0.05, 0.4)             # task.xml:66-69 user data
_NORM_PARAMS = ((0.01, 0.0), (0.01, 0.0), (0.0, 0.0), (0.003, 0.0))


def handover_task(dtype=jnp.float32) -> Task:
    return make_task("Bimanual Handover", _TERMS, _handover_residual,
                     _WEIGHTS, norm_params=_NORM_PARAMS,
                     mocap={"box_goal": _TARGET_START},
                     transition_fn=_handover_transition, dtype=dtype)


# ---------------------------------------------------------------------------
# Bimanual Reorient (mjpc/tasks/bimanual/reorient/{reorient.cc,task.xml})
# ---------------------------------------------------------------------------
# Object: the reorientation cross — three orthogonal capsules (radius
# 0.015, arms -0.02..0.06 per axis, 0.04 kg each;
# common_assets/reorientation_cross.xml). Goal: bring the cross to the
# target pose AND match its orientation via 18-D "cross point" residual
# (center +- kRadius * axis, both signs, all three axes;
# reorient.cc:118-141).

_CROSS_ARMS = (((-0.02, 0.0, 0.0), (0.06, 0.0, 0.0)),
               ((0.0, -0.02, 0.0), (0.0, 0.06, 0.0)),
               ((0.0, 0.0, -0.02), (0.0, 0.0, 0.06)))
_CROSS_R = 0.015
_K_RADIUS = 0.05                 # cross-point radius (reorient.cc:110)
_CROSS_START = (0.2, 0.0, 0.025)
_REORIENT_TARGET = (0.1, -0.2, 0.2)   # target_orient body region


def aloha_reorient_model(dt: float = 0.01, max_contacts: int = 16,
                         dtype=jnp.float32) -> Model:
    """Dual ViperX-300s + the reorientation cross on the table plane."""
    b = ModelBuilder(dt=dt)
    b.has_floor = True
    b.floor_z = 0.0
    b.sol_iter = 6
    b.max_contacts = max_contacts

    sphs: list[int] = []
    caps: list[int] = []
    _build_arm(b, "left", (-0.469, -0.019, 0.02), (1, 0, 0, 0), sphs, caps)
    _build_arm(b, "right", (0.469, -0.019, 0.02), (0, 0, 0, 1), sphs, caps)

    cross = b.add_body("cross", -1, pos=_CROSS_START, mass=0.12,
                       inertia=(6.5e-05, 6.5e-05, 6.5e-05))
    b.add_joint("cross_free", cross, JointType.FREE)
    arm_caps = [b.add_capsule(cross, p0=p0, p1=p1, radius=_CROSS_R,
                              friction=1.0)
                for p0, p1 in _CROSS_ARMS]
    for s in sphs:
        for c in arm_caps:
            b.add_pair_sc(s, c)
    for c in caps:
        for ac in arm_caps:
            b.add_pair_cc(c, ac)
    return b.finalize(dtype=dtype)


def reorient_home_qpos(m: Model) -> jax.Array:
    q = np.zeros(m.nq)
    q[0:8] = _HOME_ARM
    q[8:16] = _HOME_ARM
    q[16:19] = _CROSS_START
    q[19] = 1.0
    return jnp.asarray(q, dtype=m.dt.dtype)


def _cross_grasp_normal(info: StepInfo, fb: int, ysign, cross_c, cross_R,
                        dtype):
    """Summed activated grasp-sphere normals (finger -> nearest cross
    arm) — the reorient.cc:60-84 contact scan as geometry."""
    fq = info.xquat[fb]
    fp = info.xpos[fb]
    total = jnp.zeros(3, dtype=dtype)
    any_active = jnp.asarray(False)
    segs = [(cross_c + cross_R @ jnp.asarray(p0, dtype=dtype),
             cross_c + cross_R @ jnp.asarray(p1, dtype=dtype))
            for p0, p1 in _CROSS_ARMS]
    for gx, gy, gz in _GRASP_PTS:
        local = jnp.asarray([gx, ysign * gy, gz], dtype=dtype)
        center = fp + quat_rotate(fq, local)
        best_d = None
        best_pt = None
        for a, bb in segs:
            ab = bb - a
            t = jnp.clip(jnp.dot(center - a, ab)
                         / jnp.maximum(jnp.dot(ab, ab), 1e-12), 0.0, 1.0)
            pt = a + t * ab
            d = jnp.linalg.norm(pt - center)
            if best_d is None:
                best_d, best_pt = d, pt
            else:
                closer = d < best_d
                best_pt = jnp.where(closer, pt, best_pt)
                best_d = jnp.minimum(d, best_d)
        gap = best_d - _CROSS_R - 0.006
        active = gap < _GRASP_MARGIN
        direction = best_pt - center
        direction = direction / jnp.maximum(
            jnp.linalg.norm(direction), 1e-9)
        total = total + jnp.where(active, direction, 0.0)
        any_active = jnp.logical_or(any_active, active)
    return total, any_active


def _reorient_residual(m: Model, task: Task, state: State, info: StepInfo,
                       ctrl: jax.Array) -> jax.Array:
    s = m.struct
    dtype = info.xpos.dtype
    cid = s.body_id("cross")
    cross_c = info.xpos[cid]
    cross_R = quat_to_mat(info.xquat[cid])

    scale = jnp.asarray([1.0, 3.0, 3.0], dtype=dtype)  # reorient.cc:40,47
    reaches = []
    for side in ("left", "right"):
        gl = s.body_id(f"{side}/gripper_link")
        gpos = info.site_xpos[s.site_id(f"{side}/gripper")]
        rel = quat_rotate_inv(info.xquat[gl], cross_c - gpos)
        reaches.append(rel * scale)

    # per-hand grasp scores (NOT the handover geometric mean;
    # reorient.cc:86-103)
    grasps = []
    for side in ("left", "right"):
        nrm, act = {}, {}
        for fname, ysign in (("left_finger_link", -1.0),
                             ("right_finger_link", 1.0)):
            fb = s.body_id(f"{side}/{fname}")
            nrm[fname], act[fname] = _cross_grasp_normal(
                info, fb, ysign, cross_c, cross_R, dtype)
        both = jnp.logical_and(act["left_finger_link"],
                               act["right_finger_link"])
        na = nrm["left_finger_link"]
        nb = nrm["right_finger_link"]
        na = na / jnp.maximum(jnp.linalg.norm(na), 1e-9)
        nb = nb / jnp.maximum(jnp.linalg.norm(nb), 1e-9)
        grasps.append(jnp.where(both,
                                0.5 * (jnp.dot(na, nb) + 1.0), 1.0))

    # 18-D cross-point match (reorient.cc:105-141)
    tpos = task.mocap_pos[0]
    tR = quat_to_mat(task.mocap_quat[0])
    outs = []
    for dim in range(3):
        for sign in (-1.0, 1.0):
            tp = tpos + sign * _K_RADIUS * tR[:, dim]
            op = cross_c + sign * _K_RADIUS * cross_R[:, dim]
            outs.append(tp - op)
    bring = jnp.concatenate(outs)

    return jnp.concatenate(
        [reaches[0], reaches[1], grasps[0][None], grasps[1][None], bring])


def _reorient_transition(task: Task, m: Model, state: State,
                         info: StepInfo) -> Task:
    """New random goal orientation once matched (reorient.cc:143-166:
    the reference random-spins its target body on success; the pure-task
    analog resamples a uniform goal quat)."""
    res = _reorient_residual(m, task, state, info, jnp.zeros(m.nu))
    dist = jnp.linalg.norm(res[8:26])
    solved = jnp.logical_and(state.time > 0, dist < 0.02)
    tick = jnp.round(state.time * 1e3).astype(jnp.int32)
    key = jax.random.fold_in(jax.random.PRNGKey(5), tick)
    dtype = task.mocap_quat.dtype
    q = jax.random.normal(key, (4,), dtype=dtype)
    q = q / jnp.linalg.norm(q)
    newq = jnp.where(solved, q, task.mocap_quat[0])
    return dataclasses.replace(
        task, mocap_quat=task.mocap_quat.at[0].set(newq))


_REORIENT_TERMS = (
    TermSpec("Reach L", 3, NormType.L22, num_params=2),
    TermSpec("Reach R", 3, NormType.L22, num_params=2),
    TermSpec("Grasp L", 1, NormType.NULL),
    TermSpec("Grasp R", 1, NormType.NULL),
    TermSpec("Bring", 18, NormType.L2, num_params=1),
)
_REORIENT_WEIGHTS = (0.1, 0.1, 0.05, 0.05, 1.0)   # task.xml:36-40
_REORIENT_NORM_PARAMS = ((0.05, 4.0), (0.05, 4.0), (0.0, 0.0),
                         (0.0, 0.0), (0.01, 0.0))


def reorient_task(dtype=jnp.float32) -> Task:
    return make_task("Bimanual Reorient", _REORIENT_TERMS,
                     _reorient_residual, _REORIENT_WEIGHTS,
                     norm_params=_REORIENT_NORM_PARAMS,
                     mocap={"goal": _REORIENT_TARGET},
                     transition_fn=_reorient_transition, dtype=dtype)


# ---------------------------------------------------------------------------
# Bimanual Insert (mjpc/tasks/bimanual/insert/{insert.cc,task.xml})
# ---------------------------------------------------------------------------
# Two connector halves on the table: the left hand grasps the female,
# the right the male, lifts both to the target height and mates them —
# the insert residual matches ad-hoc 6-point crosses of the two
# connector sites (insert.cc:149-186, kRadius 0.08). Connector bodies
# carry the mujoco-compiled masses/inertias; the multi-box connector
# shells reduce to their grip boxes (the surfaces the grasp cost and
# fingers actually use — the socket/plug mating is scored by the cost
# cross, not contact).

_GRIP_HALF = (0.025, 0.0195, 0.0065)          # connector_x_grip boxes
_F_GRIP_POS = (0.0, 0.0, -0.0065)
_M_GRIP_POS = (0.0, 0.0, 0.012838796)
# grip-site frames (xyaxes in the connector XMLs)
_F_GRIP_QUAT = (0.7071068, 0.0, 0.7071068, 0.0)
_M_GRIP_QUAT = (0.7071068, 0.0, -0.7071068, 0.0)
_F_SITE_POS = (0.0, 0.0, 0.018)               # mating site (female)
_M_SITE_POS = (0.0, 0.0, -0.018)              # mating site (male)
_INSERT_RADIUS = 0.08                         # kRadius (insert.cc:158)
_INSERT_TARGET = (0.0, 0.0, 0.35)             # keyframe mpos
_F_START = (-0.15, 0.0, 0.05)
_F_START_QUAT = (0.0, 1.0, 0.0, 0.0)
_M_START = (0.15, 0.0, 0.05)


def aloha_insert_model(dt: float = 0.01, max_contacts: int = 16,
                       dtype=jnp.float32) -> Model:
    b = ModelBuilder(dt=dt)
    b.has_floor = True
    b.floor_z = 0.0
    b.sol_iter = 6
    b.max_contacts = max_contacts

    sphs: list[int] = []
    caps: list[int] = []
    _build_arm(b, "left", (-0.469, -0.019, 0.02), (1, 0, 0, 0), sphs, caps)
    _build_arm(b, "right", (0.469, -0.019, 0.02), (0, 0, 0, 1), sphs, caps)

    boxes = []
    for name, start, quat, mass, diag, grip_pos in (
            ("connector_f", _F_START, _F_START_QUAT, 0.0358,
             (1.5e-05, 1.49e-05, 9.41e-06), _F_GRIP_POS),
            ("connector_m", _M_START, (1, 0, 0, 0), 0.0701,
             (2.67e-05, 2.28e-05, 1.57e-05), _M_GRIP_POS)):
        body = b.add_body(name, -1, pos=start, quat=quat, mass=mass,
                          inertia=diag)
        b.add_joint(f"{name}_free", body, JointType.FREE)
        boxes.append(b.add_box(body, pos=grip_pos, size=_GRIP_HALF,
                               friction=0.5, floor=True))
        b.add_site(f"{name}_grip", body, pos=grip_pos)
        b.add_site(name, body,
                   pos=_F_SITE_POS if name == "connector_f"
                   else _M_SITE_POS)
    for s in sphs:
        for bx in boxes:
            b.add_pair_sb(s, bx)
    for c in caps:
        for bx in boxes:
            b.add_pair_cb(c, bx)
    return b.finalize(dtype=dtype)


def insert_home_qpos(m: Model) -> jax.Array:
    q = np.zeros(m.nq)
    q[0:8] = _HOME_ARM
    q[8:16] = _HOME_ARM
    q[16:19] = _F_START
    q[19:23] = _F_START_QUAT
    q[23:26] = _M_START
    q[26] = 1.0
    return jnp.asarray(q, dtype=m.dt.dtype)


def _site_frame(info: StepInfo, m: Model, body: str, local_pos,
                local_quat, dtype):
    """World position + rotation of an ORIENTED site (sites store
    positions only; the fixed site orientation composes here)."""
    bid = m.struct.body_id(body)
    bq = info.xquat[bid]
    pos = info.xpos[bid] + quat_rotate(
        bq, jnp.asarray(local_pos, dtype=dtype))
    from ..physics.math import quat_mul
    R = quat_to_mat(quat_mul(bq, jnp.asarray(local_quat, dtype=dtype)))
    return pos, R


def _insert_residual(m: Model, task: Task, state: State, info: StepInfo,
                     ctrl: jax.Array) -> jax.Array:
    s = m.struct
    dtype = info.xpos.dtype

    fg_pos, fg_R = _site_frame(info, m, "connector_f", _F_GRIP_POS,
                               _F_GRIP_QUAT, dtype)
    mg_pos, mg_R = _site_frame(info, m, "connector_m", _M_GRIP_POS,
                               _M_GRIP_QUAT, dtype)

    # reach: grip geoms in the gripper-site frames (insert.cc:36-46)
    reaches = []
    for side, gpos_w in (("left", fg_pos), ("right", mg_pos)):
        gl = s.body_id(f"{side}/gripper_link")
        gsite = info.site_xpos[s.site_id(f"{side}/gripper")]
        reaches.append(quat_rotate_inv(info.xquat[gl], gpos_w - gsite))

    # per-hand grasp with frame alignment (insert.cc:100-130):
    # grasp = (contact_misalign + 2 * frame_misalign + 3) / 6
    grasps = []
    for side, grip_c, grip_R, ysign_x in (
            ("left", fg_pos, fg_R, None), ("right", mg_pos, mg_R, None)):
        nrm, act = {}, {}
        for fname, ysign in (("left_finger_link", -1.0),
                             ("right_finger_link", 1.0)):
            fb = s.body_id(f"{side}/{fname}")
            nrm[fname], act[fname] = _finger_grasp_normal(
                info, fb, ysign, grip_c, grip_R, dtype,
                half_xyz=_GRIP_HALF)
        both = jnp.logical_and(act["left_finger_link"],
                               act["right_finger_link"])
        na = nrm["left_finger_link"]
        nb = nrm["right_finger_link"]
        na = na / jnp.maximum(jnp.linalg.norm(na), 1e-9)
        nb = nb / jnp.maximum(jnp.linalg.norm(nb), 1e-9)
        con = jnp.dot(na, nb)
        gl = s.body_id(f"{side}/gripper_link")
        grip_x = quat_rotate(info.xquat[gl],
                             jnp.asarray([1.0, 0, 0], dtype=dtype))
        frame = jnp.dot(grip_x, grip_R[:, 0])
        grasps.append(jnp.where(both, (con + 2.0 * frame + 3.0) / 6.0,
                                1.0))

    # lift: both mating sites toward the target, xy downweighted
    # (insert.cc:132-147)
    f_site, f_R = _site_frame(info, m, "connector_f", _F_SITE_POS,
                              (1.0, 0, 0, 0), dtype)
    m_site, m_R = _site_frame(info, m, "connector_m", _M_SITE_POS,
                              (1.0, 0, 0, 0), dtype)
    target = task.mocap_pos[0]
    # the reference scales components [1] and [2] by 0.1 (its comment
    # says xy matter less than z; the code as written scales y,z —
    # kept verbatim, insert.cc:140-147)
    scale = jnp.asarray([1.0, 0.1, 0.1], dtype=dtype)
    lift = jnp.concatenate([(m_site - target) * scale,
                            (f_site - target) * scale])

    # insert: 18-D cross match between the mating-site frames
    outs = []
    for dim in range(3):
        for sign in (-1.0, 1.0):
            mp = m_site + sign * _INSERT_RADIUS * m_R[:, dim]
            fp = f_site + sign * _INSERT_RADIUS * f_R[:, dim]
            outs.append(mp - fp)
    insert = jnp.concatenate(outs)

    return jnp.concatenate(
        [reaches[0], reaches[1], grasps[0][None], grasps[1][None], lift,
         insert])


_INSERT_TERMS = (
    TermSpec("Reach L", 3, NormType.L2, num_params=1),
    TermSpec("Reach R", 3, NormType.L2, num_params=1),
    TermSpec("Grasp L", 1, NormType.NULL),
    TermSpec("Grasp R", 1, NormType.NULL),
    TermSpec("Lift", 6, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Insert", 18, NormType.L2, num_params=1),
)
_INSERT_WEIGHTS = (0.3, 0.3, 0.4, 0.4, 0.7, 0.4)   # task.xml:34-39
_INSERT_NORM_PARAMS = ((0.01, 0.0), (0.01, 0.0), (0.0, 0.0),
                       (0.0, 0.0), (0.05, 0.0), (0.01, 0.0))


def insert_task(dtype=jnp.float32) -> Task:
    return make_task("Bimanual Insert", _INSERT_TERMS, _insert_residual,
                     _INSERT_WEIGHTS, norm_params=_INSERT_NORM_PARAMS,
                     mocap={"target": _INSERT_TARGET}, dtype=dtype)
