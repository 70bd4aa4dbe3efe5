"""Model description for the TPU-native rigid-body engine.

A `Model` is a pytree: numeric parameters (masses, inertias, joint axes,
collision spheres, actuator gains, solver params) are jnp-array leaves so
they can be domain-randomized per batch element, while the kinematic
STRUCTURE (tree topology, joint types, dof bookkeeping) is static aux data
so every loop over bodies/dofs unrolls at trace time into fixed-shape XLA
ops.

This replaces the reference's reliance on MuJoCo's mjModel (compiled from
MJCF XML, e.g. /root/reference/simulation/assets/humanoid.xml) with a
programmatic builder: `ModelBuilder` plays the role of the MJCF compiler
for the subset of features the reference stack uses (free/ball/slide/hinge
joints, joint limits/armature/damping/stiffness, motor and position
actuators with gear + force/ctrl ranges, sphere collision proxies vs a
heightfield floor + self-collision pairs).

Design notes (TPU-first):
  * fixed shapes everywhere: contact capacity = nsph (floor slots) + npair
    (self-collision slots); inactive slots are masked, never dropped.
  * collision geometry is a sphere cloud per body (meshes are approximated
    by spheres at build time), so narrowphase is branch-free closed form.
  * all leaves may carry leading batch axes; engine fns are written for a
    single model/state and lifted with jax.vmap.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class JointType:
    """Joint type codes (same ordering as MuJoCo's mjtJoint for familiarity)."""

    FREE = 0
    BALL = 1
    SLIDE = 2
    HINGE = 3


class ActuatorType:
    MOTOR = 0        # force = clip(ctrl); qfrc = gear * clip(force, forcerange)
    POSITION = 1     # force = kp*(ctrl - q) - kv*qvel; qfrc = gear * clip(force)
    SITE_THRUST = 2  # site transmission: wrench u * gear6 in the site's body
    #                  frame applied at the site point (MuJoCo <motor site=...
    #                  gear="fx fy fz tx ty tz">, e.g. quadrotor rotors)


def _jnt_nq(t: int) -> int:
    return {JointType.FREE: 7, JointType.BALL: 4,
            JointType.SLIDE: 1, JointType.HINGE: 1}[t]


def _jnt_nv(t: int) -> int:
    return {JointType.FREE: 6, JointType.BALL: 3,
            JointType.SLIDE: 1, JointType.HINGE: 1}[t]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Structure:
    """Static topology — hashable aux data shared by jit traces."""

    nq: int
    nv: int
    nu: int
    nbody: int
    njnt: int
    nsph: int
    npair: int
    nhrow: int
    nhcol: int

    body_parent: Tuple[int, ...]          # (nbody,) parent body index, root=-1
    body_joints: Tuple[Tuple[int, ...], ...]  # joints attached to each body
    jnt_type: Tuple[int, ...]             # (njnt,)
    jnt_body: Tuple[int, ...]             # (njnt,)
    jnt_qadr: Tuple[int, ...]
    jnt_vadr: Tuple[int, ...]
    jnt_limited: Tuple[bool, ...]
    dof_body: Tuple[int, ...]             # (nv,) body each dof belongs to
    dof_jnt: Tuple[int, ...]              # (nv,) joint each dof belongs to
    # dof support mask: mask[i][j] = 1 if dof j belongs to a body on the
    # root->body(dof i) chain (incl. body(dof i) itself). Used for CRB
    # masking and point Jacobians. Stored as bytes for hashability.
    dof_mask_bytes: bytes                 # (nv, nv) uint8 row-major
    body_dof_bytes: bytes                 # (nbody, nv) uint8: dof j moves body b
    sph_body: Tuple[int, ...]             # (nsph,) owning body per sphere
    pair_a: Tuple[int, ...]               # (npair,) sphere idx
    pair_b: Tuple[int, ...]
    act_type: Tuple[int, ...]             # (nu,)
    act_jnt: Tuple[int, ...]              # (nu,) target joint (scalar joints)
    act_site: Tuple[int, ...]             # (nu,) site per SITE_THRUST act, -1 else
    body_names: Tuple[str, ...]
    jnt_names: Tuple[str, ...]
    site_names: Tuple[str, ...]
    site_body: Tuple[int, ...]
    has_floor: bool
    # Static cap on contact slots entering the Newton solve: the top-k
    # most-penetrating slots are selected per step (collision.select_contacts)
    # and only their pyramid rows are assembled. 0 = all slots. Exact
    # whenever <= k slots are active; k is sized per robot so that bound
    # holds in practice (mj_makeConstraint's dynamic row count analog with
    # a static shape). Cuts constraint-row count ~2x on the humanoid.
    max_contacts: int = 0

    # medium properties (MJCF <option density/viscosity>): when nonzero,
    # per-body inertia-box fluid drag enters the passive force (the
    # swimmer task model sets density=1000 and disables contact,
    # mjpc/tasks/swimmer/swimmer.xml.patch). Static so density==0 models
    # skip the computation entirely at trace time.
    fluid_density: float = 0.0
    fluid_viscosity: float = 0.0

    # per-actuator: SITE_THRUST wrench expressed in the world frame
    # (MuJoCo site transmission with refsite="world", e.g. the panda
    # task's Cartesian end-effector actuators) instead of the site's
    # body frame (rotor thrust).
    act_site_world: Tuple[bool, ...] = ()
    # any body with gravcomp > 0 (MJCF body gravcomp attribute)
    has_gravcomp: bool = False

    # --- capsule / box collision geoms (round-4 extension: the
    # reference's task scenes are capsule/box based — humanoid feet are
    # capsules, manipulation objects and tables are boxes) ---
    ncap: int = 0
    nbox: int = 0
    cap_body: Tuple[int, ...] = ()
    box_body: Tuple[int, ...] = ()
    # typed self-collision pairs (index into the respective geom lists)
    pair_sc: Tuple[Tuple[int, int], ...] = ()  # (sphere, capsule)
    pair_cc: Tuple[Tuple[int, int], ...] = ()  # (capsule, capsule)
    pair_sb: Tuple[Tuple[int, int], ...] = ()  # (sphere, box)
    pair_cb: Tuple[Tuple[int, int], ...] = ()  # (capsule, box)
    pair_bb: Tuple[Tuple[int, int], ...] = ()  # (box, box) 16 slots each
    # whether spheres/capsules/boxes collide with the floor
    # (per-geom flags; empty sph_floor = all spheres collide)
    sph_floor: Tuple[bool, ...] = ()
    cap_floor: Tuple[bool, ...] = ()
    box_floor: Tuple[bool, ...] = ()

    # fixed-tendon limits (MJCF <tendon><fixed limited range>, e.g. the
    # upstream humanoid's hamstrings, humanoid.xml.patch tendon block):
    # per tendon, the joints and linear coefficients; 2 constraint rows
    # each (like joint limits)
    tendon_jnt: Tuple[Tuple[int, ...], ...] = ()
    tendon_coef: Tuple[Tuple[float, ...], ...] = ()

    # static contact-slot tables: body on each side of every slot, in
    # the canonical slot order (see collision.collide); -1 = world/floor
    slot_body_a: Tuple[int, ...] = ()
    slot_body_b: Tuple[int, ...] = ()

    @property
    def ntendon(self) -> int:
        return len(self.tendon_jnt)

    @property
    def n_floor_slots(self) -> int:
        """Leading contact slots that are geom-vs-floor (the rest are
        self/pair slots) — the `contact_dist[nsph:]` self-collision
        predicate generalized (cpu_env.py:573-584 analog)."""
        return (self.nsph + 2 * self.ncap + 8 * self.nbox)

    def __hash__(self):
        return hash((self.nq, self.nv, self.nu, self.nbody, self.njnt,
                     self.nsph, self.npair, self.body_parent, self.jnt_type,
                     self.dof_mask_bytes, self.max_contacts,
                     self.fluid_density, self.fluid_viscosity,
                     self.act_site_world, self.has_gravcomp,
                     self.ncap, self.nbox, self.pair_sc, self.pair_cc,
                     self.pair_sb, self.pair_cb, self.pair_bb,
                     self.sph_floor, self.cap_floor, self.box_floor,
                     self.tendon_jnt, self.tendon_coef))

    @property
    def dof_mask(self) -> np.ndarray:
        return np.frombuffer(self.dof_mask_bytes, dtype=np.uint8).reshape(
            self.nv, self.nv)

    @property
    def body_dof(self) -> np.ndarray:
        return np.frombuffer(self.body_dof_bytes, dtype=np.uint8).reshape(
            self.nbody, self.nv)

    def body_id(self, name: str) -> int:
        return self.body_names.index(name)

    def jnt_id(self, name: str) -> int:
        return self.jnt_names.index(name)

    def site_id(self, name: str) -> int:
        return self.site_names.index(name)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Model:
    """Numeric model parameters (jnp leaves) + static structure (aux)."""

    struct: Structure = dataclasses.field(metadata=dict(static=True))

    # bodies
    body_pos: jax.Array       # (nbody, 3) frame offset in parent frame
    body_quat: jax.Array      # (nbody, 4) frame rotation in parent frame
    body_ipos: jax.Array      # (nbody, 3) COM in body frame
    body_iquat: jax.Array     # (nbody, 4) inertial frame rotation
    body_mass: jax.Array      # (nbody,)
    body_inertia: jax.Array   # (nbody, 3) diagonal in inertial frame

    # joints
    jnt_pos: jax.Array        # (njnt, 3) anchor in body frame
    jnt_axis: jax.Array       # (njnt, 3)
    jnt_range: jax.Array      # (njnt, 2)
    jnt_stiffness: jax.Array  # (njnt,)
    jnt_springref: jax.Array  # (njnt,)
    jnt_margin: jax.Array     # (njnt,)
    # spring reference configuration (mjModel.qpos_spring analog): for
    # hinge/slide joints this repeats jnt_springref at the joint's qpos
    # address; for free/ball joints it is the reference pose the
    # stiffness spring pulls toward (MuJoCo defaults it to qpos0 — for
    # the humanoid that is the XML stand pose, giving the reference's
    # weak root tether; see engine.passive_force).
    qpos_spring: jax.Array    # (nq,)

    # dofs
    dof_damping: jax.Array    # (nv,)
    dof_armature: jax.Array   # (nv,)

    # actuators
    act_gear: jax.Array       # (nu,)
    act_gear6: jax.Array      # (nu, 6) site-frame wrench map (SITE_THRUST)
    act_kp: jax.Array         # (nu,)
    act_kv: jax.Array         # (nu,)
    act_ctrlrange: jax.Array  # (nu, 2)
    act_forcerange: jax.Array  # (nu, 2)

    # per-body gravity compensation fraction (MJCF gravcomp; the panda
    # model sets 1 on every link, panda_modified.xml)
    body_gravcomp: jax.Array  # (nbody,)

    # sites (named reference points for sensors/costs)
    site_pos: jax.Array       # (nsite, 3) in body frame

    # collision spheres
    sph_pos: jax.Array        # (nsph, 3) center in body frame
    sph_radius: jax.Array     # (nsph,)
    sph_friction: jax.Array   # (nsph,) tangential friction coef
    sph_friction_tor: jax.Array   # (nsph,) torsional friction
    sph_friction_roll: jax.Array  # (nsph,) rolling friction

    # floor: heightfield z(x, y) = floor_z + hfield bilinear sample
    floor_z: jax.Array        # () base floor height (world z)
    floor_friction: jax.Array  # ()
    floor_friction_tor: jax.Array   # ()
    floor_friction_roll: jax.Array  # ()
    hfield_data: jax.Array    # (nhrow, nhcol) heights in meters (>= 0)
    hfield_halfsize: jax.Array  # (2,) half-extent in x, y

    # options
    dt: jax.Array             # () physics timestep
    gravity: jax.Array        # (3,)
    solref: jax.Array         # (2,) [timeconst, dampratio] for contacts
    solimp: jax.Array         # (3,) [dmin, dmax, width] impedance
    limit_solref: jax.Array   # (2,)
    limit_solimp: jax.Array   # (3,)
    sol_iter: jax.Array = dataclasses.field(
        default=None, metadata=dict(static=False))  # () int, PGS sweeps

    # --- capsule geoms: segment (pos ± halflen*axis in body frame) + r ---
    cap_pos: jax.Array = None        # (ncap, 3) center, body frame
    cap_axis: jax.Array = None       # (ncap, 3) unit axis, body frame
    cap_halflen: jax.Array = None    # (ncap,)
    cap_radius: jax.Array = None     # (ncap,)
    cap_friction: jax.Array = None       # (ncap,)
    cap_friction_tor: jax.Array = None
    cap_friction_roll: jax.Array = None

    # --- box geoms: center pose + half-extents in body frame ---
    box_pos: jax.Array = None        # (nbox, 3)
    box_quat: jax.Array = None       # (nbox, 4)
    box_size: jax.Array = None       # (nbox, 3) half-extents
    box_friction: jax.Array = None       # (nbox,)
    box_friction_tor: jax.Array = None
    box_friction_roll: jax.Array = None

    # fixed-tendon limit ranges (ntendon, 2)
    tendon_range: jax.Array = None

    def replace(self, **kw) -> "Model":
        return dataclasses.replace(self, **kw)

    @property
    def nq(self):
        return self.struct.nq

    @property
    def nv(self):
        return self.struct.nv

    @property
    def nu(self):
        return self.struct.nu

    @property
    def ncon(self):
        """Fixed contact capacity over the static slot layout:
        geom-vs-floor slots (1/sphere, 2/capsule endpoints, 8/box
        corners) then typed pair slots (1 each; box-box pairs get 16
        vertex slots)."""
        s = self.struct
        return (s.n_floor_slots + s.npair + len(s.pair_sc)
                + len(s.pair_cc) + len(s.pair_sb) + len(s.pair_cb)
                + 16 * len(s.pair_bb))


class ModelBuilder:
    """Programmatic model construction (the MJCF-compiler analog).

    Mirrors the subset of MJCF the reference stack exercises
    (humanoid.xml / world.xml / test fixtures): bodies with one inertial
    frame, free/hinge/slide/ball joints with limits + armature + damping +
    stiffness, motor/position actuators, sphere collision proxies.
    """

    def __init__(self, dt: float = 0.002, gravity=(0.0, 0.0, -9.81)):
        self.dt = dt
        self.gravity = gravity
        self._bodies: List[dict] = []
        self._joints: List[dict] = []
        self._acts: List[dict] = []
        self._sphs: List[dict] = []
        self._caps: List[dict] = []
        self._boxes: List[dict] = []
        self._pairs: List[Tuple[int, int]] = []
        self._pairs_sc: List[Tuple[int, int]] = []
        self._pairs_cc: List[Tuple[int, int]] = []
        self._pairs_sb: List[Tuple[int, int]] = []
        self._pairs_cb: List[Tuple[int, int]] = []
        self._pairs_bb: List[Tuple[int, int]] = []
        self._tendons: List[dict] = []
        self._sites: List[dict] = []
        self.floor_z = 0.0
        self.floor_friction = 1.0
        self.floor_friction_tor = 0.005
        self.floor_friction_roll = 0.0001
        self.has_floor = True
        self.max_contacts = 0
        self.fluid_density = 0.0     # MJCF <option density>
        self.fluid_viscosity = 0.0   # MJCF <option viscosity>
        self.hfield_shape = (2, 2)
        self.hfield_halfsize = (10.0, 10.0)
        self.solref = (0.015, 1.0)      # world.xml:19 geom solref ".015 1"
        self.solimp = (0.9, 0.99, 0.003)  # world.xml:19 solimp ".9 .99 .003"
        self.limit_solref = (0.004, 1.0)  # world.xml:22 solreflimit "4e-3 1"
        self.limit_solimp = (0.95, 0.99, 0.001)
        self.sol_iter = 20

    def add_body(self, name: str, parent: int, pos=(0, 0, 0),
                 quat=(1, 0, 0, 0), mass: float = 0.0,
                 ipos=(0, 0, 0), iquat=(1, 0, 0, 0),
                 inertia=(0, 0, 0), gravcomp: float = 0.0) -> int:
        self._bodies.append(dict(name=name, parent=parent, pos=pos, quat=quat,
                                 mass=mass, ipos=ipos, iquat=iquat,
                                 inertia=inertia, gravcomp=gravcomp))
        return len(self._bodies) - 1

    def add_joint(self, name: str, body: int, jtype: int, axis=(0, 0, 1),
                  pos=(0, 0, 0), jrange=(0.0, 0.0), limited=False,
                  damping: float = 0.0, armature: float = 0.0,
                  stiffness: float = 0.0, springref: float = 0.0,
                  margin: float = 0.0) -> int:
        self._joints.append(dict(name=name, body=body, jtype=jtype, axis=axis,
                                 pos=pos, jrange=jrange, limited=limited,
                                 damping=damping, armature=armature,
                                 stiffness=stiffness, springref=springref,
                                 margin=margin))
        return len(self._joints) - 1

    def add_actuator(self, joint: int, atype: int = ActuatorType.MOTOR,
                     gear: float = 1.0, kp: float = 1.0, kv: float = 0.0,
                     ctrlrange=(-1.0, 1.0), forcerange=(-1.0, 1.0)) -> int:
        self._acts.append(dict(joint=joint, atype=atype, gear=gear, kp=kp,
                               kv=kv, ctrlrange=ctrlrange,
                               forcerange=forcerange))
        return len(self._acts) - 1

    def add_thrust(self, site: int, gear=(0.0, 0.0, 1.0, 0.0, 0.0, 0.0),
                   ctrlrange=(0.0, 1.0), forcerange=(-1e9, 1e9),
                   world_frame: bool = False) -> int:
        """Site-transmission actuator (MuJoCo <motor site=... gear="fx fy
        fz tx ty tz">): applies ctrl * gear6 as a wrench at the site
        point, in the site's body frame (quadrotor rotors,
        mjpc/tasks/quadrotor task.xml actuator block) or, with
        `world_frame`, in the world frame (refsite="world" Cartesian
        end-effector actuators, tasks/panda/panda_modified.xml)."""
        self._acts.append(dict(joint=-1, atype=ActuatorType.SITE_THRUST,
                               gear=1.0, kp=0.0, kv=0.0,
                               ctrlrange=ctrlrange, forcerange=forcerange,
                               site=site, gear6=tuple(gear),
                               world_frame=bool(world_frame)))
        return len(self._acts) - 1

    def add_sphere(self, body: int, pos=(0, 0, 0), radius: float = 0.02,
                   friction: float = 1.0, friction_tor: float = 0.005,
                   friction_roll: float = 0.0001,
                   floor: bool = True) -> int:
        # MuJoCo default torsional/rolling coefficients (0.005, 0.0001);
        # floor=False gates the sphere's floor slot off (geoms that live
        # below/at the plane, e.g. a fixed hand base)
        self._sphs.append(dict(body=body, pos=pos, radius=radius,
                               friction=friction, friction_tor=friction_tor,
                               friction_roll=friction_roll,
                               floor=bool(floor)))
        return len(self._sphs) - 1

    def add_capsule(self, body: int, p0=(0, 0, 0), p1=(0, 0, 1),
                    radius: float = 0.02, friction: float = 1.0,
                    friction_tor: float = 0.005,
                    friction_roll: float = 0.0001,
                    floor: bool = True) -> int:
        """Capsule geom from segment endpoints in the BODY frame (the
        MJCF fromto convention, e.g. the upstream humanoid's limb and
        foot capsules, mjpc/tasks/humanoid/humanoid.xml.patch)."""
        p0 = np.asarray(p0, dtype=np.float64)
        p1 = np.asarray(p1, dtype=np.float64)
        center = 0.5 * (p0 + p1)
        d = p1 - p0
        halflen = 0.5 * float(np.linalg.norm(d))
        axis = d / max(2 * halflen, 1e-12)
        self._caps.append(dict(body=body, pos=tuple(center),
                               axis=tuple(axis), halflen=halflen,
                               radius=radius, friction=friction,
                               friction_tor=friction_tor,
                               friction_roll=friction_roll,
                               floor=bool(floor)))
        return len(self._caps) - 1

    def add_box(self, body: int, pos=(0, 0, 0), quat=(1, 0, 0, 0),
                size=(0.1, 0.1, 0.1), friction: float = 1.0,
                friction_tor: float = 0.005, friction_roll: float = 0.0001,
                floor: bool = True) -> int:
        """Box geom: half-extents `size`, pose in the body frame (MJCF
        type=box, e.g. manipulation objects/tables,
        mjpc/tasks/bimanual/handover/task.xml)."""
        self._boxes.append(dict(body=body, pos=pos, quat=quat, size=size,
                                friction=friction,
                                friction_tor=friction_tor,
                                friction_roll=friction_roll,
                                floor=bool(floor)))
        return len(self._boxes) - 1

    def add_pair(self, sph_a: int, sph_b: int):
        self._pairs.append((sph_a, sph_b))

    def add_pair_sc(self, sph: int, cap: int):
        self._pairs_sc.append((sph, cap))

    def add_pair_cc(self, cap_a: int, cap_b: int):
        self._pairs_cc.append((cap_a, cap_b))

    def add_pair_sb(self, sph: int, box: int):
        self._pairs_sb.append((sph, box))

    def add_pair_cb(self, cap: int, box: int):
        self._pairs_cb.append((cap, box))

    def add_pair_bb(self, box_a: int, box_b: int):
        self._pairs_bb.append((box_a, box_b))

    def add_tendon_limit(self, joints: Sequence[int],
                         coefs: Sequence[float], trange: Tuple[float, float]):
        """Fixed-tendon length limit: lo <= sum coef_i * qpos[jnt_i] <= hi
        (MJCF <tendon><fixed limited="true" range>, the humanoid
        hamstrings)."""
        self._tendons.append(dict(joints=tuple(int(j) for j in joints),
                                  coefs=tuple(float(c) for c in coefs),
                                  range=(float(trange[0]),
                                         float(trange[1]))))

    def add_site(self, name: str, body: int, pos=(0, 0, 0)) -> int:
        self._sites.append(dict(name=name, body=body, pos=pos))
        return len(self._sites) - 1

    def finalize(self, dtype=jnp.float32) -> Model:
        nbody = len(self._bodies)
        njnt = len(self._joints)
        nq = nv = 0
        jnt_qadr, jnt_vadr = [], []
        dof_body, dof_jnt = [], []
        for j, jd in enumerate(self._joints):
            jnt_qadr.append(nq)
            jnt_vadr.append(nv)
            nq += _jnt_nq(jd["jtype"])
            for _ in range(_jnt_nv(jd["jtype"])):
                dof_body.append(jd["body"])
                dof_jnt.append(j)
            nv += _jnt_nv(jd["jtype"])

        body_joints: List[List[int]] = [[] for _ in range(nbody)]
        for j, jd in enumerate(self._joints):
            body_joints[jd["body"]].append(j)

        # chains: for each body, the set of dofs on root->body path
        body_dof = np.zeros((nbody, nv), dtype=np.uint8)
        for b in range(nbody):
            cur = b
            while cur >= 0:
                for j in body_joints[cur]:
                    v0 = jnt_vadr[j]
                    body_dof[b, v0:v0 + _jnt_nv(self._joints[j]["jtype"])] = 1
                cur = self._bodies[cur]["parent"]
        dof_mask = np.zeros((nv, nv), dtype=np.uint8)
        for i in range(nv):
            dof_mask[i] = body_dof[dof_body[i]]

        nsph = len(self._sphs)
        ncap = len(self._caps)
        nbox = len(self._boxes)
        npair = len(self._pairs)
        nu = len(self._acts)

        # static contact-slot body tables in the canonical order that
        # collision.collide emits (floor groups then pair groups)
        sph_body_l = [s["body"] for s in self._sphs]
        cap_body_l = [c["body"] for c in self._caps]
        box_body_l = [b["body"] for b in self._boxes]
        slot_a: List[int] = []
        slot_b: List[int] = []

        def floor_slots(bodies, per):
            for b in bodies:
                for _ in range(per):
                    slot_a.append(-1)
                    slot_b.append(b)

        floor_slots(sph_body_l, 1)
        floor_slots(cap_body_l, 2)
        floor_slots(box_body_l, 8)
        for (i, j) in self._pairs:
            slot_a.append(sph_body_l[i])
            slot_b.append(sph_body_l[j])
        for (i, j) in self._pairs_sc:
            slot_a.append(sph_body_l[i])
            slot_b.append(cap_body_l[j])
        for (i, j) in self._pairs_cc:
            slot_a.append(cap_body_l[i])
            slot_b.append(cap_body_l[j])
        for (i, j) in self._pairs_sb:
            slot_a.append(sph_body_l[i])
            slot_b.append(box_body_l[j])
        for (i, j) in self._pairs_cb:
            slot_a.append(cap_body_l[i])
            slot_b.append(box_body_l[j])
        for (i, j) in self._pairs_bb:
            for _ in range(16):
                slot_a.append(box_body_l[i])
                slot_b.append(box_body_l[j])

        struct = Structure(
            nq=nq, nv=nv, nu=nu, nbody=nbody, njnt=njnt, nsph=nsph,
            npair=npair, nhrow=self.hfield_shape[0],
            nhcol=self.hfield_shape[1],
            body_parent=tuple(b["parent"] for b in self._bodies),
            body_joints=tuple(tuple(x) for x in body_joints),
            jnt_type=tuple(j["jtype"] for j in self._joints),
            jnt_body=tuple(j["body"] for j in self._joints),
            jnt_qadr=tuple(jnt_qadr), jnt_vadr=tuple(jnt_vadr),
            jnt_limited=tuple(bool(j["limited"]) for j in self._joints),
            dof_body=tuple(dof_body), dof_jnt=tuple(dof_jnt),
            dof_mask_bytes=dof_mask.tobytes(),
            body_dof_bytes=body_dof.tobytes(),
            sph_body=tuple(s["body"] for s in self._sphs),
            pair_a=tuple(p[0] for p in self._pairs),
            pair_b=tuple(p[1] for p in self._pairs),
            act_type=tuple(a["atype"] for a in self._acts),
            act_jnt=tuple(a["joint"] for a in self._acts),
            act_site=tuple(a.get("site", -1) for a in self._acts),
            act_site_world=tuple(bool(a.get("world_frame", False))
                                 for a in self._acts),
            has_gravcomp=any(b.get("gravcomp", 0.0) != 0.0
                             for b in self._bodies),
            body_names=tuple(b["name"] for b in self._bodies),
            jnt_names=tuple(j["name"] for j in self._joints),
            site_names=tuple(s["name"] for s in self._sites),
            site_body=tuple(s["body"] for s in self._sites),
            has_floor=self.has_floor,
            max_contacts=self.max_contacts,
            fluid_density=float(self.fluid_density),
            fluid_viscosity=float(self.fluid_viscosity),
            ncap=ncap, nbox=nbox,
            cap_body=tuple(cap_body_l), box_body=tuple(box_body_l),
            pair_sc=tuple(self._pairs_sc), pair_cc=tuple(self._pairs_cc),
            pair_sb=tuple(self._pairs_sb), pair_cb=tuple(self._pairs_cb),
            pair_bb=tuple(self._pairs_bb),
            sph_floor=tuple(bool(sp.get("floor", True))
                            for sp in self._sphs),
            cap_floor=tuple(bool(c["floor"]) for c in self._caps),
            box_floor=tuple(bool(b["floor"]) for b in self._boxes),
            tendon_jnt=tuple(t["joints"] for t in self._tendons),
            tendon_coef=tuple(t["coefs"] for t in self._tendons),
            slot_body_a=tuple(slot_a), slot_body_b=tuple(slot_b),
        )

        def arr(vals, shape=None):
            a = np.array(vals, dtype=np.float64)
            if shape is not None:
                a = (np.zeros(shape) if a.size == 0 and 0 in shape
                     else a.reshape(shape))
            return jnp.asarray(a, dtype=dtype)

        dof_damping = np.zeros(nv)
        dof_armature = np.zeros(nv)
        for j, jd in enumerate(self._joints):
            v0 = jnt_vadr[j]
            dof_damping[v0:v0 + _jnt_nv(jd["jtype"])] = jd["damping"]
            dof_armature[v0:v0 + _jnt_nv(jd["jtype"])] = jd["armature"]

        # qpos_spring: hinge/slide -> springref; free -> the carrying
        # body's frame pose in its parent (MuJoCo qpos0 semantics — free
        # joints are world-children so this is the world pose); ball ->
        # identity quat.
        qpos_spring = np.zeros(nq)
        for j, jd in enumerate(self._joints):
            q0 = jnt_qadr[j]
            t = jd["jtype"]
            if t == JointType.FREE:
                b = jd["body"]
                qpos_spring[q0:q0 + 3] = np.asarray(
                    self._bodies[b]["pos"], dtype=np.float64)
                qpos_spring[q0 + 3:q0 + 7] = _normq(self._bodies[b]["quat"])
            elif t == JointType.BALL:
                qpos_spring[q0] = 1.0
            else:
                qpos_spring[q0] = jd["springref"]

        return Model(
            struct=struct,
            body_pos=arr([b["pos"] for b in self._bodies], (nbody, 3)),
            body_quat=arr([_normq(b["quat"]) for b in self._bodies],
                          (nbody, 4)),
            body_ipos=arr([b["ipos"] for b in self._bodies], (nbody, 3)),
            body_iquat=arr([_normq(b["iquat"]) for b in self._bodies],
                           (nbody, 4)),
            body_mass=arr([b["mass"] for b in self._bodies], (nbody,)),
            body_inertia=arr([b["inertia"] for b in self._bodies],
                             (nbody, 3)),
            body_gravcomp=arr([b.get("gravcomp", 0.0)
                               for b in self._bodies], (nbody,)),
            jnt_pos=arr([j["pos"] for j in self._joints],
                        (njnt, 3)),
            jnt_axis=arr([_normv(j["axis"]) for j in self._joints],
                         (njnt, 3)),
            jnt_range=arr([j["jrange"] for j in self._joints],
                          (njnt, 2)),
            jnt_stiffness=arr([j["stiffness"] for j in self._joints],
                              (njnt,)),
            jnt_springref=arr([j["springref"] for j in self._joints],
                              (njnt,)),
            jnt_margin=arr([j["margin"] for j in self._joints],
                           (njnt,)),
            qpos_spring=arr(qpos_spring, (nq,)),
            dof_damping=arr(dof_damping, (nv,)),
            dof_armature=arr(dof_armature, (nv,)),
            act_gear=arr([a["gear"] for a in self._acts], (nu,)),
            act_gear6=arr([a.get("gear6", (0.0,) * 6) for a in self._acts],
                          (nu, 6)),
            act_kp=arr([a["kp"] for a in self._acts], (nu,)),
            act_kv=arr([a["kv"] for a in self._acts], (nu,)),
            act_ctrlrange=arr([a["ctrlrange"] for a in self._acts],
                              (nu, 2)),
            act_forcerange=arr([a["forcerange"] for a in self._acts],
                               (nu, 2)),
            site_pos=arr([s["pos"] for s in self._sites],
                         (len(self._sites), 3)),
            cap_pos=arr([c["pos"] for c in self._caps], (ncap, 3)),
            cap_axis=arr([c["axis"] for c in self._caps], (ncap, 3)),
            cap_halflen=arr([c["halflen"] for c in self._caps], (ncap,)),
            cap_radius=arr([c["radius"] for c in self._caps], (ncap,)),
            cap_friction=arr([c["friction"] for c in self._caps],
                             (ncap,)),
            cap_friction_tor=arr([c["friction_tor"] for c in self._caps],
                                 (ncap,)),
            cap_friction_roll=arr([c["friction_roll"]
                                   for c in self._caps], (ncap,)),
            box_pos=arr([b["pos"] for b in self._boxes], (nbox, 3)),
            box_quat=arr([_normq(b["quat"]) for b in self._boxes],
                         (nbox, 4)),
            box_size=arr([b["size"] for b in self._boxes], (nbox, 3)),
            box_friction=arr([b["friction"] for b in self._boxes],
                             (nbox,)),
            box_friction_tor=arr([b["friction_tor"]
                                  for b in self._boxes], (nbox,)),
            box_friction_roll=arr([b["friction_roll"]
                                   for b in self._boxes], (nbox,)),
            tendon_range=arr([t["range"] for t in self._tendons],
                             (len(self._tendons), 2)),
            sph_pos=arr([s["pos"] for s in self._sphs],
                        (nsph, 3)),
            sph_radius=arr([s["radius"] for s in self._sphs],
                           (nsph,)),
            sph_friction=arr([s["friction"] for s in self._sphs],
                             (nsph,)),
            sph_friction_tor=arr([s["friction_tor"] for s in self._sphs],
                                 (nsph,)),
            sph_friction_roll=arr([s["friction_roll"] for s in self._sphs],
                                  (nsph,)),
            floor_z=arr(self.floor_z, ()),
            floor_friction=arr(self.floor_friction, ()),
            floor_friction_tor=arr(self.floor_friction_tor, ()),
            floor_friction_roll=arr(self.floor_friction_roll, ()),
            hfield_data=jnp.zeros(self.hfield_shape, dtype=dtype),
            hfield_halfsize=arr(self.hfield_halfsize, (2,)),
            dt=arr(self.dt, ()),
            gravity=arr(self.gravity, (3,)),
            solref=arr(self.solref, (2,)),
            solimp=arr(self.solimp, (3,)),
            limit_solref=arr(self.limit_solref, (2,)),
            limit_solimp=arr(self.limit_solimp, (3,)),
            sol_iter=jnp.asarray(self.sol_iter, dtype=jnp.int32),
        )


def _normq(q):
    q = np.asarray(q, dtype=np.float64)
    return q / np.linalg.norm(q)


def _normv(v):
    v = np.asarray(v, dtype=np.float64)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class State:
    """Dynamic state — the (qpos, qvel) snapshot the planner hands off.

    Analog of the reference's State store (mjpc/states/state.h:48-75),
    but an immutable pytree instead of a mutex-guarded buffer.
    """

    qpos: jax.Array   # (nq,)
    qvel: jax.Array   # (nv,)
    time: jax.Array   # ()

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)


def make_state(model: Model, qpos=None, qvel=None, time=0.0) -> State:
    dtype = model.body_pos.dtype
    if qpos is None:
        qpos = default_qpos(model)
    if qvel is None:
        qvel = jnp.zeros((model.nv,), dtype=dtype)
    return State(qpos=jnp.asarray(qpos, dtype=dtype),
                 qvel=jnp.asarray(qvel, dtype=dtype),
                 time=jnp.asarray(time, dtype=dtype))


def default_qpos(model: Model) -> jax.Array:
    """Neutral configuration (MuJoCo qpos0 semantics): scalar joints at
    0, ball joints at identity, FREE joints at the carrying body's frame
    pose in the world — so a body declared at pos=(x,y,z) starts there,
    like mjModel.qpos0. Trace-safe: body_pos/body_quat may be traced
    (state_estimation jits over the model)."""
    s = model.struct
    dtype = model.body_pos.dtype
    q = jnp.zeros(s.nq, dtype=dtype)
    for j in range(s.njnt):
        adr = s.jnt_qadr[j]
        if s.jnt_type[j] == JointType.FREE:
            b = s.jnt_body[j]
            q = q.at[adr:adr + 3].set(model.body_pos[b])
            q = q.at[adr + 3:adr + 7].set(model.body_quat[b])
        elif s.jnt_type[j] == JointType.BALL:
            q = q.at[adr].set(1.0)
    return q
