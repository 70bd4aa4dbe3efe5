"""Capsule/box narrowphase parity vs real MuJoCo (round-3 VERDICT next
item #2: the reference's task scenes are capsule/box based —
mjpc/tasks/humanoid/humanoid.xml.patch capsule limbs,
mjpc/tasks/bimanual/handover/task.xml box object + table).

Each test builds the SAME tiny scene in MuJoCo and in our builder, runs
both engines and compares contact depth/normal (single-step narrowphase)
or the settled pose (short trajectories). Exact-primitive cases
(sphere-box, capsule-capsule, capsule endpoints on a plane) get tight
tolerances; the documented approximations (box-box vertex contacts)
get behavioral assertions instead.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import humanoid_mujoco_tpu.physics.math as pm
from humanoid_mujoco_tpu.physics.collision import (_point_box_local,
                                                   _seg_seg_closest,
                                                   collide)
from humanoid_mujoco_tpu.physics.engine import fwd_position
from humanoid_mujoco_tpu.physics.model import (JointType, ModelBuilder,
                                               make_state)
from humanoid_mujoco_tpu.physics.step import step

mujoco = pytest.importorskip("mujoco")


def _roll(m, s, n):
    @functools.partial(jax.jit, static_argnums=(1,))
    def run(s, n):
        def body(c, _):
            s2, i = step(m, c, jnp.zeros(m.nu))
            return s2, i.diverged
        return jax.lax.scan(body, s, None, length=n)
    s2, div = run(s, n)
    assert not bool(np.asarray(div).any())
    return s2


def _mj_roll(xml, n, qpos0=None):
    mm = mujoco.MjModel.from_xml_string(xml)
    dd = mujoco.MjData(mm)
    if qpos0 is not None:
        dd.qpos[:] = qpos0
    for _ in range(n):
        mujoco.mj_step(mm, dd)
    return mm, dd


class TestPointBox:
    def test_outside_matches_closed_form(self):
        size = jnp.asarray([0.05, 0.04, 0.03])
        p = jnp.asarray([0.10, 0.0, 0.0])
        d, g, q = _point_box_local(p, size)
        assert float(d) == pytest.approx(0.05, abs=1e-6)
        np.testing.assert_allclose(np.asarray(g), [1, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(q), [0.05, 0, 0], atol=1e-6)

    def test_corner_region(self):
        size = jnp.asarray([0.05, 0.04, 0.03])
        p = jnp.asarray([0.08, 0.07, 0.06])
        d, g, q = _point_box_local(p, size)
        expect = np.linalg.norm([0.03, 0.03, 0.03])
        assert float(d) == pytest.approx(expect, abs=1e-6)
        np.testing.assert_allclose(np.asarray(q), [0.05, 0.04, 0.03],
                                   atol=1e-6)

    def test_inside_nearest_face(self):
        size = jnp.asarray([0.05, 0.04, 0.03])
        p = jnp.asarray([0.01, 0.0, 0.025])   # nearest +z face (gap .005)
        d, g, q = _point_box_local(p, size)
        assert float(d) == pytest.approx(-0.005, abs=1e-6)
        np.testing.assert_allclose(np.asarray(g), [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(np.asarray(q), [0.01, 0, 0.03],
                                   atol=1e-6)


class TestSegSeg:
    def test_matches_brute_force(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            p1, q1, p2, q2 = [jnp.asarray(rng.normal(size=3)) for _ in
                              range(4)]
            a, b = _seg_seg_closest(p1, q1, p2, q2)
            d = float(jnp.linalg.norm(a - b))
            ts = np.linspace(0, 1, 201)
            A = np.asarray(p1)[None] + ts[:, None] * np.asarray(q1 - p1)
            B = np.asarray(p2)[None] + ts[:, None] * np.asarray(q2 - p2)
            brute = np.min(np.linalg.norm(A[:, None] - B[None], axis=-1))
            assert d == pytest.approx(brute, abs=2e-3)


def _capsule_free_xml(radius, halflen, z0):
    return f"""
    <mujoco><option timestep="0.002"/>
    <worldbody>
      <geom name="floor" type="plane" size="5 5 .1" friction="1 .005 .0001"/>
      <body name="cap" pos="0 0 {z0}">
        <freejoint/>
        <geom type="capsule" fromto="{-halflen} 0 0 {halflen} 0 0"
              size="{radius}" friction="1 .005 .0001" mass="1"/>
      </body>
    </worldbody></mujoco>"""


class TestCapsuleFloorParity:
    def test_settle_height_and_orientation(self):
        """A dropped horizontal capsule settles at z = radius in both
        engines (endpoint-sphere slots reproduce the capsule-plane
        2-contact convention)."""
        mm, dd = _mj_roll(_capsule_free_xml(0.05, 0.15, 0.3), 500)
        b = ModelBuilder(dt=0.002)
        body = b.add_body("cap", -1, mass=1.0,
                          inertia=tuple(mm.body_inertia[1]))
        b.add_joint("free", body, JointType.FREE)
        b.add_capsule(body, p0=(-0.15, 0, 0), p1=(0.15, 0, 0),
                      radius=0.05)
        mc = b.finalize()
        s2 = _roll(mc, make_state(
            mc, qpos=jnp.asarray([0, 0, 0.3, 1, 0, 0, 0.])), 500)
        assert float(s2.qpos[2]) == pytest.approx(dd.qpos[2], abs=0.004)
        # stays horizontal in both
        assert abs(float(s2.qpos[3])) > 0.999
        assert abs(dd.qpos[3]) > 0.999

    def test_tilted_capsule_falls_flat(self):
        """A capsule dropped at 30 deg ends lying flat (z=r, horizontal
        axis) — the endpoint contacts must torque it down like MuJoCo."""
        b = ModelBuilder(dt=0.002)
        body = b.add_body("cap", -1, mass=1.0,
                          inertia=(0.008, 0.008, 0.001))
        b.add_joint("free", body, JointType.FREE)
        b.add_capsule(body, p0=(-0.15, 0, 0), p1=(0.15, 0, 0),
                      radius=0.05)
        mc = b.finalize()
        q = pm.axis_angle_to_quat(jnp.asarray([0., 1., 0.]),
                                  jnp.asarray(0.5))
        s0 = make_state(mc, qpos=jnp.concatenate(
            [jnp.asarray([0., 0., 0.25]), q]))
        s2 = _roll(mc, s0, 1500)
        assert float(s2.qpos[2]) == pytest.approx(0.05, abs=0.005)
        axis_w = pm.quat_rotate(s2.qpos[3:7], jnp.asarray([1., 0., 0.]))
        assert abs(float(axis_w[2])) < 0.05   # lying horizontal


class TestBoxFloorParity:
    def test_settle_height(self):
        xml = """
        <mujoco><option timestep="0.002"/>
        <worldbody>
          <geom name="floor" type="plane" size="5 5 .1"/>
          <body name="box" pos="0 0 0.2">
            <freejoint/>
            <geom type="box" size="0.05 0.04 0.03" mass="0.5"/>
          </body>
        </worldbody></mujoco>"""
        mm, dd = _mj_roll(xml, 500)
        b = ModelBuilder(dt=0.002)
        bd = b.add_body("box", -1, mass=0.5,
                        inertia=tuple(mm.body_inertia[1]))
        b.add_joint("free", bd, JointType.FREE)
        b.add_box(bd, size=(0.05, 0.04, 0.03))
        mb = b.finalize()
        s2 = _roll(mb, make_state(
            mb, qpos=jnp.asarray([0, 0, 0.2, 1, 0, 0, 0.])), 500)
        assert float(s2.qpos[2]) == pytest.approx(dd.qpos[2], abs=0.004)

    def test_box_slides_then_stops_with_friction(self):
        """Box shoved sideways decelerates to rest under mu=0.5 friction
        — displacement within 15% of MuJoCo's."""
        xml = """
        <mujoco><option timestep="0.002"/>
        <worldbody>
          <geom name="floor" type="plane" size="5 5 .1"
                friction="0.5 0.005 0.0001"/>
          <body name="box" pos="0 0 0.03">
            <freejoint/>
            <geom type="box" size="0.05 0.04 0.03" mass="0.5"
                  friction="0.5 0.005 0.0001"/>
          </body>
        </worldbody></mujoco>"""
        mm = mujoco.MjModel.from_xml_string(xml)
        dd = mujoco.MjData(mm)
        dd.qvel[0] = 1.0
        for _ in range(1000):
            mujoco.mj_step(mm, dd)
        b = ModelBuilder(dt=0.002)
        bd = b.add_body("box", -1, mass=0.5,
                        inertia=tuple(mm.body_inertia[1]))
        b.add_joint("free", bd, JointType.FREE)
        b.add_box(bd, size=(0.05, 0.04, 0.03), friction=0.5)
        b.floor_friction = 0.5
        mb = b.finalize()
        s0 = make_state(mb, qpos=jnp.asarray([0, 0, 0.03, 1, 0, 0, 0.]),
                        qvel=jnp.asarray([1., 0, 0, 0, 0, 0]))
        s2 = _roll(mb, s0, 1000)
        assert float(jnp.linalg.norm(s2.qvel)) < 0.02   # at rest
        assert float(s2.qpos[0]) == pytest.approx(dd.qpos[0], rel=0.15)


class TestSphereBoxParity:
    def test_contact_depth_and_normal(self):
        """Static sphere overlapping a box face: our slot must agree
        with MuJoCo's sphere-box contact depth and normal."""
        xml = """
        <mujoco><option timestep="0.002"/>
        <worldbody>
          <body name="box" pos="0 0 0">
            <geom type="box" size="0.05 0.05 0.05" mass="1"/>
          </body>
          <body name="sph" pos="0.08 0 0">
            <freejoint/>
            <geom type="sphere" size="0.04" mass="0.1"/>
          </body>
        </worldbody></mujoco>"""
        mm = mujoco.MjModel.from_xml_string(xml)
        dd = mujoco.MjData(mm)
        mujoco.mj_forward(mm, dd)
        assert dd.ncon == 1
        mj_depth = dd.contact[0].dist           # negative = penetration
        mj_n = dd.contact[0].frame[:3]

        b = ModelBuilder(dt=0.002)
        bx = b.add_body("box", -1, mass=1.0, inertia=(0.01,) * 3)
        sp = b.add_body("sph", -1, pos=(0.08, 0, 0), mass=0.1,
                        inertia=(1e-4,) * 3)
        b.add_joint("free", sp, JointType.FREE)
        ib = b.add_box(bx, size=(0.05, 0.05, 0.05), floor=False)
        isp = b.add_sphere(sp, radius=0.04)
        b.add_pair_sb(isp, ib)
        b.has_floor = False
        mb = b.finalize()
        s = make_state(mb)
        kin = fwd_position(mb, s.qpos)
        con = collide(mb, kin.xpos, kin.xmat)
        # slot layout: 1 sphere-floor (inactive, no floor) + 1 sb pair
        d = float(con.dist[-1])
        n = np.asarray(con.normal[-1])
        assert d == pytest.approx(mj_depth, abs=1e-5)
        # same convention: MuJoCo canonicalizes the pair sphere-first,
        # so its geom1->geom2 normal (sphere toward box) equals our
        # "push body b (box) off body a (sphere)" normal
        np.testing.assert_allclose(n, mj_n, atol=1e-5)


class TestBoxOnBox:
    def test_small_box_rests_on_table_box(self):
        """Vertex-contact box-box: a small box dropped on a static table
        box settles on its top face (the handover table scene shape)."""
        b = ModelBuilder(dt=0.002)
        table = b.add_body("table", -1, mass=0.0)
        obj = b.add_body("obj", -1, pos=(0, 0, 0.30), mass=0.1,
                         inertia=(1.5e-5, 1.5e-5, 1.5e-5))
        b.add_joint("free", obj, JointType.FREE)
        it = b.add_box(table, pos=(0, 0, 0.10), size=(0.3, 0.2, 0.10),
                       floor=False)
        io = b.add_box(obj, size=(0.015, 0.015, 0.015), floor=False)
        b.add_pair_bb(it, io)
        mb = b.finalize()
        s2 = _roll(mb, make_state(mb), 500)
        # rests at table top (0.20) + half-size (0.015)
        assert float(s2.qpos[2]) == pytest.approx(0.215, abs=0.004)
        assert float(jnp.linalg.norm(s2.qvel)) < 0.05

    def test_box_falls_off_table_edge(self):
        """Pushed past the edge it tips off and falls to the floor —
        the handover 'box fell off table' transition's trigger."""
        b = ModelBuilder(dt=0.002)
        table = b.add_body("table", -1, mass=0.0)
        obj = b.add_body("obj", -1, pos=(0.27, 0, 0.23), mass=0.1,
                         inertia=(1.5e-5, 1.5e-5, 1.5e-5))
        b.add_joint("free", obj, JointType.FREE)
        it = b.add_box(table, pos=(0, 0, 0.10), size=(0.3, 0.2, 0.10),
                       floor=False)
        io = b.add_box(obj, size=(0.015, 0.015, 0.015))
        b.add_pair_bb(it, io)
        mb = b.finalize()
        s0 = make_state(mb, qvel=jnp.asarray([0.5, 0, 0, 0, 0, 0.]))
        s2 = _roll(mb, s0, 1000)
        assert float(s2.qpos[2]) < 0.05      # down on the floor
        assert float(s2.qpos[0]) > 0.3       # past the table edge


class TestCapsuleCapsule:
    def test_crossed_capsules_stack(self):
        """A capsule dropped across a fixed capsule rests on top of it
        (depth = sum of radii at the crossing point)."""
        b = ModelBuilder(dt=0.002)
        base = b.add_body("base", -1, mass=0.0)
        top = b.add_body("top", -1, pos=(0, 0, 0.3), mass=0.5,
                         inertia=(0.004, 0.004, 0.0006))
        b.add_joint("free", top, JointType.FREE)
        ic0 = b.add_capsule(base, p0=(-0.2, 0, 0.05), p1=(0.2, 0, 0.05),
                            radius=0.05, floor=False)
        ic1 = b.add_capsule(top, p0=(0, -0.2, 0), p1=(0, 0.2, 0),
                            radius=0.05)
        b.add_pair_cc(ic0, ic1)
        mb = b.finalize()
        s2 = _roll(mb, make_state(mb), 800)
        # rests crossing the fixed capsule: z = 0.05 (axis) + r + r
        assert float(s2.qpos[2]) == pytest.approx(0.15, abs=0.01)


class TestTendonLimits:
    def test_hamstring_clamps_joint_sum(self):
        """Fixed-tendon limit 0.5*q1 - 0.5*q2 in [-0.3, 0.3]: torquing
        both joints against the limit must stall at the bound (the
        humanoid hamstring semantics, humanoid.xml.patch)."""
        b = ModelBuilder(dt=0.002)
        b.gravity = (0.0, 0.0, 0.0)
        b1 = b.add_body("l1", -1, mass=1.0, inertia=(0.01,) * 3)
        j1 = b.add_joint("j1", b1, JointType.HINGE, axis=(0, 1, 0),
                         damping=0.5)
        b2 = b.add_body("l2", b1, pos=(0.3, 0, 0), mass=1.0,
                        inertia=(0.01,) * 3)
        j2 = b.add_joint("j2", b2, JointType.HINGE, axis=(0, 1, 0),
                         damping=0.5)
        b.add_actuator(j1, gear=1.0, ctrlrange=(-5, 5),
                       forcerange=(-5, 5))
        b.add_actuator(j2, gear=1.0, ctrlrange=(-5, 5),
                       forcerange=(-5, 5))
        b.add_tendon_limit([j1, j2], [0.5, -0.5], (-0.3, 0.3))
        b.has_floor = False
        mb = b.finalize()

        @functools.partial(jax.jit, static_argnums=(1,))
        def run(s, n):
            def body(c, _):
                s2, _ = step(mb, c, jnp.asarray([3.0, -3.0]))
                return s2, None
            return jax.lax.scan(body, s, None, length=n)[0]

        s2 = run(make_state(mb), 2000)
        length = 0.5 * float(s2.qpos[0]) - 0.5 * float(s2.qpos[1])
        assert length == pytest.approx(0.3, abs=0.02)
