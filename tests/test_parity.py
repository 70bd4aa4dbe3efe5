"""Golden-trajectory parity vs real CPU MuJoCo (BASELINE.md north star).

Two layers:

1. Fixture replay — `tests/fixtures/golden_mujoco.npz` holds qpos/qvel
   trajectories recorded by `tests/make_golden.py` from REAL MuJoCo on
   the reference's own scene (/root/reference/simulation/assets/
   world.xml: hfield floor + 12-DOF humanoid) under deterministic
   control sequences. We replay the identical controls through OUR
   engine and assert trajectory agreement. Tolerances are loose where
   ground contact dominates (our collision proxies are sphere clouds,
   not the reference meshes) and tight elsewhere.

2. Live contact-free comparison (runs when the `mujoco` wheel imports):
   the robot in free fall + joint springs/dampers — smooth dynamics
   only, where the two engines must agree to f32 accumulation error.
   This pins the passive-force model (incl. the free-joint spring to
   qpos0 the reference gets from world.xml:21 joint defaults).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from humanoid_mujoco_tpu.physics import humanoid
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.physics.step import step as engine_step

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "golden_mujoco.npz")
WORLD_XML = "/root/reference/simulation/assets/world.xml"

try:
    import mujoco
    _HAS_MUJOCO = os.path.exists(WORLD_XML)
except ImportError:  # pragma: no cover
    _HAS_MUJOCO = False


def _replay(m, qpos0, ctrl):
    stepj = jax.jit(lambda s, c: engine_step(m, s, c)[0])
    s = make_state(m, qpos=jnp.asarray(qpos0, dtype=jnp.float32))
    qs = []
    for k in range(ctrl.shape[0]):
        s = stepj(s, jnp.asarray(ctrl[k], dtype=jnp.float32))
        qs.append(np.asarray(s.qpos))
    return np.stack(qs)


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(FIXTURE), (
        "golden fixture missing — run tests/make_golden.py where the "
        "mujoco wheel is available")
    return np.load(FIXTURE)


@pytest.fixture(scope="module")
def floor_model():
    return humanoid.build_humanoid(dtype=jnp.float32)


class TestGoldenReplay:
    def test_actuator_order_matches(self, golden, floor_model):
        # make_golden records MuJoCo's actuator document order; our
        # builder must agree so ctrl columns line up un-permuted
        ref = [str(s) for s in golden["act_names"]]
        assert ref == list(humanoid.ACTUATED_JOINT_ORDER)

    def test_zero_ctrl_trajectory(self, golden, floor_model):
        """Standing drop-settle under zero torques, 0.5 s on the floor:
        both engines settle the same stand pose; tolerance covers the
        sphere-proxy vs mesh contact difference."""
        qs = _replay(floor_model, golden["qpos0"], golden["zero_ctrl"])
        ref = golden["zero_qpos"]
        err = np.abs(qs - ref)
        assert err[:, 2].max() < 0.03, f"root height err {err[:, 2].max()}"
        assert err[:, 7:].max() < 0.10, f"hinge err {err[:, 7:].max()}"
        # no fall in either engine
        assert qs[-1][2] > ref[-1][2] - 0.05

    def test_sine_ctrl_short_horizon(self, golden, floor_model):
        """Multi-sine torque wiggle: chaotic after ~0.1 s (free-swinging
        arms), so parity is asserted over the first 25 steps (50 ms) —
        the horizon that matters for MPC linearization quality."""
        qs = _replay(floor_model, golden["qpos0"], golden["sine_ctrl"])
        ref = golden["sine_qpos"]
        err = np.abs(qs[:25] - ref[:25])
        assert err.max() < 0.25, f"50ms parity err {err.max()}"
        # longer horizon: trajectories stay in the same regime (no fall,
        # no divergence) even where pointwise parity is lost
        assert abs(qs[124][2] - ref[124][2]) < 0.08


@pytest.mark.skipif(not _HAS_MUJOCO, reason="mujoco wheel not available")
class TestLiveSmoothParity:
    def test_contact_free_fall(self):
        """1 m free fall with joint+root springs active: smooth dynamics
        must match MuJoCo to accumulation error (<2e-3 rad/m @ 0.2 s)."""
        m = humanoid.build_humanoid(dtype=jnp.float32, with_floor=False)
        mm = mujoco.MjModel.from_xml_path(WORLD_XML)
        d = mujoco.MjData(mm)
        q0 = np.asarray(humanoid.stand_qpos(m)).astype(np.float64)
        q0[2] += 1.0
        d.qpos[:] = q0
        s = make_state(m, qpos=jnp.asarray(q0, dtype=jnp.float32))
        stepj = jax.jit(lambda s: engine_step(m, s, jnp.zeros(12))[0])
        for _ in range(100):
            d.ctrl[:] = 0
            mujoco.mj_step(mm, d)
            s = stepj(s)
        err = np.abs(np.asarray(s.qpos) - d.qpos)
        assert err.max() < 2e-3, f"smooth-dynamics err {err.max()}"

    def test_spring_reference_matches(self):
        """Our qpos_spring must equal mjModel.qpos_spring (free root
        tethered to the XML stand pose, hinges to springref 0)."""
        m = humanoid.build_humanoid(dtype=jnp.float32)
        mm = mujoco.MjModel.from_xml_path(WORLD_XML)
        np.testing.assert_allclose(np.asarray(m.qpos_spring),
                                   mm.qpos_spring, atol=1e-6)
        np.testing.assert_allclose(np.asarray(m.dof_damping),
                                   mm.dof_damping, atol=1e-9)
        np.testing.assert_allclose(np.asarray(m.dof_armature),
                                   mm.dof_armature, atol=1e-9)
