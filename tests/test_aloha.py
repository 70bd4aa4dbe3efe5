"""ALOHA Bimanual Handover task tests.

Mirrors the reference's task-test bar (mjpc/test/tasks/task_test.cc:
model builds + residual dims; python agent_test.py: planning makes
progress on the task) for the bimanual handover
(mjpc/tasks/bimanual/handover/handover.cc).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from humanoid_mujoco_tpu import mpc
from humanoid_mujoco_tpu.ops.spline import SplineOrder
from humanoid_mujoco_tpu.physics.math import quat_rotate
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.physics.step import forward, step
from humanoid_mujoco_tpu.planners import (SamplingConfig, init_policy,
                                          sampling_plan)
from humanoid_mujoco_tpu.tasks import registry
from humanoid_mujoco_tpu.tasks.aloha import (_GRASP_PTS, aloha_home_qpos,
                                             aloha_model, handover_task,
                                             home_ctrl)


def _info(m, s, ctrl=None):
    c = jnp.zeros(m.nu) if ctrl is None else ctrl
    _, _, _, info = forward(m, s, c)
    return info


class TestModel:
    def test_registered_and_dims(self):
        assert "Bimanual Handover" in registry.list_tasks()
        m = registry.task_model("Bimanual Handover")
        task = registry.get_task("Bimanual Handover")
        assert m.nu == 16 and m.nv == 22 and m.nq == 23
        s = make_state(m, qpos=aloha_home_qpos(m))
        res = task.residual(m, s, _info(m, s), jnp.zeros(m.nu))
        assert res.shape == (task.nres,) == (10,)
        assert jnp.all(jnp.isfinite(res))
        # not touching the cube at home -> grasp term is exactly 1
        np.testing.assert_allclose(float(res[6]), 1.0)

    def test_home_settles(self):
        """Position servos hold the keyframe pose; the cube rests on
        the table plane (the mjx_scene.xml table at z~0)."""
        m = aloha_model()
        q0 = aloha_home_qpos(m)
        s = make_state(m, qpos=q0)
        c = home_ctrl(m)

        @jax.jit
        def run(s):
            def body(s, _):
                s2, info = step(m, s, c)
                return s2, info.diverged
            return jax.lax.scan(body, s, None, length=200)

        s2, div = run(s)
        assert not bool(jnp.any(div))
        # cube on the table: z == half size (0.015) within contact slack
        assert abs(float(s2.qpos[18]) - 0.015) < 5e-3
        # arms hold the keyframe within servo droop
        drift = np.abs(np.asarray(s2.qpos[:16]) - np.asarray(q0[:16]))
        assert drift.max() < 0.15, drift

    def test_grippers_face_each_other(self):
        """The right arm base is yawed 180 deg; at the symmetric home
        pose the gripper sites mirror across x=0."""
        m = aloha_model()
        info = _info(m, make_state(m, qpos=aloha_home_qpos(m)))
        gl = np.asarray(info.site_xpos[m.struct.site_id("left/gripper")])
        gr = np.asarray(info.site_xpos[m.struct.site_id("right/gripper")])
        np.testing.assert_allclose(gl[0], -gr[0], atol=1e-5)
        np.testing.assert_allclose(gl[1:], gr[1:], atol=1e-5)


class TestGraspTerm:
    """The handover.cc:57-123 contact-normal grasp score, re-derived as
    pure geometry: synthetic finger poses bracketing the cube."""

    def _posed_residual(self, m, task, fingers):
        """Residual with the four finger bodies teleported to the given
        world poses (dict name -> (pos, quat))."""
        s = make_state(m, qpos=aloha_home_qpos(m))
        info = _info(m, s)
        xpos, xquat = info.xpos, info.xquat
        for name, (p, q) in fingers.items():
            bid = m.struct.body_id(name)
            xpos = xpos.at[bid].set(jnp.asarray(p, dtype=xpos.dtype))
            xquat = xquat.at[bid].set(jnp.asarray(q, dtype=xquat.dtype))
        info = dataclasses.replace(info, xpos=xpos, xquat=xquat)
        return task.residual(m, s, info, jnp.zeros(m.nu))

    def _finger_pose_touching(self, ysign, face_dir):
        """Pose a finger body so its grasp spheres sit just off the
        cube face whose outward normal is `face_dir` (+-x unit)."""
        # mean grasp-point offset in the finger frame
        mean_local = np.mean([(g[0], ysign * g[1], g[2])
                              for g in _GRASP_PTS], axis=0)
        # rotate finger frame so local +y*ysign points against face_dir
        # (spheres approach the face from outside)
        if face_dir[0] > 0:      # spheres on the +x face, pointing -x
            quat = (0.7071068, 0, 0, -ysign * 0.7071068)
        else:                    # spheres on the -x face, pointing +x
            quat = (0.7071068, 0, 0, ysign * 0.7071068)
        # choose body pos so the rotated mean lands 2 mm off the face
        target = np.array([face_dir[0] * (0.015 + 0.006 + 0.002),
                           0.0, 0.015])
        rot_mean = np.asarray(
            jax.device_get(quat_rotate(jnp.asarray(quat),
                                       jnp.asarray(mean_local))))
        pos = target - rot_mean
        return tuple(pos), quat

    def test_opposed_fingers_score_zero(self):
        """Both right-hand fingers on opposite cube faces -> normals
        oppose -> grasp -> 0 (geometric mean with ungrasping left hand
        stays sqrt(0*?)=0 ... handover.cc:101-123)."""
        m = aloha_model()
        task = handover_task()
        cube = np.array([0.0, 0.0, 0.015])
        fingers = {
            "right/left_finger_link": self._finger_pose_touching(
                -1.0, np.array([1.0, 0, 0])),
            "right/right_finger_link": self._finger_pose_touching(
                1.0, np.array([-1.0, 0, 0])),
        }
        res = self._posed_residual(m, task, fingers)
        grasp = float(res[6])
        assert grasp < 0.35, grasp

    def test_single_finger_scores_one(self):
        m = aloha_model()
        task = handover_task()
        fingers = {
            "right/left_finger_link": self._finger_pose_touching(
                -1.0, np.array([1.0, 0, 0])),
        }
        res = self._posed_residual(m, task, fingers)
        np.testing.assert_allclose(float(res[6]), 1.0)

    def test_same_side_fingers_score_high(self):
        """Both fingers pressing the same face -> parallel normals ->
        score ~1 (a pinchless push is not a grasp)."""
        m = aloha_model()
        task = handover_task()
        p, q = self._finger_pose_touching(-1.0, np.array([1.0, 0, 0]))
        p2 = (p[0], p[1] + 0.004, p[2])
        fingers = {"right/left_finger_link": (p, q),
                   "right/right_finger_link": (p2, q)}
        res = self._posed_residual(m, task, fingers)
        assert float(res[6]) > 0.9


class TestTransition:
    def test_target_respawns_on_success(self):
        """handover.cc:133-155: once the cube is within 1 cm of the
        target, the target jumps across the table into the x-flipped
        band U(.3,.4) x +-U(.2,.3) x U(.25,.7)."""
        m = aloha_model()
        s = make_state(m, qpos=aloha_home_qpos(m))
        s = dataclasses.replace(s, time=jnp.asarray(1.0, s.time.dtype))
        info = _info(m, s)
        box = np.asarray(info.xpos[m.struct.body_id("box")])

        far = handover_task().set_mocap("box_goal", pos=(0.4, -0.25, 0.3))
        out = far.transition(m, s, info)
        np.testing.assert_allclose(np.asarray(out.mocap_pos[0]),
                                   [0.4, -0.25, 0.3])

        near = handover_task().set_mocap("box_goal", pos=tuple(box))
        out = near.transition(m, s, info)
        t = np.asarray(out.mocap_pos[0])
        assert np.linalg.norm(t - box) > 0.01
        # target was at x=0 (not >0) -> flip=+1 -> respawn on the +x side
        assert 0.3 <= t[0] <= 0.4
        assert 0.2 <= abs(t[1]) <= 0.3
        assert 0.25 <= t[2] <= 0.7


class TestPlanning:
    def test_planner_iterations_reduce_cost(self):
        """Repeated sampling plan iterations on the home state reduce
        the best return (the agent_test.py 'cost decreases after
        planner_step' bar; the closed-loop cube lift/carry runs at TPU
        scale in bench.py's handover config)."""
        m = aloha_model()
        task = handover_task()
        s0 = make_state(m, qpos=aloha_home_qpos(m))
        cfg = SamplingConfig(nsample=16, nknots=3, horizon=16,
                             order=SplineOrder.LINEAR, solver_iters=1,
                             exploration=jnp.asarray(0.08),
                             exploration2=jnp.asarray(0.4))
        pm = mpc.make_plan_model(m, 0.01)
        pol = init_policy(m, cfg.nknots)
        pol = dataclasses.replace(
            pol, values=jnp.tile(home_ctrl(m)[None], (cfg.nknots, 1)))

        plan = jax.jit(lambda p, k: sampling_plan(pm, task, cfg, p,
                                                  s0, k))
        key = jax.random.PRNGKey(0)
        returns = []
        for _ in range(10):
            key, k = jax.random.split(key)
            pol, info = plan(pol, k)
            returns.append(float(info.best_return))
        assert np.all(np.isfinite(returns))
        assert returns[-1] < returns[0], returns
        # the planner finds strictly better candidates along the way
        assert min(returns) < 0.95 * returns[0], returns
