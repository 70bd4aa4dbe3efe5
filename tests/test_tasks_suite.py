"""Task-library tests: Cartpole / Acrobot / Walker end-to-end.

Mirrors the reference's task test strategy (SURVEY §4): every registered
task's model builds and its residual dims match the term specs
(test/tasks/task_test.cc), plus planner end-to-end "cost decreases /
goal approached" checks on the small models (the particle/cartpole
pattern of test/sampling_planner/sampling_planner_test.cc).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mujoco_tpu import mpc
from humanoid_mujoco_tpu.ops.spline import SplineOrder
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.physics.step import forward, step
from humanoid_mujoco_tpu.planners import (SamplingConfig, init_policy,
                                          sampling_plan)
from humanoid_mujoco_tpu.tasks import registry
from humanoid_mujoco_tpu.tasks.acrobot import (acrobot_home_qpos,
                                               acrobot_model, acrobot_task)
from humanoid_mujoco_tpu.tasks.cartpole import (cartpole_home_qpos,
                                                cartpole_model,
                                                cartpole_task)
from humanoid_mujoco_tpu.tasks.walker2d import (walker_model,
                                                walker_stand_qpos,
                                                walker_task)


class TestRegistry:
    def test_full_reference_registry_parity(self):
        """Every task the reference registers (tasks/tasks.cc:48-75)
        has an entry here — the 24-task line-by-line inventory."""
        names = registry.list_tasks()
        reference_24 = (
            "Acrobot", "Allegro", "Bimanual Handover", "Bimanual Insert",
            "Bimanual Reorient", "Cartpole", "FreeFingers",
            "Humanoid Cap Stand", "Humanoid Interact", "Humanoid Stand",
            "Humanoid Track", "Humanoid Walk", "PickAndPlace", "OP3",
            "Panda", "Particle", "ParticleFixed", "Rubik", "Shadow",
            "Quadrotor", "Quadruped Flat", "Quadruped Hill", "Swimmer",
            "Walker")
        assert len(reference_24) == 24
        missing = [n for n in reference_24 if n not in names]
        assert not missing, missing

    @pytest.mark.parametrize("name", ["Acrobot", "Cartpole", "Swimmer",
                                      "Walker", "FreeFingers", "OP3",
                                      "Bimanual Reorient", "Allegro",
                                      "Shadow", "PickAndPlace",
                                      "Humanoid Track", "Rubik",
                                      "Humanoid Interact",
                                      "Bimanual Insert"])
    def test_model_and_residual_dims(self, name):
        """Every task's model builds; residual length == sum of term
        dims (the task_test.cc dim assertion)."""
        m = registry.task_model(name)
        task = registry.get_task(name)
        s = make_state(m)
        _, _, _, info = forward(m, s, jnp.zeros(m.nu))
        res = task.residual(m, s, info, jnp.zeros(m.nu))
        assert res.shape == (task.nres,)
        assert jnp.all(jnp.isfinite(res))


class TestCartpole:
    def test_passive_hang_is_stable(self):
        m = cartpole_model()
        s = make_state(m, qpos=cartpole_home_qpos(m))

        @jax.jit
        def run(s):
            def body(s, _):
                s2, info = step(m, s, jnp.zeros(m.nu))
                return s2, info.diverged
            return jax.lax.scan(body, s, None, length=200)

        s2, div = run(s)
        assert not bool(jnp.any(div))
        # pole stays near hanging (tiny damping, no drive)
        assert abs(float(s2.qpos[1]) - 3.142) < 0.2

    def test_swingup_ilqg_cost_decreases(self):
        """iLQG on the cartpole swing-up: plan return drops steadily
        from a perturbed hang (the ilqg_test.cc 'cost decreases'
        pattern; exact hanging is a zero-gradient stationary point, so
        the start is offset — the GUI reference breaks the symmetry
        with live perturbations instead)."""
        from humanoid_mujoco_tpu.planners.ilqg import (ILQGConfig,
                                                       ilqg_init,
                                                       ilqg_plan)
        m = cartpole_model()
        task = cartpole_task()
        q0 = cartpole_home_qpos(m).at[1].set(jnp.pi - 0.25)
        s0 = make_state(m, qpos=q0)
        pm_ = mpc.make_plan_model(m, 0.02)
        cfg = ILQGConfig(horizon=80, solver_iters=2,
                         deriv_solver_iters=2)
        ps = ilqg_init(pm_, cfg, s0)
        plan = jax.jit(lambda p, s, k: ilqg_plan(pm_, task, cfg, p, s, k))
        key = jax.random.PRNGKey(0)
        first = None
        for i in range(20):
            key, k = jax.random.split(key)
            ps, info = plan(ps, s0, k)
            if first is None:
                first = float(info.best_return)
        last = float(info.best_return)
        assert jnp.isfinite(last)
        assert last < 0.85 * first, (first, last)


class TestAcrobot:
    def test_tip_fk(self):
        m = acrobot_model()
        s_up = make_state(m, qpos=jnp.zeros(m.nq))
        _, _, _, info = forward(m, s_up, jnp.zeros(m.nu))
        np.testing.assert_allclose(np.asarray(info.site_xpos[0]),
                                   [0.0, 0.0, 4.0], atol=1e-5)
        s_dn = make_state(m, qpos=acrobot_home_qpos(m))
        _, _, _, info = forward(m, s_dn, jnp.zeros(m.nu))
        np.testing.assert_allclose(np.asarray(info.site_xpos[0]),
                                   [0.0, 0.0, 0.0], atol=1e-3)

    def test_energy_pumping_mpc(self):
        """Sampling MPC on the underactuated acrobot pumps energy: the
        tip rises well above the hanging height within 2 s."""
        m = acrobot_model()
        task = acrobot_task()
        s0 = make_state(m, qpos=acrobot_home_qpos(m))
        pm_ = mpc.make_plan_model(m, 0.05)
        cfg = SamplingConfig(nsample=48, nknots=6, horizon=40,
                             order=SplineOrder.LINEAR, solver_iters=2,
                             exploration=jnp.asarray(0.6))
        pol = init_policy(m, cfg.nknots)

        res = jax.jit(lambda s, p, k: mpc.mpc_rollout(
            m, pm_, task, lambda mm, tt, pp, ss, kk: sampling_plan(
                mm, tt, cfg, pp, ss, kk),
            p, s, k, ncycle=40, steps_per_plan=5,
            action_fn=mpc.spline_action_fn(cfg.order),
            sim_solver_iters=2))(s0, pol, jax.random.PRNGKey(0))

        _, _, _, info = forward(m, res.final_state, jnp.zeros(m.nu))
        tip_z = float(info.site_xpos[m.struct.site_id("tip")][2])
        assert jnp.all(jnp.isfinite(res.costs))
        assert tip_z > 1.0, tip_z   # started at 0.0, shoulder at 2.0


class TestQuadruped:
    def test_flat_settles_standing(self):
        """PD home pose on flat ground: contact supports the weight, no
        divergence (a1.xml home keyframe)."""
        from humanoid_mujoco_tpu.tasks.quadruped import (home_ctrl,
                                                         quadruped_home_qpos,
                                                         quadruped_model)
        m = quadruped_model()
        s = make_state(m, qpos=quadruped_home_qpos(m))

        @jax.jit
        def run(s):
            def body(st, _):
                st2, info = step(m, st, home_ctrl(m))
                return st2, (info.diverged, jnp.sum(info.contact_force))
            return jax.lax.scan(body, s, None, length=300)

        s2, (div, fn) = run(s)
        assert not bool(jnp.any(div))
        weight = float(9.81 * jnp.sum(m.body_mass))
        np.testing.assert_allclose(float(fn[-1]), weight, rtol=0.05)
        assert abs(float(s2.qpos[2]) - 0.27) < 0.05

    def test_hill_settles_on_slope(self):
        """Hill variant: dropped at a ring waypoint, the A1 lands on the
        heightfield slope and stands at terrain + trunk height."""
        from humanoid_mujoco_tpu.tasks.quadruped import (home_ctrl,
                                                         quadruped_home_qpos)
        from humanoid_mujoco_tpu.tasks.quadruped_hill import (
            _hill_height_np, quadruped_hill_model)
        m = quadruped_hill_model()
        q = np.array(quadruped_home_qpos(m))
        q[0], q[2] = 1.6, _hill_height_np(1.6, 0.0) + 0.30
        s = make_state(m, qpos=jnp.asarray(q, jnp.float32))

        @jax.jit
        def run(s):
            def body(st, _):
                st2, info = step(m, st, home_ctrl(m))
                return st2, info.diverged
            return jax.lax.scan(body, s, None, length=400)

        s2, div = run(s)
        assert not bool(jnp.any(div))
        terrain = _hill_height_np(float(s2.qpos[0]), float(s2.qpos[1]))
        assert abs(float(s2.qpos[2]) - terrain - 0.26) < 0.06

    def test_hill_waypoint_transition(self):
        """QuadrupedHill::TransitionLocked (quadruped.cc:776-817): the
        waypoint advances (and wraps) only within both tolerances."""
        from humanoid_mujoco_tpu.tasks.quadruped import quadruped_home_qpos
        from humanoid_mujoco_tpu.tasks.quadruped_hill import (
            quadruped_hill_model, quadruped_hill_task, waypoints)
        m = quadruped_hill_model()
        task = quadruped_hill_task()
        wpos, wquat = waypoints()

        def at_pose(pos, quat):
            q = np.array(quadruped_home_qpos(m))
            q[:3] = np.asarray(pos)
            q[3:7] = np.asarray(quat)
            s = make_state(m, qpos=jnp.asarray(q, jnp.float32))
            _, _, _, info = forward(m, s, jnp.zeros(m.nu))
            return s, info

        # at waypoint 0 with its heading -> advance to 1
        s, info = at_pose(wpos[0], wquat[0])
        t2 = task.transition(m, s, info)
        assert int(t2.mode) == 1
        np.testing.assert_allclose(np.asarray(t2.mocap_pos[0]),
                                   np.asarray(wpos[1]), atol=1e-5)
        # right position, wrong heading -> stay
        s, info = at_pose(wpos[0], [1.0, 0.0, 0.0, 0.0])
        t3 = task.transition(m, s, info)
        assert int(t3.mode) == 0
        # wrap: mode N-1 at its waypoint -> 0
        tN = t2.set_mode(7)
        tN = tN.set_mocap("goal", pos=np.asarray(wpos[7]))
        import dataclasses as dc
        tN = dc.replace(tN, mocap_quat=tN.mocap_quat.at[0].set(wquat[7]))
        s, info = at_pose(wpos[7], wquat[7])
        t4 = tN.transition(m, s, info)
        assert int(t4.mode) == 0


class TestSwimmer:
    def test_fluid_drag_decelerates_coasting(self):
        """A coasting swimmer (no actuation) loses speed to the
        density-1000 medium — the hydrodynamics the reference model
        relies on for propulsion (swimmer.xml.patch density=1000 with
        contact disabled)."""
        from humanoid_mujoco_tpu.tasks.swimmer import swimmer_model
        m = swimmer_model()
        m_ = m

        @jax.jit
        def coast(v0):
            s = make_state(m_).replace(qvel=v0)

            def body(s, _):
                s2, _ = step(m_, s, jnp.zeros(m_.nu))
                return s2, None
            return jax.lax.scan(body, s, None, length=100)[0].qvel

        z = jnp.zeros(m.nv)
        v_stream = coast(z.at[1].set(0.3))[1]   # along the body axis
        v_broad = coast(z.at[0].set(0.3))[0]    # broadside
        # both decelerate, neither reverses
        assert 0.0 < float(v_stream) < 0.3
        assert 0.0 <= float(v_broad) < 0.3
        # anisotropy: broadside drag (area d_y*d_z) dominates streamwise
        # (d_x*d_z) — the asymmetry undulation converts into thrust
        assert float(v_broad) < 0.3 * float(v_stream), (
            float(v_broad), float(v_stream))

    def test_undulation_swims(self):
        """An open-loop traveling wave down the joints propels the
        swimmer — anisotropic inertia-box drag converts undulation into
        thrust (no contacts to push on)."""
        from humanoid_mujoco_tpu.tasks.swimmer import swimmer_model
        m = swimmer_model()
        s = make_state(m)

        @jax.jit
        def run(s):
            def body(st, i):
                t = i.astype(jnp.float32) * 0.01
                k = jnp.arange(5, dtype=jnp.float32)
                ctrl = jnp.sin(2 * jnp.pi * t - 1.2 * k)
                st2, _ = step(m, st, ctrl)
                return st2, None
            return jax.lax.scan(body, s, jnp.arange(400))[0]

        s2 = run(s)
        assert float(jnp.linalg.norm(s2.qpos[:2])) > 0.2
        assert bool(jnp.all(jnp.isfinite(s2.qvel)))

    def test_mpc_swims_toward_target(self):
        """Sampling MPC closes on the target (sampling_planner_test.cc
        'goal approached' pattern, swimmer task.xml Distance term)."""
        from humanoid_mujoco_tpu.tasks.swimmer import (swimmer_model,
                                                       swimmer_task)
        m = swimmer_model()
        task = swimmer_task(target=(0.0, -0.5))
        s0 = make_state(m)
        pm_ = mpc.make_plan_model(m, 0.02)
        cfg = SamplingConfig(nsample=40, nknots=6, horizon=60,
                             order=SplineOrder.LINEAR, solver_iters=1,
                             exploration=jnp.asarray(0.3))
        pol = init_policy(m, cfg.nknots)

        res = jax.jit(lambda s, p, k: mpc.mpc_rollout(
            m, pm_, task, lambda mm, tt, pp, ss, kk: sampling_plan(
                mm, tt, cfg, pp, ss, kk),
            p, s, k, ncycle=40, steps_per_plan=10,
            action_fn=mpc.spline_action_fn(cfg.order),
            sim_solver_iters=1))(s0, pol, jax.random.PRNGKey(2))

        assert jnp.all(jnp.isfinite(res.costs))
        d0 = float(jnp.linalg.norm(jnp.asarray([0.0, -0.06]) -
                                   jnp.asarray([0.0, -0.5])))
        qf = res.final_state.qpos
        # head xy after the run (nose is 0.06 ahead, ignore heading)
        df = float(jnp.linalg.norm(qf[:2] - jnp.asarray([0.0, -0.5])))
        assert df < 0.75 * d0, (d0, df)

    def test_transition_respawns_target(self):
        """Swimmer::TransitionLocked (swimmer.cc:49-60): target jumps
        into [-0.8, 0.8]^2 once the nose is within 0.04."""
        from humanoid_mujoco_tpu.tasks.swimmer import (swimmer_model,
                                                       swimmer_task)
        m = swimmer_model()
        s = make_state(m)
        _, _, _, info = forward(m, s, jnp.zeros(m.nu))
        nose = info.site_xpos[m.struct.site_id("nose")]
        far = swimmer_task(target=(0.8, 0.8)).transition(m, s, info)
        np.testing.assert_allclose(np.asarray(far.mocap_pos[0, :2]),
                                   [0.8, 0.8])
        near = swimmer_task(
            target=(float(nose[0]), float(nose[1]))).transition(m, s, info)
        moved = np.asarray(near.mocap_pos[0, :2])
        assert np.linalg.norm(moved - np.asarray(nose[:2])) > 0.04
        assert np.all(np.abs(moved) <= 0.8)


class TestWalker:
    def test_passive_stand(self):
        """Upright rest is a contact equilibrium: total normal force ==
        weight, no divergence, torso stays up (passive — the legs are at
        rest within their limits)."""
        m = walker_model()
        s = make_state(m, qpos=walker_stand_qpos(m))

        @jax.jit
        def run(s):
            def body(s, _):
                s2, info = step(m, s, jnp.zeros(m.nu))
                return s2, info.contact_force
            return jax.lax.scan(body, s, None, length=300)

        s2, fn = run(s)
        weight = float(9.81 * jnp.sum(m.body_mass))
        np.testing.assert_allclose(float(fn[-1].sum()), weight, rtol=0.05)
        assert abs(float(s2.qpos[0])) < 0.05       # rootz near start
        assert abs(float(s2.qpos[2])) < 0.15       # pitch small

    def test_stand_mpc_holds_height(self):
        """Sampling MPC holds the walker at the height goal for 0.6 s
        (walker.cc residual, task.xml Height Goal=1.2)."""
        m = walker_model(dt=0.005)
        task = walker_task()
        s0 = make_state(m, qpos=walker_stand_qpos(m))
        pm_ = mpc.make_plan_model(m, 0.02)
        cfg = SamplingConfig(nsample=32, nknots=3, horizon=20,
                             order=SplineOrder.ZERO, solver_iters=4,
                             exploration=jnp.asarray(0.1))
        pol = init_policy(m, cfg.nknots)

        res = jax.jit(lambda s, p, k: mpc.mpc_rollout(
            m, pm_, task, lambda mm, tt, pp, ss, kk: sampling_plan(
                mm, tt, cfg, pp, ss, kk),
            p, s, k, ncycle=30, steps_per_plan=4,
            action_fn=mpc.spline_action_fn(cfg.order),
            sim_solver_iters=4))(s0, pol, jax.random.PRNGKey(1))

        assert jnp.all(jnp.isfinite(res.costs))
        # torso height (qpos[0] is rootz offset from the 1.3 m start)
        final_h = 1.3 + float(res.final_state.qpos[0])
        assert final_h > 1.0, final_h
        assert abs(float(res.final_state.qpos[2])) < 0.5  # still upright


class TestOP3:
    def test_keyframe_height_and_settle(self):
        """The transcribed OP3 (tools/gen_op3_data.py) reproduces the
        task keyframe: head-feet height equals the 0.38 Height Goal at
        'home', and position servos hold the crouch in contact
        equilibrium (normal force == weight)."""
        from humanoid_mujoco_tpu.physics.op3_data import KEYFRAMES
        from humanoid_mujoco_tpu.tasks.op3 import (op3_home_qpos,
                                                   op3_model, op3_task)
        m = op3_model()
        task = op3_task()
        s = make_state(m, qpos=op3_home_qpos(m))
        _, _, _, info = forward(m, s, jnp.zeros(m.nu))
        res = task.residual(m, s, info, jnp.zeros(m.nu))
        assert abs(float(res[0])) < 0.02       # height err vs goal

        c = jnp.asarray(np.asarray(KEYFRAMES["home"])[7:],
                        dtype=m.body_pos.dtype)

        @jax.jit
        def run(s):
            def body(st, _):
                st2, inf = step(m, st, c)
                return st2, (inf.diverged, jnp.sum(inf.contact_force))
            return jax.lax.scan(body, s, None, length=300)

        s2, (div, fn) = run(s)
        assert not bool(jnp.any(div))
        w = float(9.81 * jnp.sum(m.body_mass))
        np.testing.assert_allclose(float(fn[-1]), w, rtol=0.05)

    def test_mode_transition_sets_height_goal(self):
        from humanoid_mujoco_tpu.tasks.op3 import (op3_home_qpos,
                                                   op3_model, op3_task)
        m = op3_model()
        s = make_state(m, qpos=op3_home_qpos(m))
        _, _, _, info = forward(m, s, jnp.zeros(m.nu))
        t = op3_task().set_mode("Handstand").transition(m, s, info)
        assert float(t.params[0]) == pytest.approx(0.57)  # kModeHeight[1]
        t = t.set_mode("Stand").transition(m, s, info)
        assert float(t.params[0]) == pytest.approx(0.38)


class TestBimanualReorient:
    def test_cross_settles_and_residual(self):
        from humanoid_mujoco_tpu.tasks.aloha import (aloha_reorient_model,
                                                     home_ctrl,
                                                     reorient_home_qpos,
                                                     reorient_task)
        m = aloha_reorient_model()
        task = reorient_task()
        s = make_state(m, qpos=reorient_home_qpos(m))
        _, _, _, info = forward(m, s, home_ctrl(m))
        res = task.residual(m, s, info, home_ctrl(m))
        assert res.shape == (task.nres,) == (26,)
        # not grasping at home -> both per-hand scores exactly 1
        np.testing.assert_allclose(np.asarray(res[6:8]), 1.0)

        c = home_ctrl(m)

        @jax.jit
        def run(s):
            def body(st, _):
                st2, inf = step(m, st, c)
                return st2, inf.diverged
            return jax.lax.scan(body, s, None, length=200)

        s2, div = run(s)
        assert not bool(jnp.any(div))
        # the cross rests on the table plane (arm radius 0.015 +
        # center offset)
        assert 0.01 < float(s2.qpos[18]) < 0.05


class TestHumanoidTrack:
    """Mocap-tracking task (tracking.cc): the transcribed humanoid +
    marker data reproduce the reference's tracking geometry."""

    @pytest.mark.parametrize("mode", [0, 8, 9])   # Jump, Run, Walk
    def test_clip_start_markers_match_pose(self, mode):
        """At a clip's first keyframe (its own qpos), the centered
        marker-vs-site errors are small: the 16 tracking sites
        (humanoid.xml.patch) line up with the CMU markers."""
        from humanoid_mujoco_tpu.tasks.humanoid_track import (
            start_state, track_model, track_task)
        m = track_model()
        task = track_task().set_mode(mode)
        s = start_state(m, mode)
        _, _, _, info = forward(m, s, jnp.zeros(m.nu))
        res = task.residual(m, s, info, jnp.zeros(m.nu))
        assert res.shape == (141,)
        assert bool(jnp.all(jnp.isfinite(res)))
        # centroid + per-marker centered errors (SmoothAbs block)
        assert float(jnp.linalg.norm(res[42:45])) < 0.08
        assert float(jnp.max(jnp.abs(res[45:93]))) < 0.12

    def test_clip_time_indexing(self):
        """The residual follows the clip: advancing sim time by 1/30 s
        moves the marker targets to the next frame (tracking.cc
        ComputeInterpolationValues)."""
        import dataclasses

        from humanoid_mujoco_tpu.tasks.humanoid_track import (
            _frames, track_model, track_task)
        m = track_model()
        task = track_task().set_mode(9)            # Walk
        dtype = jnp.float32
        f0, _ = _frames(task, jnp.asarray(0.0, dtype), dtype)
        f1, _ = _frames(task, jnp.asarray(1.0 / 30.0, dtype), dtype)
        fh, _ = _frames(task, jnp.asarray(0.5 / 30.0, dtype), dtype)
        # halfway frame is the linear interpolation of the neighbors
        np.testing.assert_allclose(np.asarray(fh),
                                   0.5 * (np.asarray(f0)
                                          + np.asarray(f1)), atol=1e-5)
        assert float(jnp.max(jnp.abs(f1 - f0))) > 1e-4   # clip moves


class TestHands:
    """Allegro / Shadow cube-reorientation tasks (allegro.cc,
    shadow_reorient/hand.cc): the transcribed hands hold their task
    keyframe grasp without divergence."""

    @pytest.mark.parametrize("hand", ["allegro", "shadow"])
    def test_keyframe_grasp_holds(self, hand):
        from humanoid_mujoco_tpu.tasks import hands as H
        mk = H.allegro_model if hand == "allegro" else H.shadow_model
        hq = (H.allegro_home_qpos if hand == "allegro"
              else H.shadow_home_qpos)
        tk = H.allegro_task if hand == "allegro" else H.shadow_task
        key = H._KEY_HAND[hand]
        m = mk()
        task = tk()
        s = make_state(m, qpos=hq(m))
        _, _, _, info = forward(m, s, jnp.zeros(m.nu))
        res = task.residual(m, s, info, jnp.zeros(m.nu))
        assert res.shape == (task.nres,)
        assert bool(jnp.all(jnp.isfinite(res)))

        c = jnp.asarray(np.asarray(key), dtype=m.body_pos.dtype)

        @jax.jit
        def run(s):
            def body(st, _):
                st2, inf = step(m, st, c)
                return st2, (inf.diverged, st2.qpos[len(key) + 2])
            return jax.lax.scan(body, s, None, length=300)

        s2, (div, cz) = run(s)
        assert not bool(jnp.any(div))
        # cube stays at/above the hand, not flung away
        cube_half = H._CUBE[hand]["half"]
        assert float(cz[-1]) > cube_half - 1e-3
        xy = np.asarray(s2.qpos[len(key):len(key) + 2])
        start = np.asarray(H._CUBE[hand]["pos"][:2])
        assert np.linalg.norm(xy - start) < 0.15

    def test_goal_respawns_on_orientation_match(self):
        import dataclasses as dc

        from humanoid_mujoco_tpu.tasks import hands as H
        m = H.allegro_model()
        s = make_state(m, qpos=H.allegro_home_qpos(m))
        s = dc.replace(s, time=jnp.asarray(1.0, s.time.dtype))
        _, _, _, info = forward(m, s, jnp.zeros(m.nu))
        cube_q = np.asarray(info.xquat[m.struct.body_id("cube")])
        # goal == cube orientation -> respawn; far goal -> unchanged
        t = H.allegro_task()
        t = dc.replace(t, mocap_quat=t.mocap_quat.at[0].set(
            jnp.asarray(cube_q)))
        out = t.transition(m, s, info)
        assert np.linalg.norm(np.asarray(out.mocap_quat[0])
                              - cube_q) > 1e-3
