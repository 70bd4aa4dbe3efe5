"""Task cost model + rollout + sampling-family planner tests.

Mirrors the reference's planner test strategy (SURVEY §4): cost
decreases / winner never worse than nominal, plus exact equivalence of
the sharded multi-device plan with the single-device plan.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mujoco_tpu import mpc
from humanoid_mujoco_tpu.ops.spline import SplineOrder
from humanoid_mujoco_tpu.physics import humanoid
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.planners import (CEMConfig, MPPIConfig,
                                          SamplingConfig, cem_init, cem_plan,
                                          mppi_plan, sampling_plan)
from humanoid_mujoco_tpu.planners.policy import (init_policy, policy_action,
                                                 resample_policy)
from humanoid_mujoco_tpu.rollout import (ou_wrench_sequence, rollout_actions,
                                         rollout_spline)
from humanoid_mujoco_tpu.tasks import stand_task
from humanoid_mujoco_tpu.tasks.base import (cost_terms, cost_value,
                                            trajectory_cost)


@pytest.fixture(scope="module")
def setup():
    m = humanoid.build_humanoid()
    task = stand_task()
    s0 = make_state(m, qpos=humanoid.stand_qpos(m))
    pm = mpc.make_plan_model(m, 0.02)
    return m, pm, task, s0


class TestTask:
    def test_residual_dims_and_stand_values(self, setup):
        m, pm, task, s0 = setup
        from humanoid_mujoco_tpu.physics.step import forward
        _, _, _, info = forward(m, s0, jnp.zeros(m.nu))
        res = task.residual(m, s0, info, jnp.zeros(m.nu))
        assert res.shape == (28,)  # 1+1+2+12+12 (stand.cc:40-99)
        # at the stand keyframe: small height error, small balance error
        assert abs(float(res[0])) < 0.05
        assert abs(float(res[1])) < 0.05
        np.testing.assert_allclose(np.array(res[4:16]), 0.0, atol=1e-9)

    def test_cost_terms_and_weights(self, setup):
        m, pm, task, s0 = setup
        res = jnp.zeros(28).at[0].set(0.2)  # only height residual
        terms = cost_terms(task, res)
        assert terms.shape == (5,)
        # height term: w=100 * smooth_abs(0.2; p=0.1)
        expected = 100.0 * (np.sqrt(0.2 ** 2 + 0.1 ** 2) - 0.1)
        np.testing.assert_allclose(float(terms[0]), expected, rtol=1e-5)
        assert abs(float(terms[1])) < 1e-5  # smooth_abs epsilon floor

    def test_risk_transform(self, setup):
        m, pm, task, s0 = setup
        res = jnp.ones(28) * 0.1
        base = float(cost_value(task, res))
        risky = task.__class__(**{**task.__dict__,
                                  "risk": jnp.asarray(0.5, jnp.float32)})
        transformed = float(cost_value(risky, res))
        np.testing.assert_allclose(transformed,
                                   (np.exp(0.5 * base) - 1) / 0.5, rtol=1e-4)

    def test_trajectory_cost_divergence_guard(self, setup):
        m, pm, task, s0 = setup
        residuals = jnp.zeros((4, 28))
        div = jnp.asarray([False, False, True, False])
        total = trajectory_cost(task, residuals, div)
        assert float(total) == 1e6

    def test_set_weight_and_param(self, setup):
        m, pm, task, s0 = setup
        t2 = task.set_weight("Height", 7.0).set_param("Height Goal", 0.3)
        assert float(t2.weights[0]) == 7.0
        assert float(t2.params[0]) == pytest.approx(0.3)


class TestRollout:
    def test_rollout_spline_and_actions_agree_on_constant(self, setup):
        m, pm, task, s0 = setup
        ctrl = jnp.full((m.nu,), 0.01)
        times = jnp.asarray([0.0, 0.1, 0.2])
        vals = jnp.broadcast_to(ctrl, (3, m.nu))
        r1 = jax.jit(lambda: rollout_spline(pm, task, s0, times, vals,
                                            SplineOrder.ZERO, 5))()
        r2 = jax.jit(lambda: rollout_actions(
            pm, task, s0, jnp.broadcast_to(ctrl, (5, m.nu))))()
        np.testing.assert_allclose(float(r1.total_return),
                                   float(r2.total_return), rtol=1e-6)

    def test_ou_sequence_shape_and_scale(self):
        seq = ou_wrench_sequence(jax.random.PRNGKey(0), 50, 14,
                                 jnp.asarray(0.1), rate=0.1, dt=0.01)
        assert seq.shape == (50, 14, 6)
        assert float(jnp.abs(seq).max()) < 5.0


class TestPlanners:
    def test_sampling_winner_not_worse_than_nominal(self, setup):
        m, pm, task, s0 = setup
        cfg = SamplingConfig(nsample=8, nknots=3, horizon=5, solver_iters=4)
        pol = init_policy(m, cfg.nknots)
        new_pol, info = jax.jit(
            lambda p, s, k: sampling_plan(pm, task, cfg, p, s, k)
        )(pol, s0, jax.random.PRNGKey(0))
        assert float(info.best_return) <= float(info.nominal_return) + 1e-5
        assert new_pol.values.shape == (3, m.nu)
        assert float(info.improvement) >= -1e-5

    def test_cem_runs_and_fits_elites(self, setup):
        m, pm, task, s0 = setup
        cfg = CEMConfig(nsample=8, nknots=3, horizon=5, n_elite=3,
                        solver_iters=4)
        pol = init_policy(m, cfg.nknots)
        cs = cem_init(m, cfg)
        new_pol, cs2, info = jax.jit(
            lambda p, c, s, k: cem_plan(pm, task, cfg, p, c, s, k)
        )(pol, cs, s0, jax.random.PRNGKey(0))
        assert cs2.std.shape == (3, m.nu)
        assert bool(jnp.all(cs2.std >= 0))
        assert np.isfinite(float(info.best_return))

    def test_mppi_weighted_average_within_bounds(self, setup):
        m, pm, task, s0 = setup
        cfg = MPPIConfig(nsample=8, nknots=3, horizon=5, solver_iters=4)
        pol = init_policy(m, cfg.nknots)
        new_pol, info = jax.jit(
            lambda p, s, k: mppi_plan(pm, task, cfg, p, s, k)
        )(pol, s0, jax.random.PRNGKey(0))
        assert bool(jnp.all(new_pol.values >= m.act_ctrlrange[:, 0] - 1e-6))
        assert bool(jnp.all(new_pol.values <= m.act_ctrlrange[:, 1] + 1e-6))

    def test_policy_resample_zero_order_identity(self, setup):
        m, pm, task, s0 = setup
        pol = init_policy(m, 3)
        pol = pol.replace(values=pol.values + 0.3)
        r = resample_policy(pol, jnp.asarray(0.0), 0.3, 3, SplineOrder.ZERO)
        np.testing.assert_allclose(np.array(r.values), np.array(pol.values))
        a = policy_action(m, pol, jnp.asarray(0.05), SplineOrder.ZERO)
        np.testing.assert_allclose(np.array(a), 0.3, atol=1e-6)


class TestSharded:
    def test_sharded_plan_matches_single_device(self, setup):
        m, pm, task, s0 = setup
        from humanoid_mujoco_tpu.parallel.mesh import (make_mesh,
                                                       sharded_sampling_plan)
        ndev = len(jax.devices())
        assert ndev == 8, "tests expect the 8-device virtual CPU mesh"
        cfg = SamplingConfig(nsample=8, nknots=3, horizon=4, solver_iters=3)
        pol = init_policy(m, cfg.nknots)
        key = jax.random.PRNGKey(7)
        mesh = make_mesh(ndev)
        p1, i1 = jax.jit(
            lambda p, s, k: sampling_plan(pm, task, cfg, p, s, k)
        )(pol, s0, key)
        p2, i2 = jax.jit(
            lambda p, s, k: sharded_sampling_plan(mesh, pm, task, cfg,
                                                  p, s, k)
        )(pol, s0, key)
        # f32 cross-device reduction order gives ~1e-5 relative wiggle
        np.testing.assert_allclose(np.sort(np.array(i1.returns)),
                                   np.sort(np.array(i2.returns)), rtol=1e-3)
        np.testing.assert_allclose(np.array(p1.values), np.array(p2.values),
                                   rtol=1e-4, atol=1e-6)


class TestMPC:
    def test_mpc_rollout_two_cycles(self, setup):
        m, pm, task, s0 = setup
        cfg = SamplingConfig(nsample=4, nknots=3, horizon=4, solver_iters=3)
        pol = init_policy(m, cfg.nknots)
        plan_fn = lambda pmod, t, p, s, k: sampling_plan(pmod, t, cfg, p,
                                                         s, k)
        res = jax.jit(lambda s, p, k: mpc.mpc_rollout(
            m, pm, task, plan_fn, p, s, k, 2, 3,
            mpc.spline_action_fn(cfg.order)))(
                s0, pol, jax.random.PRNGKey(0))
        assert res.states.shape == (2, 3, m.nq)
        assert res.costs.shape == (2, 3)
        assert bool(jnp.all(jnp.isfinite(res.costs)))


class TestTaskRegistryAndTransition:
    """Task registry + multi-mode Transition machinery
    (tasks/tasks.cc:48-75, Task::Transition mjpc/task.h:85)."""

    def test_registry_lists_and_builds(self):
        from humanoid_mujoco_tpu.tasks import get_task, list_tasks
        names = list_tasks()
        for required in ("Humanoid Cap Stand", "Humanoid Cap Walk",
                         "Particle", "ParticleFixed"):
            assert required in names
        for n in names:
            t = get_task(n)
            assert t.nres > 0 and t.nterm > 0

    def test_particle_transition_moves_goal(self):
        import jax.numpy as jnp
        from humanoid_mujoco_tpu.tasks import get_task, particle_model
        from humanoid_mujoco_tpu.physics.model import make_state
        from humanoid_mujoco_tpu.planners.derivatives import _light_info
        m = particle_model()
        t = get_task("Particle")
        s = make_state(m).replace(time=jnp.asarray(1.0))
        t2 = t.transition(m, s, _light_info(m, s))
        g = np.asarray(t2.mocap_pos[0, :2])   # goal = mocap body
        np.testing.assert_allclose(
            g, [0.25 * np.sin(1.0), 0.25 * np.cos(1.0 / np.pi)],
            atol=1e-6)
        # fixed variant has no transition
        tf = get_task("ParticleFixed")
        assert tf.transition_fn is None

    def test_walk_mode_gates_velocity_target(self):
        import jax.numpy as jnp
        from humanoid_mujoco_tpu.physics import humanoid
        from humanoid_mujoco_tpu.physics.model import make_state
        from humanoid_mujoco_tpu.planners.derivatives import _light_info
        from humanoid_mujoco_tpu.tasks import walk_task
        m = humanoid.build_humanoid()
        s = make_state(m, qpos=humanoid.stand_qpos(m))
        info = _light_info(m, s)
        u = jnp.zeros(m.nu)
        t = walk_task(speed=0.5)
        r_stand = np.asarray(t.residual(m, s, info, u))
        r_walk = np.asarray(t.set_mode("Walk").residual(m, s, info, u))
        # at rest: stand mode sees zero velocity error, walk mode sees
        # the commanded speed as error (residual slots 4:6)
        np.testing.assert_allclose(r_stand[4:6], 0.0, atol=1e-5)
        assert np.linalg.norm(r_walk[4:6]) == pytest.approx(0.5, abs=1e-4)
        assert t.set_mode("Walk").mode_names[1] == "Walk"

    def test_particle_planning_reaches_goal(self):
        """End-to-end: sampling MPC on ParticleFixed drives the particle
        to the goal (the reference's particle planner test,
        test/sampling_planner/sampling_planner_test.cc)."""
        import jax
        import jax.numpy as jnp
        from humanoid_mujoco_tpu.agent import Agent
        from humanoid_mujoco_tpu.tasks import get_task, particle_model
        m = particle_model(dt=0.02)
        a = Agent(m, get_task("ParticleFixed"), planner="sampling",
                  nsample=16, horizon=10, plan_dt=0.02)
        for _ in range(60):
            a.planner_step()
            a.step()
        qp = a.get_state()["qpos"]
        assert abs(qp[0] - 0.25) < 0.08 and abs(qp[1]) < 0.08, qp

    def test_agent_accepts_task_name_and_mode_verbs(self):
        from humanoid_mujoco_tpu.agent import Agent
        from humanoid_mujoco_tpu.tasks import particle_model
        a = Agent(particle_model(), "Particle", planner="sampling",
                  nsample=4, horizon=4)
        assert a.task.name == "Particle"
        assert a.get_mode() == "default"
        # transition runs on set_state and moves the goal with time
        a.set_state(time=1.0)
        np.testing.assert_allclose(
            np.asarray(a.task.mocap_pos[0, :2]),
            [0.25 * np.sin(1.0), 0.25 * np.cos(1.0 / np.pi)], atol=1e-5)
        # mocap verb surface
        a.set_mocap("goal", pos=[0.1, -0.2, 0.0])
        np.testing.assert_allclose(a.get_mocap()["goal"]["pos"],
                                   [0.1, -0.2, 0.0], atol=1e-6)
