"""Gradient / iLQS / robust / sample-gradient planner tests (pendulum +
tiny-humanoid configs for speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mujoco_tpu import mpc
from humanoid_mujoco_tpu.ops.spline import SplineOrder
from humanoid_mujoco_tpu.physics import humanoid
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.planners import (GradientConfig, ILQGConfig,
                                          ILQSConfig, RobustConfig,
                                          SampleGradientConfig,
                                          SamplingConfig, gradient_plan,
                                          ilqs_init, ilqs_plan,
                                          robust_plan,
                                          sample_gradient_init,
                                          sample_gradient_plan)
from humanoid_mujoco_tpu.planners.gradient import interp_weights
from humanoid_mujoco_tpu.planners.ilqs import spline_fit
from humanoid_mujoco_tpu.planners.policy import init_policy
from humanoid_mujoco_tpu.tasks import stand_task

import sys
import os
sys.path.insert(0, os.path.dirname(__file__))
from test_ilqg import pendulum_model, pendulum_task  # noqa: E402

F64 = jnp.float64


@pytest.fixture(scope="module")
def pend():
    m = pendulum_model(dt=0.05)
    return m, pendulum_task(), make_state(m)


@pytest.fixture(scope="module")
def hum():
    m = humanoid.build_humanoid()
    task = stand_task()
    s0 = make_state(m, qpos=humanoid.stand_qpos(m))
    pm = mpc.make_plan_model(m, 0.02)
    return m, pm, task, s0


class TestInterpWeights:
    def test_reconstructs_spline_exactly(self):
        times = jnp.linspace(0.0, 1.0, 20)
        knot_times = jnp.linspace(0.0, 1.0, 5)
        vals = jnp.sin(knot_times)[:, None]
        from humanoid_mujoco_tpu.ops.spline import spline_sample
        W = interp_weights(times, knot_times, SplineOrder.LINEAR)
        direct = spline_sample(knot_times, vals, times, SplineOrder.LINEAR)
        np.testing.assert_allclose(np.array(W @ vals), np.array(direct),
                                   atol=1e-6)

    def test_spline_fit_roundtrip(self):
        # fitting samples OF a spline recovers the knots
        knot_times = jnp.linspace(0.0, 1.0, 4)
        knots = jnp.asarray([[0.1], [0.5], [-0.3], [0.2]], dtype=F64)
        times = jnp.linspace(0.0, 1.0, 30)
        from humanoid_mujoco_tpu.ops.spline import spline_sample
        u = spline_sample(knot_times, knots, times, SplineOrder.LINEAR)
        fit = spline_fit(u, times, knot_times, SplineOrder.LINEAR)
        np.testing.assert_allclose(np.array(fit), np.array(knots),
                                   atol=1e-3)


class TestGradientPlanner:
    def test_improves_pendulum(self, pend):
        m, task, s0 = pend
        cfg = GradientConfig(nknots=5, horizon=25, n_linesearch=10,
                             order=SplineOrder.LINEAR)
        pol = init_policy(m, cfg.nknots, dtype=F64)
        plan = jax.jit(lambda p, s, k: gradient_plan(m, task, cfg, p, s,
                                                     k))
        nominal0 = None
        for i in range(10):
            pol, info = plan(pol, s0, jax.random.PRNGKey(i))
            if nominal0 is None:
                nominal0 = float(info.nominal_return)
        assert float(info.best_return) < 0.7 * nominal0
        assert float(info.improvement) >= -1e-6


class TestILQS:
    def test_runs_and_not_worse_than_sampling(self, pend):
        m, task, s0 = pend
        cfg = ILQSConfig(
            sampling=SamplingConfig(nsample=6, nknots=3, horizon=10,
                                    solver_iters=3),
            ilqg=ILQGConfig(horizon=10, n_linesearch=4, solver_iters=3,
                            deriv_solver_iters=2))
        pol = init_policy(m, 3, dtype=F64)
        ps = ilqs_init(m, cfg, s0, pol)
        plan = jax.jit(lambda ps, s, k: ilqs_plan(m, task, cfg, ps, s, k))
        ps, info = plan(ps, s0, jax.random.PRNGKey(0))
        assert np.isfinite(float(info.best_return))
        # large first-iteration improvement (measured 49.3 -> 27.2);
        # the spline<->trajectory conversion may cost a little on later
        # iterations, so only require staying near the improved level
        ps, info2 = plan(ps, s0, jax.random.PRNGKey(1))
        assert float(info2.best_return) < 0.75 * float(
            info.nominal_return)


class TestRobust:
    def test_runs_on_humanoid(self, hum):
        m, pm, task, s0 = hum
        cfg = RobustConfig(
            sampling=SamplingConfig(nsample=6, nknots=3, horizon=4,
                                    solver_iters=3),
            n_best=2, repetitions=2)
        pol = init_policy(m, 3)
        plan = jax.jit(lambda p, s, k: robust_plan(pm, task, cfg, p, s,
                                                   k))
        pol2, info = plan(pol, s0, jax.random.PRNGKey(0))
        assert pol2.values.shape == (3, m.nu)
        assert np.isfinite(float(info.best_return))


class TestSampleGradient:
    def test_runs_and_estimates_gradient(self, pend):
        m, task, s0 = pend
        cfg = SampleGradientConfig(
            sampling=SamplingConfig(
                nsample=16, nknots=3, horizon=10, solver_iters=3,
                exploration=jnp.asarray(0.1, dtype=F64)))
        pol = init_policy(m, 3, dtype=F64)
        gs = sample_gradient_init(m, cfg)
        plan = jax.jit(lambda p, g, s, k: sample_gradient_plan(
            m, task, cfg, p, g, s, k))
        for i in range(3):
            pol, gs, info = plan(pol, gs, s0, jax.random.PRNGKey(i))
        assert float(jnp.sum(jnp.abs(gs.grad))) > 0.0  # estimate formed
        assert float(info.improvement) >= -1e-6
