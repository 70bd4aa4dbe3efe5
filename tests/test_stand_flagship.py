"""Flagship behavior: iLQG MPC holds the humanoid stand closed-loop.

The reference's own task (mjpc/tasks/humanoid_cap/stand/stand.cc:23-101,
planner=iLQG per tasks/humanoid_cap/stand/task.xml:9) is MPC keeping
the robot standing. Round 1 failed here (~1.5 s then wobble->hopping);
the root cause was the plan rollouts using fewer contact-Newton
iterations than the sim (4 vs 8) — the planner optimized a subtly
different contact model, injecting error every replan. Solver-matched,
the loop is statically stable: cost/step decays to ~1e-5 and control
stays near zero (driver-reproducible at 10 s via
experiments/stand_closed_loop.py; 10/10 s survival recorded in
docs/NOTES.md round 2).

This test runs the same loop for 2.5 simulated seconds at the plan rate
(the CI-affordable slice) and asserts the cost CONTRACTS and the stand
is quiescent — hopping/wobble shows up as cost growth and control
saturation well within 2.5 s (round 1 diverged by 1.0 s).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mujoco_tpu.physics import humanoid
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.physics.step import step
from humanoid_mujoco_tpu.planners.derivatives import _light_info
from humanoid_mujoco_tpu.planners.ilqg import (ILQGConfig, ilqg_action,
                                               ilqg_init, ilqg_plan)
from humanoid_mujoco_tpu.tasks import stand_task
from humanoid_mujoco_tpu.tasks.base import cost_value


@pytest.mark.slow
def test_stand_holds_closed_loop():
    dt = 0.02
    seconds = 2.5
    m = humanoid.build_humanoid()
    sim_m = m.replace(dt=jnp.asarray(dt, dtype=m.body_pos.dtype))
    task = stand_task()
    cfg = ILQGConfig(horizon=17)   # defaults are solver-matched (8/8)

    # settle the keyframe into its contact equilibrium like the
    # experiment harness (0.3 s position-servo hold at 500 Hz)
    from humanoid_mujoco_tpu.rl.env import rl_humanoid_model
    m_servo = rl_humanoid_model()
    s0 = make_state(sim_m, qpos=humanoid.stand_qpos(m))
    q_ref = s0.qpos[7:19]

    @jax.jit
    def settle(s):
        def body(st, _):
            return step(m_servo, st, q_ref, solver_iters=12)[0], None
        return jax.lax.scan(body, s, None, length=150)[0]

    s = settle(make_state(m_servo, qpos=s0.qpos))
    s = s.replace(time=jnp.zeros_like(s.time))
    ps = ilqg_init(sim_m, cfg, s)

    plan_j = jax.jit(lambda ps, s: ilqg_plan(sim_m, task, cfg, ps, s))
    step_j = jax.jit(lambda s, u: step(sim_m, s, u))
    act_j = jax.jit(
        lambda pol, s: ilqg_action(sim_m, pol, s.qpos, s.qvel, s.time))
    cost_j = jax.jit(lambda s, u: cost_value(
        task, task.residual(sim_m, s, _light_info(sim_m, s), u)))

    ncycle = int(round(seconds / dt))
    costs, umaxes, zs = [], [], []
    for _ in range(ncycle):
        ps, _info = plan_j(ps, s)
        u = act_j(ps.policy, s)
        costs.append(float(cost_j(s, u)))
        umaxes.append(float(jnp.max(jnp.abs(u))))
        zs.append(float(s.qpos[2]))
        s, _ = step_j(s, u)

    costs = np.asarray(costs)
    win = int(round(0.5 / dt))
    first, last = costs[:win].mean(), costs[-win:].mean()
    # cost contracts to quiescence (round-1 failure: first ~0.07,
    # last-window ~1.2 and rising, umax pinned at 1.0)
    assert last < 0.02, (first, last)
    assert last <= first * 1.5 + 1e-3
    # the robot never leaves the stand band and never saturates
    z = np.asarray(zs)
    assert z.min() > -0.45 and z.max() < -0.30, (z.min(), z.max())
    assert np.mean(np.asarray(umaxes)[-win:] >= 0.999) < 0.2
    assert np.all(np.isfinite(costs))
