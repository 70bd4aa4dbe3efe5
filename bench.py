"""Benchmark: humanoid rollout-steps/s on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: BASELINE.md north-star target of 10,000 humanoid
rollout-steps/s/chip (the reference publishes no numbers; its harnesses
are mjpc/testspeed.cc and simulation/benchmark.py).

The measured workload is the MPC-planner inner loop: batched lockstep
humanoid rollouts (batch x horizon physics steps with contacts + the
stand-task cost), which is what both the planners and the RL env spend
their time on.
"""

import json
import time

import jax
import jax.numpy as jnp

from humanoid_mujoco_tpu.physics import humanoid
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.rollout import rollout_spline
from humanoid_mujoco_tpu.tasks import stand_task
from humanoid_mujoco_tpu.planners.policy import init_policy
from humanoid_mujoco_tpu.ops.spline import SplineOrder

BATCH = 1024
HORIZON = 100
BASELINE_STEPS_PER_S = 10_000.0


def main():
    m = humanoid.build_humanoid()
    task = stand_task()
    s0 = make_state(m, qpos=humanoid.stand_qpos(m))
    pol = init_policy(m, 3)

    key = jax.random.PRNGKey(0)
    qpos_b = jnp.tile(s0.qpos, (BATCH, 1)).at[:, 7:].add(
        0.03 * jax.random.normal(key, (BATCH, 12)))
    sb = jax.tree.map(lambda x: jnp.tile(x, (BATCH,) + (1,) * x.ndim), s0)
    sb = sb.replace(qpos=qpos_b)
    values_b = jnp.tile(pol.values, (BATCH, 1, 1)) + 0.02 * jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, 3, m.nu))

    @jax.jit
    def run(sb, vb):
        def one(s, v):
            return rollout_spline(m, task, s, pol.times, v,
                                  SplineOrder.ZERO, HORIZON).total_return
        return jax.vmap(one)(sb, vb)

    # warmup/compile
    jax.block_until_ready(run(sb, values_b))
    # steady state: best of 3
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(sb, values_b))
        best = min(best, time.perf_counter() - t0)

    steps_per_s = BATCH * HORIZON / best
    print(json.dumps({
        "metric": "humanoid_rollout_steps_per_s_per_chip",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
