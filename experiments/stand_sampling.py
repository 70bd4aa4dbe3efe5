"""Control experiment: does SAMPLING-planner MPC hold the humanoid
stand? Isolates whether the closed-loop instability is iLQG-specific
(feedback/Riccati pathology) or task/model-level (cost shaping, contact
dynamics). Mirrors experiments/stand_closed_loop.py's protocol.

  python experiments/stand_sampling.py --seconds 10 --nsample 128
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HMT_NATIVE_LINALG", "1")

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sim-dt", type=float, default=0.02)
    ap.add_argument("--plan-dt", type=float, default=0.02)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--nsample", type=int, default=128)
    ap.add_argument("--nknots", type=int, default=6)
    ap.add_argument("--horizon", type=int, default=17)
    ap.add_argument("--planner", choices=("sampling", "cem", "mppi"),
                    default="sampling")
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--tpu", dest="cpu", action="store_false")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from humanoid_mujoco_tpu.mpc import (make_plan_model, mpc_rollout,
                                         spline_action_fn)
    from humanoid_mujoco_tpu.physics import humanoid
    from humanoid_mujoco_tpu.physics.model import make_state
    from humanoid_mujoco_tpu.physics.step import step
    from humanoid_mujoco_tpu.planners import (SamplingConfig, init_policy,
                                              sampling_plan)
    from humanoid_mujoco_tpu.planners import cem as cem_mod
    from humanoid_mujoco_tpu.planners import mppi as mppi_mod
    from humanoid_mujoco_tpu.tasks import stand_task

    m = humanoid.build_humanoid()
    sim_m = m.replace(dt=jnp.asarray(args.sim_dt, dtype=jnp.float32))
    plan_m = make_plan_model(m, args.plan_dt)
    task = stand_task()

    s0 = make_state(sim_m, qpos=humanoid.stand_qpos(m))
    # settle into contact equilibrium like stand_closed_loop.py
    from humanoid_mujoco_tpu.rl.env import rl_humanoid_model
    m_servo = rl_humanoid_model().replace(dt=jnp.asarray(0.002))
    q_ref = s0.qpos[7:19]

    @jax.jit
    def _settle(s):
        def body(st, _):
            return step(m_servo, st, q_ref, solver_iters=12)[0], None
        return jax.lax.scan(body, s, None, length=150)[0]

    s0 = _settle(make_state(m_servo, qpos=s0.qpos))
    s0 = s0.replace(time=jnp.asarray(0.0))
    print(f"settled z={float(s0.qpos[2]):.4f}", flush=True)

    if args.planner == "sampling":
        cfg = SamplingConfig(nsample=args.nsample, nknots=args.nknots,
                             horizon=args.horizon)
        plan = lambda pm, t, p, s, k: sampling_plan(pm, t, cfg, p, s, k)
        order = cfg.order
    elif args.planner == "cem":
        cfg = cem_mod.CEMConfig(nsample=args.nsample, nknots=args.nknots,
                                horizon=args.horizon)
        cstate = cem_mod.cem_init(m, cfg)
        state_box = [cstate]

        def plan(pm, t, p, s, k):
            p2, c2, info = cem_mod.cem_plan(pm, t, cfg, p, state_box[0],
                                            s, k)
            state_box[0] = c2
            return p2, info
        order = cfg.order
    else:
        cfg = mppi_mod.MPPIConfig(nsample=args.nsample,
                                  nknots=args.nknots,
                                  horizon=args.horizon)
        plan = lambda pm, t, p, s, k: mppi_mod.mppi_plan(pm, t, cfg, p,
                                                         s, k)
        order = cfg.order

    pol = init_policy(m, args.nknots)
    steps_per_plan = max(1, int(round(0.02 / args.sim_dt)))
    ncycle = int(round(args.seconds / (args.sim_dt * steps_per_plan)))

    t0 = time.time()
    # python loop over a single jitted cycle (one-cycle mpc_rollout):
    # the fully fused ncycle-scan takes >30 min of XLA CPU compile
    run1 = jax.jit(lambda s, p, k: mpc_rollout(
        sim_m, plan_m, task, plan, p, s, k, 1, steps_per_plan,
        spline_action_fn(order)))
    s, p = s0, pol
    costs_l, zs_l = [], []
    for ci in range(ncycle):
        res = run1(s, p, jax.random.fold_in(jax.random.PRNGKey(0), ci))
        s, p = res.final_state, res.final_policy
        costs_l.append(np.asarray(res.costs).reshape(-1))
        zs_l.append(np.asarray(res.states)[:, :, 2].reshape(-1))
        if ci == 0:
            print(f"first cycle (compile) {time.time() - t0:.0f}s",
                  flush=True)
    costs = np.concatenate(costs_l)
    zs = np.concatenate(zs_l)
    print(f"ran in {time.time() - t0:.0f}s", flush=True)

    win = max(1, int(round(0.5 / args.sim_dt)))
    nwin = len(costs) // win
    for w in range(nwin):
        sl = slice(w * win, (w + 1) * win)
        print(f"t={0.5 * (w + 1):5.1f}s cost/step={costs[sl].mean():9.4f}"
              f" z={zs[sl].mean():7.4f}", flush=True)
    thresh = max(10.0 * costs[:win].mean(), 0.05)
    surv = args.seconds
    for w in range(nwin):
        if costs[w * win:(w + 1) * win].mean() > thresh:
            surv = 0.5 * w
            break
    print(f"SURVIVAL: {surv:.1f}s / {args.seconds}s "
          f"(thresh {thresh:.4f})", flush=True)


if __name__ == "__main__":
    main()
