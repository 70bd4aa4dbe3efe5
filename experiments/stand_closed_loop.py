"""Closed-loop stand stability experiment harness (round-2 flagship).

Runs iLQG MPC on the humanoid stand task (the reference's own task,
mjpc/tasks/humanoid_cap/stand/stand.cc + task.xml planner=iLQG) in a
fully jitted plan->act loop and reports a per-window cost/height trace
plus the survival time.

Usage (CPU iteration; the sim-model choice isolates failure modes):
  # perfect-model loop: sim == plan model at dt 0.02 — planner semantics
  python experiments/stand_closed_loop.py --sim-dt 0.02 --seconds 10
  # full-rate loop: sim at 0.002, replan at 50 Hz — the real deployment
  python experiments/stand_closed_loop.py --sim-dt 0.002 --seconds 10
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
    ap.add_argument("--replan-every", type=int, default=None,
                    help="sim steps per replan (default: 0.02s worth)")
    ap.add_argument("--iters", type=int, default=1,
                    help="planner iterations per replan")
    ap.add_argument("--horizon", type=int, default=17)
    ap.add_argument("--no-limits", action="store_true")
    ap.add_argument("--reg-type", type=int, default=0)
    ap.add_argument("--terminal-weight", type=float, default=0.0)
    ap.add_argument("--n-linesearch", type=int, default=8)
    ap.add_argument("--warm-iters", type=int, default=0,
                    help="planner iterations at s0 before the loop")
    ap.add_argument("--no-settle", action="store_true")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--tpu", dest="cpu", action="store_false")
    ap.add_argument("--perturb", type=float, default=0.0,
                    help="initial lateral qvel perturbation")
    ap.add_argument("--plan-solver-iters", type=int, default=4,
                    help="contact Newton iterations in plan rollouts")
    ap.add_argument("--sim-solver-iters", type=int, default=8)
    ap.add_argument("--python-loop", action="store_true",
                    help="jit one plan+act cycle and loop in Python "
                         "(much smaller XLA module than the fully "
                         "fused ncycle-scan; same numerics)")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    from humanoid_mujoco_tpu.mpc import make_plan_model
    from humanoid_mujoco_tpu.physics import humanoid
    from humanoid_mujoco_tpu.physics.model import make_state
    from humanoid_mujoco_tpu.physics.step import step
    from humanoid_mujoco_tpu.planners.derivatives import _light_info
    from humanoid_mujoco_tpu.planners.ilqg import (ILQGConfig, ilqg_action,
                                                   ilqg_init, ilqg_plan)
    from humanoid_mujoco_tpu.tasks import stand_task
    from humanoid_mujoco_tpu.tasks.base import cost_value

    dtype = jnp.float64 if args.f64 else jnp.float32
    m = humanoid.build_humanoid(dtype=dtype)
    sim_m = m.replace(dt=jnp.asarray(args.sim_dt, dtype=dtype))
    plan_m = make_plan_model(m, args.plan_dt)
    task = stand_task(dtype=dtype)
    cfg = ILQGConfig(horizon=args.horizon, limits=not args.no_limits,
                     reg_type=args.reg_type,
                     n_linesearch=args.n_linesearch,
                     solver_iters=args.plan_solver_iters)

    s0 = make_state(sim_m, qpos=humanoid.stand_qpos(m))
    if not args.no_settle:
        # settle the keyframe into its contact equilibrium (0.3 s servo
        # hold at 500 Hz): the raw keyframe floats ~1 mm above the soft-
        # contact equilibrium and the drop transient otherwise pollutes
        # the first plan cycles
        from humanoid_mujoco_tpu.rl.env import rl_humanoid_model
        m_servo = rl_humanoid_model()
        m_servo = m_servo.replace(dt=jnp.asarray(0.002, dtype=dtype))
        q_ref = s0.qpos[7:19]

        @jax.jit
        def _settle(s):
            def body(st, _):
                st2, _ = step(m_servo, st, q_ref, solver_iters=12)
                return st2, None
            return jax.lax.scan(body, s, None, length=150)[0]
        s0 = _settle(make_state(m_servo, qpos=s0.qpos))
        s0 = s0.replace(time=jnp.asarray(0.0, dtype=dtype))
        print(f"settled: z={float(s0.qpos[2]):.4f} "
              f"|qvel|={float(jnp.max(jnp.abs(s0.qvel))):.4f}", flush=True)
    if args.perturb:
        s0 = s0.replace(qvel=s0.qvel.at[1].set(args.perturb))
    ps0 = ilqg_init(plan_m, cfg, s0)

    terminal = None
    if args.terminal_weight > 0:
        from humanoid_mujoco_tpu.planners.terminal import lqr_terminal
        terminal = lqr_terminal(plan_m, task, s0.qpos,
                                weight=args.terminal_weight)

    replan_every = args.replan_every or max(
        1, int(round(0.02 / args.sim_dt)))
    ncycle = int(round(args.seconds / (args.sim_dt * replan_every)))

    if args.warm_iters > 0:
        @jax.jit
        def warm(ps):
            def it(ps, _):
                ps, _info = ilqg_plan(plan_m, task, cfg, ps, s0,
                                      terminal=terminal)
                return ps, _info.best_return
            return jax.lax.scan(it, ps, None, length=args.warm_iters)
        t0 = time.time()
        ps0, wrets = warm(ps0)
        print(f"warm-start: {args.warm_iters} iters in "
              f"{time.time() - t0:.0f}s, return "
              f"{float(wrets[0]):.4f} -> {float(wrets[-1]):.4f}",
              flush=True)

    def cycle(carry, _):
        s, ps = carry

        def it(ps, _):
            ps, info = ilqg_plan(plan_m, task, cfg, ps, s,
                                 terminal=terminal)
            return ps, (info.best_return, info.reg, info.alpha)

        ps, (rets, regs, alphas) = jax.lax.scan(
            it, ps, None, length=args.iters)

        def sim_step(s, _):
            u = ilqg_action(sim_m, ps.policy, s.qpos, s.qvel, s.time)
            s2, si = step(sim_m, s, u,
                          solver_iters=args.sim_solver_iters)
            res = task.residual(sim_m, s, _light_info(sim_m, s), u)
            c = cost_value(task, res)
            return s2, (c, s.qpos[2], jnp.max(jnp.abs(u)))

        s, (costs, zs, umax) = jax.lax.scan(sim_step, s, None,
                                            length=replan_every)
        return (s, ps), (costs.mean(), zs.mean(), umax.max(),
                         rets[-1], regs[-1])

    print(f"config: sim_dt={args.sim_dt} replan_every={replan_every} "
          f"iters={args.iters} horizon={args.horizon} "
          f"limits={not args.no_limits} reg_type={args.reg_type} "
          f"terminal_w={args.terminal_weight} ncycle={ncycle}",
          flush=True)
    t0 = time.time()
    if args.python_loop:
        cycle_j = jax.jit(lambda c: cycle(c, None))
        carry = (s0, ps0)
        outs = []
        for ci in range(ncycle):
            carry, out = cycle_j(carry)
            outs.append(jax.tree.map(np.asarray, out))
            if ci == 0:
                print(f"first cycle (compile) {time.time() - t0:.0f}s",
                      flush=True)
        (s_end, ps_end) = carry
        costs, zs, umax, rets, regs = (
            np.stack([o[i] for o in outs]) for i in range(5))
    else:
        run = jax.jit(lambda s, ps: jax.lax.scan(
            cycle, (s, ps), None, length=ncycle))
        (s_end, ps_end), (costs, zs, umax, rets, regs) = run(s0, ps0)
    costs = np.asarray(costs)
    print(f"compiled+ran in {time.time() - t0:.0f}s", flush=True)

    # report per-0.5s windows
    win = max(1, int(round(0.5 / (args.sim_dt * replan_every))))
    nwin = len(costs) // win
    for w in range(nwin):
        sl = slice(w * win, (w + 1) * win)
        print(f"t={0.5 * (w + 1):5.1f}s  cost/step={costs[sl].mean():9.4f} "
              f"z={np.asarray(zs)[sl].mean():7.4f} "
              f"umax={np.asarray(umax)[sl].max():6.3f} "
              f"plan_ret={np.asarray(rets)[sl].mean():9.4f} "
              f"reg={np.asarray(regs)[sl].mean():8.2e}", flush=True)

    # survival: first window with mean step cost > 10x the initial window
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
