"""Quadruped Hill full-waypoint-circuit experiment (TPU).

Closes the round-3 verdict's task-achievement gap for Quadruped Hill:
the A1 walks the COMPLETE waypoint ring around the hill under sampling
MPC with live Task::Transition (quadruped.cc:776-817), counting every
waypoint advance until it laps back to waypoint 0.

Run:  python experiments/quadruped_circuit.py [--n 4] [--ring 1.1]
Writes experiments/runs/quadruped_circuit/result.json + qpos trace.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from humanoid_mujoco_tpu import mpc
from humanoid_mujoco_tpu.ops.spline import SplineOrder
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.planners import (SamplingConfig, init_policy,
                                          sampling_plan)
from humanoid_mujoco_tpu.tasks.quadruped import (home_ctrl,
                                                 quadruped_home_qpos)
from humanoid_mujoco_tpu.tasks.quadruped_hill import (quadruped_hill_model,
                                                      quadruped_hill_task,
                                                      waypoints)


def main():
    ap = argparse.ArgumentParser()
    # waypoint density matches the reference circuit: task_hill.xml's
    # 20 keyframes are ~0.4-0.7 m apart (task_hill.xml:80-99); a ring
    # of 12 at r=1.1 gives 0.57 m spacing. The round-4 runs used 1.2-
    # 1.6 m spacing — twice the reference's — which stalls progress
    # (the 0.25 s horizon can't see a gait's worth of approach).
    ap.add_argument("--n", type=int, default=12, help="waypoints")
    ap.add_argument("--ring", type=float, default=1.1, help="ring radius")
    ap.add_argument("--hill", type=float, default=0.35, help="hill peak height")
    ap.add_argument("--max-sim-s", type=float, default=120.0)
    ap.add_argument("--planner", choices=("sampling", "ilqg"),
                    default="sampling")
    ap.add_argument("--out", default="experiments/runs/quadruped_circuit")
    args = ap.parse_args()

    m = quadruped_hill_model(hill_h=args.hill)
    task = quadruped_hill_task(n_waypoints=args.n, ring_r=args.ring,
                               hill_h=args.hill)
    wpos, wquat = waypoints(n=args.n, ring_r=args.ring, hill_h=args.hill)
    q = np.array(quadruped_home_qpos(m))
    q[:3] = np.asarray(wpos[0])
    q[3:7] = np.asarray(wquat[0])
    state = make_state(m, qpos=jnp.asarray(q, jnp.float32))

    if args.planner == "ilqg":
        from humanoid_mujoco_tpu.planners.ilqg import (ILQGConfig,
                                                       ilqg_action,
                                                       ilqg_init,
                                                       ilqg_plan)
        from humanoid_mujoco_tpu.physics.step import step
        cfg = ILQGConfig(horizon=30)
        pol = ilqg_init(m, cfg, state)

        @jax.jit
        def chunk(s, p, t, k):
            def cycle(carry, _):
                p, s, t = carry
                p, _ = ilqg_plan(m, t, cfg, p, s)
                u = ilqg_action(m, p.policy, s.qpos, s.qvel, s.time)
                s, info = step(m, s, u)
                t = t.transition(m, s, info)
                return (p, s, t), s.qpos[:7]
            (p, s, t), qs = jax.lax.scan(cycle, (p, s, t), None,
                                         length=200)
            return mpc.MPCResult(final_state=s, final_policy=p,
                                 states=qs, ctrls=None, costs=None,
                                 plan_returns=None, final_task=t)

        chunk_sim_s = 200 * float(m.dt)
    else:
        pm = mpc.make_plan_model(m, 0.01)
        cfg = SamplingConfig(nsample=64, nknots=5, horizon=25,
                             order=SplineOrder.LINEAR, solver_iters=8,
                             exploration=jnp.asarray(0.3))
        pol = init_policy(m, cfg.nknots)
        pol = dataclasses.replace(
            pol, values=jnp.tile(jnp.asarray(home_ctrl(m))[None],
                                 (cfg.nknots, 1)))

        chunk = jax.jit(lambda s, p, t, k: mpc.mpc_rollout(
            m, pm, t,
            lambda mm, tt, pp, ss, kk: sampling_plan(mm, tt, cfg, pp,
                                                     ss, kk),
            p, s, k, ncycle=25, steps_per_plan=10,
            action_fn=mpc.spline_action_fn(cfg.order),
            sim_solver_iters=8, run_transition=True))

        chunk_sim_s = 25 * 10 * float(m.dt)
    advances = 0
    mode = 0
    traces = []
    t0 = time.time()
    key = jax.random.PRNGKey(0)
    sim_s = 0.0
    while sim_s < args.max_sim_s and advances < args.n + 1:
        key, k = jax.random.split(key)
        res = chunk(state, pol, task, k)
        state, pol, task = (res.final_state, res.final_policy,
                            res.final_task)
        new_mode = int(res.final_task.mode)
        advances += (new_mode - mode) % args.n
        mode = new_mode
        sim_s += chunk_sim_s
        qf = np.asarray(state.qpos)
        traces.append(np.asarray(res.states).reshape(-1, 7)
                      if args.planner == "ilqg" else
                      np.asarray(res.states)[..., :7].reshape(-1, 7))
        print(f"sim {sim_s:6.1f}s  mode {mode}  advances {advances}  "
              f"pos ({qf[0]:+.2f},{qf[1]:+.2f},{qf[2]:.2f})",
              flush=True)

    lapped = advances >= args.n + 1   # left wp0, visited all, back past 0
    out = dict(n_waypoints=args.n, ring_r=args.ring,
               advances=advances, lapped=bool(lapped),
               sim_seconds=sim_s, wall_seconds=round(time.time() - t0, 1))
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(out, f, indent=1)
    np.save(os.path.join(args.out, "qpos_trace.npy"),
            np.concatenate(traces, axis=0))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
