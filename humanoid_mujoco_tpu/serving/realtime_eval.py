"""Real-time-paced closed-loop eval with the asynchronous agent.

The reference's deployment shape (app.cc:90-93 physics thread querying
ActionFromPolicy while the plan thread iterates continuously,
app.cc:493-496): here a wall-clock-paced control loop steps the sim and
queries `AsyncAgent.get_action` at `control_hz` while the native plan
loop replans against the freshest state. Reports achieved control Hz,
plan iterations/s, and the closed-loop cost trace.

Usage:
  python -m humanoid_mujoco_tpu.serving.realtime_eval --seconds 5
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def run(seconds: float = 5.0, control_hz: float = 100.0,
        planner: str = "ilqg", horizon: int = 17, nsample: int = 32,
        realtime: bool = True, verbose: bool = True):
    from ..agent import Agent
    from ..native.async_agent import AsyncAgent
    from ..physics import humanoid
    from ..physics.model import make_state
    from ..physics.step import step
    from ..planners.derivatives import _light_info
    from ..tasks import stand_task
    from ..tasks.base import cost_value

    m = humanoid.build_humanoid()
    task = stand_task()
    agent = Agent(m, task, planner=planner, horizon=horizon,
                  nsample=nsample)
    s = make_state(m, qpos=humanoid.stand_qpos(m))
    agent.set_state(qpos=np.asarray(s.qpos))

    # sim substeps per control period at the model's own dt
    sub = max(1, int(round(1.0 / control_hz / float(m.dt))))

    # The sim here is the ROBOT PROXY: on a deployment it is physical
    # hardware, so its stepping must not ride the accelerator dispatch
    # tunnel. Pin it (and the control-side state) to the host CPU; only
    # the plan thread touches the TPU.
    cpu = jax.devices("cpu")[0]

    @functools.partial(jax.jit, device=cpu)
    def advance(s, u):
        def body(s, _):
            # pure-JAX solver path: this jit targets the host CPU while
            # the default backend is the TPU, so the Pallas kernel gate
            # must be overridden explicitly
            s2, _ = step(m, s, u, use_pallas=False)
            return s2, None
        s, _ = jax.lax.scan(body, s, None, length=sub)
        res = task.residual(m, s, _light_info(m, s),
                            jnp.asarray(u, dtype=s.qpos.dtype))
        return s, cost_value(task, res)

    # control-side state lives on the CPU (committed) so no per-step
    # transfers ride the tunnel
    s = jax.device_put(s, cpu)

    # warm the jits before starting the clock
    u0 = np.zeros(m.nu)
    advance(s, u0)
    agent.planner_step()

    aa = AsyncAgent(agent)
    aa.start()
    n_ctrl = int(seconds * control_hz)
    period = 1.0 / control_hz
    costs = []
    act_lat = []    # per-call get_action latency (the robot-facing path)
    t_start = time.monotonic()
    try:
        for i in range(n_ctrl):
            t = time.monotonic() - t_start
            t_q = time.perf_counter()
            u = aa.get_action(np.asarray(s.qpos), np.asarray(s.qvel),
                              float(s.time))
            act_lat.append(time.perf_counter() - t_q)
            s, c = advance(s, u)
            aa.set_state(np.asarray(s.qpos), np.asarray(s.qvel),
                         float(s.time))
            costs.append(float(c))
            if realtime:
                sleep = (i + 1) * period - (time.monotonic() - t_start)
                if sleep > 0:
                    time.sleep(sleep)
    finally:
        wall = time.monotonic() - t_start
        iters = aa.plan_iterations
        aa.stop()

    achieved_hz = n_ctrl / wall
    plan_rate = iters / wall
    out = dict(achieved_control_hz=achieved_hz,
               plan_iterations_per_s=plan_rate,
               plan_iterations=iters,
               action_latency_ms_mean=float(np.mean(act_lat) * 1e3),
               action_latency_ms_p99=float(
                   np.percentile(act_lat, 99) * 1e3),
               mean_cost=float(np.mean(costs)),
               final_cost=float(np.mean(costs[-int(control_hz):])),
               wall_s=wall)
    if verbose:
        print(f"control: {achieved_hz:.1f} Hz (target {control_hz}), "
              f"planning: {plan_rate:.1f} it/s ({iters} total), "
              f"mean cost/step {out['mean_cost']:.4f}, "
              f"last-second cost {out['final_cost']:.4f}", flush=True)
    return out


def measure_async_rates(duration_s: float = 3.0,
                        control_hz: float = 100.0) -> dict:
    """Compact async-deployment numbers for bench.py extras (round-3
    VERDICT next #4): plans/s, achieved control Hz, and get_action
    latency while the plan loop replans continuously."""
    out = run(seconds=duration_s, control_hz=control_hz,
              planner="sampling", nsample=128, realtime=True,
              verbose=False)
    return {
        "async_control_hz": round(out["achieved_control_hz"], 1),
        "async_plans_per_s": round(out["plan_iterations_per_s"], 2),
        "async_action_latency_ms": round(
            out["action_latency_ms_mean"], 3),
        "async_action_latency_p99_ms": round(
            out["action_latency_ms_p99"], 3),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--hz", type=float, default=100.0)
    ap.add_argument("--planner", default="ilqg")
    ap.add_argument("--horizon", type=int, default=17)
    ap.add_argument("--as-fast-as-possible", action="store_true")
    args = ap.parse_args(argv)
    run(seconds=args.seconds, control_hz=args.hz, planner=args.planner,
        horizon=args.horizon, realtime=not args.as_fast_as_possible)


if __name__ == "__main__":
    main()
