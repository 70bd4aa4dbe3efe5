"""MPC driving the randomized RL environment — the robustness-evaluation
entry point (controllers/mpc_in_env.py:20-48 analog).

The MPC plans on its OWN clean torque-actuated model while the env runs
the randomized position-servo model with obs noise, delays, external
pushes and torque noise injection — measuring how the planner tolerates
the full sim-to-sim gap:

  loop: noisy env obs (joint pos/vel, ang vel) + torso quat
        -> partial-state re-estimation (height scan, mpc_utils.py:36-56)
        -> H planner iterations -> action + N(0, 0.15*1.5) torque noise
        -> env.step    (the reference feeds MPC torques straight into
                        the env's P-position actuators — same here)

Usage:
  python -m humanoid_mujoco_tpu.mpc_in_env --seconds 5 --rand 0.1
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

TORQUE_NOISE_STD = 0.15 * 1.5   # mpc_in_env.py:37


def run(seconds: float = 5.0, randomization_factor: float = 0.0,
        planner: str = "ilqg", planner_iterations: int = 2,
        horizon: int = 17, torque_noise: float = TORQUE_NOISE_STD,
        seed: int = 0, verbose: bool = True):
    """Returns a dict with survival time, mean reward, control rate."""
    from .agent import Agent
    from .physics import humanoid
    from .rl.env import EnvConfig, env_reset, env_step, rl_humanoid_model
    from .serving.state_estimation import set_robot_state
    from .tasks import stand_task

    # env: randomized position-servo model, stand mode (walk-style
    # termination: falling ends the episode)
    env_cfg = EnvConfig(standup=False, max_sim_time=seconds)
    base_model = rl_humanoid_model()
    key = jax.random.PRNGKey(seed)
    es, obs = env_reset(env_cfg, base_model, jnp.asarray(
        randomization_factor, dtype=jnp.float32), key)
    step_env = jax.jit(lambda e, a: env_step(env_cfg, base_model, e, a))

    # MPC: clean torque model + stand task
    agent = Agent(humanoid.build_humanoid(), stand_task(),
                  planner=planner, horizon=horizon)

    from .physics.engine import fwd_position
    torso = base_model.struct.body_id("torso")

    rng = np.random.default_rng(seed)
    rewards, n_steps = [], 0
    t0 = time.time()
    done = False
    max_steps = int(seconds / 0.002)
    while not done and n_steps < max_steps:
        joint_pos = np.asarray(obs[:12])
        joint_vel = np.asarray(obs[12:24])
        ang_vel = np.asarray(obs[24:27])
        # ground-truth torso quat (env.torso_quat, mpc_in_env.py:26-31)
        quat = np.asarray(
            fwd_position(es.patch.apply(base_model),
                         es.phys.qpos).xquat[torso])

        state = set_robot_state(agent.model, joint_pos, joint_vel,
                                ang_vel, quat)
        agent.state = state
        for _ in range(planner_iterations):
            agent.planner_step()
        u = agent.get_action()
        u = u + rng.normal(0.0, torque_noise, u.shape)

        es, obs, r, term, trunc = step_env(es, jnp.asarray(
            u, dtype=jnp.float32))
        rewards.append(float(r))
        done = bool(term)
        n_steps += 1

    wall = time.time() - t0
    out = dict(survival_s=n_steps * 0.002,
               fell=bool(done),
               mean_reward=float(np.mean(rewards)) if rewards else 0.0,
               control_hz=n_steps / max(wall, 1e-9),
               steps=n_steps)
    if verbose:
        print(f"survived {out['survival_s']:.2f}s / {seconds}s "
              f"(fell={out['fell']}), mean reward "
              f"{out['mean_reward']:.2f}, {out['control_hz']:.1f} Hz",
              flush=True)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--rand", type=float, default=0.0)
    ap.add_argument("--planner", default="ilqg")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--horizon", type=int, default=17)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    run(seconds=args.seconds, randomization_factor=args.rand,
        planner=args.planner, planner_iterations=args.iters,
        horizon=args.horizon, seed=args.seed)


if __name__ == "__main__":
    main()
