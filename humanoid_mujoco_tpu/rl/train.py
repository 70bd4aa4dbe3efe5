"""Training driver — the rl/train.py analog.

Mirrors the reference's CLI surface (rl/train.py argparse) for SAC/PPO
with the randomization curriculum, checkpointing (orbax), and the
`train.progress` percent file (stdout_log_callback.py:12-22), but the
whole collect+update loop is jit-compiled with the env batch on device.

Usage:
  python -m humanoid_mujoco_tpu.rl.train --algo sac --envs 256 \
      --steps 1000000 --standup --out /tmp/run
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", choices=("sac", "ppo"), default="sac")
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--standup", action="store_true", default=True)
    ap.add_argument("--walk", dest="standup", action="store_false")
    ap.add_argument("--rand", type=float, default=0.0,
                    help="initial randomization factor")
    ap.add_argument("--no-curriculum", action="store_true")
    ap.add_argument("--out", default="/tmp/hmt_train")
    ap.add_argument("--ckpt-every", type=int, default=100)
    ap.add_argument("--eval-every", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint .pkl to resume network params from "
                         "(rl/train.py --ckpt resume, train.py:103-108)")
    args = ap.parse_args(argv)

    from .curriculum import curriculum_init, curriculum_update
    from .env import EnvConfig
    from .ppo import PPOConfig, ppo_init, ppo_train_step
    from .sac import SACConfig, sac_init, sac_train_step
    from .env import rl_humanoid_model

    os.makedirs(args.out, exist_ok=True)
    base_model = rl_humanoid_model()
    env_cfg = EnvConfig(standup=args.standup,
                        max_sim_time=10.0 if args.standup else -1.0)
    key = jax.random.PRNGKey(args.seed)
    cur = curriculum_init(args.rand)

    if args.algo == "sac":
        cfg = SACConfig(n_envs=args.envs, batch_size=4 * args.envs)
        state, nets = sac_init(cfg, env_cfg, base_model,
                               cur.randomization_factor, key)
        train_step = jax.jit(lambda s: sac_train_step(
            cfg, env_cfg, base_model, nets, s))
        steps_per_iter = cfg.steps_per_update * cfg.n_envs
    else:
        cfg = PPOConfig(n_envs=args.envs)
        state, nets = ppo_init(cfg, env_cfg, base_model,
                               cur.randomization_factor, key)
        train_step = jax.jit(lambda s: ppo_train_step(
            cfg, env_cfg, base_model, nets, s))
        steps_per_iter = cfg.rollout_len * cfg.n_envs

    if args.ckpt:
        import pickle
        with open(args.ckpt, "rb") as f:
            loaded = pickle.load(f)
        params = jax.tree.map(jnp.asarray, loaded)
        state = state.__class__(**{**state.__dict__, "params": params})
        print(f"resumed params from {args.ckpt}")

    n_iters = max(1, args.steps // steps_per_iter)
    log_path = os.path.join(args.out, "train.log.jsonl")
    progress_path = os.path.join(args.out, "train.progress")
    t0 = time.time()
    recent_success = []

    for it in range(n_iters):
        state, metrics = train_step(state)
        if it % args.eval_every == 0 or it == n_iters - 1:
            metrics = {k: float(v) for k, v in metrics.items()}
            recent_success.append(metrics.get("success_rate", 0.0))
            if not args.no_curriculum and len(recent_success) >= 3:
                cur = curriculum_update(
                    cur, jnp.asarray(np.mean(recent_success[-3:])))
                recent_success = recent_success[-3:]
            rec = dict(iter=it, env_steps=it * steps_per_iter,
                       rand_factor=float(cur.randomization_factor),
                       wall_s=round(time.time() - t0, 1), **metrics)
            with open(log_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            with open(progress_path, "w") as f:
                f.write(f"{100.0 * (it + 1) / n_iters:.2f}")
            print(rec, flush=True)
            if bool(cur.done):
                print("curriculum complete — stopping")
                break
        if it % args.ckpt_every == 0 and it > 0:
            _save_ckpt(args.out, it, state)

    _save_ckpt(args.out, n_iters, state)
    print(f"done in {time.time() - t0:.0f}s")


def _save_ckpt(out, it, state):
    import pickle
    path = os.path.join(out, f"ckpt_{it:07d}.pkl")
    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, state.params), f)


if __name__ == "__main__":
    main()
