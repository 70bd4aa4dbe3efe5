"""Hyperparameter search — the rl/tune_hyperparameters.py analog.

The reference runs rl_zoo3/Optuna TPE with a median pruner over a PPO
space (tune_hyperparameters.py:11-47, simulation/hyperparam_config.py).
Optuna isn't in this image; this implements the same loop shape with
random search + successive halving (median-pruner-like): sample configs,
train each for a short budget, keep the top half, double the budget.
"""

from __future__ import annotations

import argparse
import json
import math
import random

import jax
import jax.numpy as jnp
import numpy as np

# PPO search space (hyperparam_config.py:5-29 ranges)
SPACE = dict(
    lr=lambda r: 10 ** r.uniform(-5, -3),
    gamma=lambda r: 1.0 - 10 ** r.uniform(-3, -1),
    clip=lambda r: r.choice([0.1, 0.2, 0.3]),
    ent_coef=lambda r: 10 ** r.uniform(-8, -1),
    n_epochs=lambda r: r.choice([4, 8]),
    lam=lambda r: r.choice([0.9, 0.95, 0.99]),
)


def sample_config(rng: random.Random) -> dict:
    return {k: fn(rng) for k, fn in SPACE.items()}


def train_briefly(cfg_dict: dict, iters: int, seed: int,
                  n_envs: int = 32) -> float:
    from .env import EnvConfig, rl_humanoid_model
    from .ppo import PPOConfig, ppo_init, ppo_train_step

    base = rl_humanoid_model()
    env_cfg = EnvConfig(standup=True)
    cfg = PPOConfig(
        n_envs=n_envs, rollout_len=32,
        n_epochs=int(cfg_dict["n_epochs"]),
        lr=float(cfg_dict["lr"]),
        gamma=jnp.asarray(cfg_dict["gamma"]),
        lam=jnp.asarray(cfg_dict["lam"]),
        clip=jnp.asarray(cfg_dict["clip"]),
        ent_coef=jnp.asarray(cfg_dict["ent_coef"]))
    state, nets = ppo_init(cfg, env_cfg, base, jnp.asarray(0.0),
                           jax.random.PRNGKey(seed))
    step = jax.jit(lambda s: ppo_train_step(cfg, env_cfg, base, nets, s))
    rewards = []
    for _ in range(iters):
        state, metrics = step(state)
        rewards.append(float(metrics["mean_reward"]))
    return float(np.mean(rewards[-max(1, iters // 4):]))


def tune(n_trials: int = 8, base_iters: int = 5, rounds: int = 2,
         seed: int = 0, out: str = "/tmp/hmt_tune.jsonl"):
    rng = random.Random(seed)
    pop = [sample_config(rng) for _ in range(n_trials)]
    budget = base_iters
    log = open(out, "a")
    for rnd in range(rounds):
        scored = []
        for i, c in enumerate(pop):
            score = train_briefly(c, budget, seed=seed + i)
            scored.append((score, c))
            rec = dict(round=rnd, budget=budget, score=score, **c)
            log.write(json.dumps(rec) + "\n")
            log.flush()
            print(rec, flush=True)
        scored.sort(key=lambda t: -t[0])
        keep = max(1, len(scored) // 2)
        pop = [c for _, c in scored[:keep]]     # successive halving
        budget *= 2
    best = scored[0]
    print("best:", best)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=2)
    a = ap.parse_args()
    tune(a.trials, a.iters, a.rounds)


if __name__ == "__main__":
    main()
