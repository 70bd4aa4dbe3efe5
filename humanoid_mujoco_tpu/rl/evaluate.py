"""Policy evaluation + training-curve plotting.

Rebuild of the reference's eval tooling: rl/visualize_policy.py (rollout
a trained policy), rl/plot_training_curves.py (reward / episode length
vs randomization factor), and the EvalCallback's survival-time metric
(cpu_env.py reward_override path). Headless: exports trajectories +
CSV + matplotlib PNGs instead of the interactive viewer.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def load_policy(ckpt_path: str, hidden=(128, 128, 128)):
    from .networks import GaussianPolicy
    with open(ckpt_path, "rb") as f:
        params = pickle.load(f)
    if isinstance(params, dict) and "state" in params:
        # full train checkpoint (train.py _save_ckpt): extract pi params
        st = params["state"]
        params = (st.params if hasattr(st, "params")
                  else st["params"])
    policy = GaussianPolicy(12, hidden, state_dependent_std=True)

    def act(obs):
        mean, _ = policy.apply(params["pi"], jnp.asarray(obs))
        return jnp.tanh(mean)

    return jax.jit(act)


def evaluate(ckpt: str, rand_factors=(0.0, 0.25, 0.5, 0.75, 1.0),
             n_episodes: int = 16, max_steps: int = 2000,
             standup: bool = True, out: str = "/tmp/hmt_eval"):
    """Reward + survival/success stats per randomization factor."""
    from .env import EnvConfig, batch_reset, batch_step, rl_humanoid_model

    os.makedirs(out, exist_ok=True)
    act = load_policy(ckpt)
    base = rl_humanoid_model()
    cfg = EnvConfig(standup=standup,
                    max_sim_time=10.0 if standup else -1.0)
    rows = []
    for rf in rand_factors:
        es, obs = jax.jit(lambda k: batch_reset(
            cfg, base, jnp.asarray(rf), k))(
                jax.random.split(jax.random.PRNGKey(0), n_episodes))
        stp = jax.jit(lambda e, a: batch_step(cfg, base, e, a))
        total_r = np.zeros(n_episodes)
        alive = np.ones(n_episodes, bool)
        lengths = np.zeros(n_episodes)
        success = np.zeros(n_episodes, bool)
        traj = []
        for t in range(max_steps):
            a = act(obs)
            es, obs, r, term, trunc = stp(es, a)
            term = np.array(term)
            trunc = np.array(trunc)
            total_r += np.array(r) * alive
            lengths += alive
            success |= trunc & alive
            alive &= ~(term | trunc)
            if t % 10 == 0:
                traj.append(np.array(es.phys.qpos[0]))
            if not alive.any():
                break
        rows.append(dict(rand_factor=rf,
                         mean_reward=float(total_r.mean()),
                         mean_episode_len=float(lengths.mean()),
                         success_rate=float(success.mean())))
        np.save(os.path.join(out, f"traj_rf{rf:.2f}.npy"),
                np.stack(traj))
        print(json.dumps(rows[-1]), flush=True)

    with open(os.path.join(out, "eval.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    _plot(rows, out)
    return rows


def _plot(rows, out):
    """Training-curve style plots (plot_training_curves.py analog)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    rf = [r["rand_factor"] for r in rows]
    fig, axes = plt.subplots(1, 3, figsize=(12, 3.5))
    for ax, key, label in zip(
            axes, ("mean_reward", "mean_episode_len", "success_rate"),
            ("mean reward", "episode length", "success rate")):
        ax.plot(rf, [r[key] for r in rows], "o-")
        ax.set_xlabel("randomization factor")
        ax.set_ylabel(label)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(out, "eval_curves.png"), dpi=120)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--episodes", type=int, default=16)
    ap.add_argument("--walk", dest="standup", action="store_false")
    ap.add_argument("--out", default="/tmp/hmt_eval")
    a = ap.parse_args()
    evaluate(a.ckpt, n_episodes=a.episodes, standup=a.standup, out=a.out)


if __name__ == "__main__":
    main()
