"""Policy video export — the generate_policy_videos.py analog.

The reference rolls the trained SB3 policy in the randomized env and
writes 9 green-screen MP4s of ~5 s each through cv2.VideoWriter
(/root/reference/rl/generate_policy_videos.py:36-51). Same shape here:
roll the JAX policy in the on-device env, record qpos at control rate,
render with the sphere-cloud software renderer (viz/render.py) and
write MP4s.

Usage:
  python -m humanoid_mujoco_tpu.rl.videos --ckpt ckpt.pkl \
      --out /tmp/videos --n 9 --seconds 5 --rand 0.0 [--greenscreen]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def record_episode(ckpt: str | None, seconds: float = 5.0,
                   randomization_factor: float = 0.0, seed: int = 0,
                   standup: bool = True):
    """Roll one episode; returns (env_model, qpos trajectory (T, nq))."""
    from .env import EnvConfig, env_reset, env_step, rl_humanoid_model
    from .evaluate import load_policy

    act = (load_policy(ckpt) if ckpt
           else jax.jit(lambda o: jnp.zeros(12)))
    cfg = EnvConfig(standup=standup, max_sim_time=seconds)
    base = rl_humanoid_model()
    es, obs = jax.jit(lambda k: env_reset(
        cfg, base, jnp.asarray(randomization_factor, jnp.float32), k))(
            jax.random.PRNGKey(seed))
    stp = jax.jit(lambda e, a: env_step(cfg, base, e, a))
    traj = [np.asarray(es.phys.qpos)]
    n_steps = int(seconds * 500)       # 500 Hz control
    for _ in range(n_steps):
        es, obs, r, term, trunc = stp(es, act(obs))
        traj.append(np.asarray(es.phys.qpos))
        if bool(term) or bool(trunc):
            break
    return es.patch.apply(base), np.stack(traj)


def generate_policy_videos(ckpt: str | None, out: str, n_videos: int = 9,
                           seconds: float = 5.0,
                           randomization_factor: float = 0.0,
                           greenscreen: bool = True, fps: float = 50.0,
                           width: int = 480, height: int = 360):
    """Write `n_videos` MP4s (9×5 s green-screen, the reference's
    default grid). Returns the list of written paths."""
    from ..viz.render import render_trajectory

    os.makedirs(out, exist_ok=True)
    paths = []
    for i in range(n_videos):
        em, qtraj = record_episode(ckpt, seconds, randomization_factor,
                                   seed=i)
        # control rate 500 Hz -> video fps: stride the trajectory
        stride = max(1, int(round(500.0 / fps)))
        p = render_trajectory(em, qtraj[::stride],
                              os.path.join(out, f"policy_{i}.mp4"),
                              fps=fps, width=width, height=height,
                              greenscreen=greenscreen)
        paths.append(p)
        print(f"wrote {p} ({qtraj.shape[0]} steps)", flush=True)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="policy checkpoint (.pkl); zero policy if unset")
    ap.add_argument("--out", default="/tmp/hmt_videos")
    ap.add_argument("--n", type=int, default=9)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--rand", type=float, default=0.0)
    ap.add_argument("--greenscreen", action="store_true")
    ap.add_argument("--fps", type=float, default=50.0)
    args = ap.parse_args()
    generate_policy_videos(args.ckpt, args.out, args.n, args.seconds,
                           args.rand, args.greenscreen, args.fps)


if __name__ == "__main__":
    main()
