"""Honest stage bisection of the batched rollout hot path (TPU).

Times cumulative prefixes of the step pipeline on the real chip, each
probe CONSUMING every output of its stage (sum-reduced) so XLA dead-code
elimination cannot hollow the stage out (docs/NOTES.md round-5
honest-probe rule). Run:  python tools/profile_stages.py [--batch 1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from humanoid_mujoco_tpu.physics import humanoid
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.physics import step as step_mod
from humanoid_mujoco_tpu.physics.engine import (actuation, crb_mass_matrix,
                                                fwd_position, fwd_velocity,
                                                passive_force, rnea_bias)
from humanoid_mujoco_tpu.physics.collision import collide
from humanoid_mujoco_tpu.utils.timing import fetch


def tree_sum(*trees):
    tot = 0.0
    for t in trees:
        for leaf in jax.tree.leaves(t):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                         jnp.floating):
                tot = tot + jnp.sum(leaf)
    return tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    m = humanoid.build_humanoid()
    s0 = make_state(m, qpos=humanoid.stand_qpos(m))
    B, T = args.batch, args.horizon
    key = jax.random.PRNGKey(0)
    qpos_b = jnp.tile(s0.qpos, (B, 1)).at[:, 7:].add(
        0.03 * jax.random.normal(key, (B, 12)))
    sb = jax.tree.map(lambda x: jnp.tile(x, (B,) + (1,) * x.ndim), s0)
    sb = sb.replace(qpos=qpos_b)
    ctrl = jnp.zeros((m.struct.nu,), jnp.float32)

    def scan_probe(stage_fn):
        """stage_fn(state) -> (new_state, scalar). Scan T steps, vmapped."""
        def one(s):
            def body(s, _):
                s2, val = stage_fn(s)
                return s2, val
            sT, vals = jax.lax.scan(body, s, None, length=T)
            return tree_sum(sT, vals)
        return jax.jit(lambda sb: jnp.sum(jax.vmap(one)(sb)))

    # stage definitions (cumulative prefixes). Each returns a fake
    # next-state (advance qpos slightly so the scan carries real data
    # dependence) + the consumed sum.
    def advance(s, val):
        # data-dependent tiny perturbation so no stage is loop-invariant
        return s.replace(qpos=s.qpos + 1e-12 * val,
                         time=s.time + m.dt)

    def st_fk(s):
        kin = fwd_position(m, s.qpos)
        v = tree_sum(kin)
        return advance(s, v), v

    def st_vel(s):
        kin = fwd_position(m, s.qpos)
        vel = fwd_velocity(m, kin, s.qvel)
        v = tree_sum(kin, vel)
        return advance(s, v), v

    def st_crb(s):
        kin = fwd_position(m, s.qpos)
        vel = fwd_velocity(m, kin, s.qvel)
        M = crb_mass_matrix(m, kin)
        v = tree_sum(kin, vel, M)
        return advance(s, v), v

    def st_smooth(s):
        kin = fwd_position(m, s.qpos)
        vel = fwd_velocity(m, kin, s.qvel)
        M = crb_mass_matrix(m, kin)
        bias = rnea_bias(m, kin, vel, s.qvel)
        tau = actuation(m, s.qpos, s.qvel, ctrl)
        pf = passive_force(m, s.qpos, s.qvel)
        v = tree_sum(kin, vel, M, bias, tau, pf)
        return advance(s, v), v

    def st_collide(s):
        kin = fwd_position(m, s.qpos)
        vel = fwd_velocity(m, kin, s.qvel)
        M = crb_mass_matrix(m, kin)
        bias = rnea_bias(m, kin, vel, s.qvel)
        tau = actuation(m, s.qpos, s.qvel, ctrl)
        pf = passive_force(m, s.qpos, s.qvel)
        con = collide(m, kin.xpos, kin.xmat)
        v = tree_sum(kin, vel, M, bias, tau, pf, con)
        return advance(s, v), v

    def st_prep(s):
        out = step_mod._prepare_smooth(m, s, ctrl, None)
        v = tree_sum(out)
        return advance(s, v), v

    def st_raw(s):
        from humanoid_mujoco_tpu.physics.solver import (contact_raw,
                                                        limit_rows_data)
        kin, vel, M, qfs, cf, con, sel = step_mod._prepare_smooth(
            m, s, ctrl, None)
        dmask, rel, mu3, kcon, bcon, dcon = contact_raw(m, kin, con, sel)
        lpos, kl, bl, dl = limit_rows_data(m, s.qpos)
        v = tree_sum(kin, vel, M, qfs, cf, (dmask, rel, mu3, kcon, bcon,
                                            dcon, lpos, kl, bl, dl))
        return advance(s, v), v

    def st_full(s):
        s2, info = step_mod.step(m, s, ctrl)
        return s2, tree_sum(info.qacc) * 0.0

    stages = [("fk", st_fk), ("fk+vel", st_vel), ("fk+vel+crb", st_crb),
              ("smooth", st_smooth), ("smooth+collide", st_collide),
              ("prepare_smooth", st_prep), ("prep+raw_rows", st_raw),
              ("full_step", st_full)]

    names = [n for n, _ in stages]
    if len(sys.argv) > 1 and args.batch:
        pass
    results = {}
    for name, fn in stages:
        f = scan_probe(fn)
        fetch(f(sb))  # compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fetch(f(sb))
            best = min(best, time.perf_counter() - t0)
        results[name] = best * 1e3
        print(f"{name:18s} {best * 1e3:8.1f} ms "
              f"({B * T / best / 1e3:8.0f}k steps/s)", flush=True)

    prev = 0.0
    print("\ndeltas:")
    for name in names:
        print(f"{name:18s} +{results[name] - prev:7.1f} ms")
        prev = results[name]


if __name__ == "__main__":
    main()
