"""Bisect the qfrc_smooth TPU mismatch: per-dof errors under
(a) gravity only, (b) +qvel, (c) +ctrl, (d) +root tilt."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from humanoid_mujoco_tpu.physics import humanoid, pallas_smooth

m = humanoid.build_humanoid()
B = 8
q0 = humanoid.stand_qpos(m)
key = jax.random.PRNGKey(0)
params = pallas_smooth._pack_params(m)

qpos_r = jnp.tile(q0, (B, 1)).at[:, 7:].add(
    0.05 * jax.random.normal(key, (B, 12))).astype(jnp.float32)
qpos_tilt = qpos_r.at[:, 3:7].add(
    0.05 * jax.random.normal(jax.random.PRNGKey(9), (B, 4)))
qvel_r = (0.2 * jax.random.normal(jax.random.PRNGKey(1), (B, 18))
          ).astype(jnp.float32)
ctrl_r = (0.3 * jax.random.normal(jax.random.PRNGKey(2), (B, 12))
          ).astype(jnp.float32)
z18 = jnp.zeros((B, 18), jnp.float32)
z12 = jnp.zeros((B, 12), jnp.float32)

cases = {
    "gravity_only": (jnp.tile(q0, (B, 1)).astype(jnp.float32), z18, z12),
    "qpos_rand": (qpos_r, z18, z12),
    "qpos_tilt": (qpos_tilt, z18, z12),
    "qvel": (qpos_r, qvel_r, z12),
    "full": (qpos_tilt, qvel_r, ctrl_r),
}

for name, (qp, qv, ct) in cases.items():
    out = jax.jit(lambda a, b, c: pallas_smooth.smooth_batched(
        m.struct, a, b, c, None, params))(qp, qv, ct)
    ref = jax.jit(jax.vmap(lambda a, b, c:
                           pallas_smooth.jax_smooth_single(m, a, b, c)))(
        qp, qv, ct)
    r = np.asarray(ref[1], np.float64)
    o = np.asarray(out[1], np.float64)
    err = np.max(np.abs(r - o), axis=0)      # per dof
    print(name, "scale", f"{np.max(np.abs(r)):.3e}")
    print("  per-dof err:", " ".join(f"{e:.1e}" for e in err), flush=True)
