"""Multi-host initialization + dp-sharded RL training step.

The reference is single-host (SURVEY §2.4); multi-host scaling is this
framework's new capability: `init_distributed` brings up
jax.distributed across a pod slice, and `shard_train_step` runs the RL
collect+update step with the env batch sharded over the mesh's rollout
axis (pure dp — the model/params replicate; this workload has no tensor
dimension worth tp/pp).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS, make_mesh


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up (no-op single-process). Reads the
    standard env vars when args are omitted."""
    coordinator = coordinator or os.environ.get("HMT_COORDINATOR")
    if coordinator is None:
        return  # single-process
    if num_processes is None:
        num_processes = int(os.environ.get("HMT_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("HMT_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)


def shard_env_batch(mesh: Mesh, tree):
    """Shard every leaf's leading (env/candidate) axis over the mesh."""
    sh = NamedSharding(mesh, P(AXIS))
    rep = NamedSharding(mesh, P())

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sh)
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)


def dp_sharded_ppo_step(mesh: Mesh, cfg, env_cfg, base_model, nets,
                        state):
    """PPO train step with the env batch constrained to the mesh axis.

    Gradients reduce across devices automatically (params replicated,
    batch sharded -> XLA inserts the psum). Returns (state, metrics).
    """
    from ..rl.ppo import ppo_train_step

    es = jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(AXIS)))
        if hasattr(x, "ndim") and x.ndim >= 1 else x,
        state.env_state)
    state = state.__class__(
        params=state.params, opt_state=state.opt_state, env_state=es,
        obs=jax.lax.with_sharding_constraint(
            state.obs, NamedSharding(mesh, P(AXIS))),
        rng=state.rng, update_count=state.update_count)
    return ppo_train_step(cfg, env_cfg, base_model, nets, state)
