"""Multi-chip scaling: candidate/env batches sharded over a device mesh.

The reference has NO distributed backend — its parallelism is a thread
pool fanning <=128 rollouts on one host (mjpc/threadpool.cc,
sampling/planner.cc:342-380). The TPU-native replacement (SURVEY §2.4):
the candidate batch is a named mesh axis; each chip rolls its shard in
lockstep and the winner selection is a tiny all_gather + argmin over ICI.
The same mesh axis shards RL env batches (rl/) and elite reductions
(planners/cem.py) — data parallelism is the natural (and only) axis for
this workload; model state is replicated (the model is tiny).

Works identically on a real pod slice and on the
xla_force_host_platform_device_count virtual CPU mesh the tests use.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..physics.model import Model, State
from ..rollout import rollout_spline
from ..tasks.base import Task
from .. import planners
from ..planners.policy import SplinePolicy, resample_policy
from ..planners.sampling import PlanInfo, SamplingConfig, sample_candidates

AXIS = "rollout"


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices).reshape(-1), (AXIS,))


def shard_batch(mesh: Mesh, tree):
    """Constrain the leading axis of every leaf to the rollout axis."""
    sh = NamedSharding(mesh, P(AXIS))
    return jax.tree.map(
        lambda x: jax.lax.with_sharding_constraint(x, sh), tree)


def sharded_sampling_plan(mesh: Mesh, m: Model, task: Task,
                          cfg: SamplingConfig, policy: SplinePolicy,
                          state: State, rng: jax.Array
                          ) -> Tuple[SplinePolicy, PlanInfo]:
    """Predictive-sampling iteration with candidates sharded over `mesh`.

    Same math as planners.sampling.sampling_plan; the rollout fan-out runs
    shard_map'ed so each device owns nsample/n_devices lockstep rollouts,
    and the winner is reduced with one all_gather of the (tiny) returns
    vector over ICI (the psum/argmin elite reduction of SURVEY §2.4).
    """
    ndev = mesh.devices.size
    assert cfg.nsample % ndev == 0, (
        f"nsample={cfg.nsample} must divide the mesh size {ndev}")

    horizon_s = cfg.horizon * m.dt
    nominal = resample_policy(policy, state.time, horizon_s, cfg.nknots,
                              cfg.order)
    cands = sample_candidates(m, cfg, nominal.values, rng)
    cands = jax.lax.with_sharding_constraint(
        cands, NamedSharding(mesh, P(AXIS)))

    def shard_body(local_cands):
        def run(values):
            r = rollout_spline(m, task, state, nominal.times, values,
                               cfg.order, cfg.horizon,
                               solver_iters=cfg.solver_iters)
            return r.total_return

        local_returns = jax.vmap(run)(local_cands)     # (N/d,)
        # tiny cross-chip reduction: returns ride ICI, rollouts never move
        all_returns = jax.lax.all_gather(local_returns, AXIS)  # (d, N/d)
        loc_win = jnp.argmin(local_returns)
        local_best = local_cands[loc_win]
        best_values = jax.lax.all_gather(local_best, AXIS)     # (d, K, nu)
        dev_min = jnp.min(all_returns, axis=-1)                # (d,)
        win_dev = jnp.argmin(dev_min)
        return (all_returns.reshape(-1), best_values[win_dev])

    returns, best_values = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(AXIS),),
        out_specs=(P(), P()),
        check_vma=False,
    )(cands)

    winner = jnp.argmin(returns)
    new_policy = SplinePolicy(times=nominal.times, values=best_values)
    info = PlanInfo(returns=returns, winner=winner,
                    best_return=returns[winner], nominal_return=returns[0],
                    improvement=returns[0] - returns[winner])
    return new_policy, info
