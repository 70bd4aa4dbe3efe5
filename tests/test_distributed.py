"""Multi-process jax.distributed validation — the multi-host code path
run for real: two OS processes, 4 virtual CPU devices each, one
8-device global mesh, gloo cross-process collectives.

The reference is single-host (SURVEY §2.4); multi-host scaling is this
framework's new capability, previously only exercised single-process.
This test brings up `parallel.distributed.init_distributed` across two
controllers and checks (a) global device visibility, (b) a cross-process
psum, (c) the sharded sampling plan producing identical winners on both
controllers (SPMD agreement).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
# the axon sitecustomize force-registers the TPU tunnel platform and
# overrides jax_platforms; override it back before any backend use
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from humanoid_mujoco_tpu.parallel.distributed import (init_distributed,
                                                      shard_env_batch)
from humanoid_mujoco_tpu.parallel.mesh import (AXIS, make_mesh,
                                               sharded_sampling_plan)

init_distributed()  # reads HMT_COORDINATOR / HMT_NUM_PROCESSES / HMT_PROCESS_ID
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4, jax.local_device_count()

mesh = make_mesh()

# (b) cross-process reduction: global iota sharded over 8 devices,
# summed inside jit -> 0+1+...+7 = 28 on every controller.
import numpy as np
sh = NamedSharding(mesh, P(AXIS))
local = np.arange(8, dtype=np.float32)[
    jax.process_index() * 4:(jax.process_index() + 1) * 4]
garr = jax.make_array_from_process_local_data(sh, local, (8,))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
assert float(total) == 28.0, float(total)

# (c) SPMD sampling plan over the global mesh (particle model, tiny)
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.planners.policy import init_policy
from humanoid_mujoco_tpu.planners.sampling import SamplingConfig
from humanoid_mujoco_tpu.tasks import get_task, particle_model

m = particle_model(dt=0.02)
task = get_task("ParticleFixed")
state = make_state(m, qpos=jnp.array([0.2, -0.1]))
cfg = SamplingConfig(nsample=8, horizon=5, nknots=3)
pol = init_policy(m, cfg.nknots)
new_pol, info = sharded_sampling_plan(mesh, m, task, cfg, pol, state,
                                      jax.random.PRNGKey(0))
best = float(info.best_return)
assert best <= float(info.nominal_return) + 1e-6
print(f"RESULT {jax.process_index()} {int(info.winner)} {best:.6f}",
      flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_mesh(tmp_path):
    port = _free_port()
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)        # worker sets its own (4 devices)
        env.pop("JAX_PLATFORMS", None)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["PYTHONPATH"] = os.pathsep.join(
            [repo] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                      if p])  # prepend repo, keep axon sitecustomize path
        env.update(HMT_COORDINATOR=f"127.0.0.1:{port}",
                   HMT_NUM_PROCESSES="2", HMT_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
    results = [line for out in outs for line in out.splitlines()
               if line.startswith("RESULT")]
    assert len(results) == 2, outs
    # SPMD agreement: both controllers compute the same winner + return
    w0, w1 = (r.split()[2:] for r in results)
    assert w0 == w1, results
