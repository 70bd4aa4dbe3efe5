"""Multi-device tests: dp-sharded RL training step, sharded env batch
(run on the 8-device virtual CPU mesh like the driver's dryrun)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mujoco_tpu.parallel.distributed import (dp_sharded_ppo_step,
                                                      shard_env_batch)
from humanoid_mujoco_tpu.parallel.mesh import make_mesh
from humanoid_mujoco_tpu.rl.env import EnvConfig, rl_humanoid_model
from humanoid_mujoco_tpu.rl.ppo import PPOConfig, ppo_init, ppo_train_step


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    base = rl_humanoid_model()
    env_cfg = EnvConfig(standup=True)
    cfg = PPOConfig(n_envs=16, rollout_len=2, n_minibatch=2, n_epochs=1,
                    hidden=(16, 16))
    state, nets = ppo_init(cfg, env_cfg, base, jnp.asarray(0.1),
                           jax.random.PRNGKey(0))
    return mesh, base, env_cfg, cfg, state, nets


class TestShardedTraining:
    def test_dp_step_runs_and_is_finite(self, setup):
        mesh, base, env_cfg, cfg, state, nets = setup
        step = jax.jit(lambda s: dp_sharded_ppo_step(
            mesh, cfg, env_cfg, base, nets, s))
        s2, metrics = step(state)
        assert np.isfinite(float(metrics["loss"]))
        assert s2.obs.shape == state.obs.shape

    def test_sharded_matches_unsharded(self, setup):
        mesh, base, env_cfg, cfg, state, nets = setup
        s_a, m_a = jax.jit(lambda s: ppo_train_step(
            cfg, env_cfg, base, nets, s))(state)
        s_b, m_b = jax.jit(lambda s: dp_sharded_ppo_step(
            mesh, cfg, env_cfg, base, nets, s))(state)
        # same math, different layout: losses agree to f32 reduce order
        np.testing.assert_allclose(float(m_a["loss"]),
                                   float(m_b["loss"]), rtol=2e-3)

    def test_shard_env_batch_places_leaves(self, setup):
        mesh, base, env_cfg, cfg, state, nets = setup
        es = shard_env_batch(mesh, state.env_state)
        leaf = es.phys.qpos
        assert len(leaf.sharding.device_set) == 8
