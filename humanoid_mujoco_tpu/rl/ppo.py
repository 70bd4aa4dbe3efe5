"""PPO in pure JAX over the on-device lockstep env batch.

Replaces the reference's SB3/rl_zoo3 PPO path (rl/tune_hyperparameters.py,
simulation/hyperparam_config.py): rollout collection, GAE, and clipped
surrogate updates all run inside one jit region; envs never leave the
device. The env batch axis is the same mesh axis the planners shard.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ..physics.model import Model
from .env import EnvConfig, EnvState, batch_reset, batch_step, \
    env_auto_reset
from .networks import GaussianPolicy, VFunction, gaussian_logp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PPOConfig:
    n_envs: int = dataclasses.field(default=256, metadata=dict(static=True))
    rollout_len: int = dataclasses.field(default=64,
                                         metadata=dict(static=True))
    n_minibatch: int = dataclasses.field(default=8,
                                         metadata=dict(static=True))
    n_epochs: int = dataclasses.field(default=4, metadata=dict(static=True))
    hidden: tuple = dataclasses.field(default=(256, 256, 256),
                                      metadata=dict(static=True))
    gamma: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.99))
    lam: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.95))
    clip: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.2))
    ent_coef: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.0))
    vf_coef: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.5))
    lr: float = dataclasses.field(default=3e-4, metadata=dict(static=True))
    max_grad_norm: float = dataclasses.field(default=0.5,
                                             metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PPOState:
    params: dict
    opt_state: tuple
    env_state: EnvState        # batched
    obs: jax.Array             # (B, obs_dim)
    rng: jax.Array
    update_count: jax.Array


def ppo_init(cfg: PPOConfig, env_cfg: EnvConfig, base_model: Model,
             rf: jax.Array, key: jax.Array, obs_dim: int = 30,
             act_dim: int = 12) -> Tuple[PPOState, object]:
    k_env, k_pi, k_v, k_next = jax.random.split(key, 4)
    es, obs = batch_reset(env_cfg, base_model, rf,
                          jax.random.split(k_env, cfg.n_envs))
    policy = GaussianPolicy(act_dim, cfg.hidden, state_dependent_std=False)
    value = VFunction(cfg.hidden)
    dummy = jnp.zeros((obs_dim,))
    params = dict(pi=policy.init(k_pi, dummy), v=value.init(k_v, dummy))
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.adam(cfg.lr))
    return PPOState(params=params, opt_state=tx.init(params),
                    env_state=es, obs=obs, rng=k_next,
                    update_count=jnp.asarray(0, jnp.int32)), (policy,
                                                              value, tx)


def _gae(rewards, values, last_value, dones, gamma, lam):
    """rewards/values/dones: (T, B); returns (advantages, returns)."""
    gamma = jnp.asarray(gamma, dtype=values.dtype)
    lam = jnp.asarray(lam, dtype=values.dtype)

    def body(carry, x):
        gae, next_v = carry
        r, v, d = x
        nonterm = 1.0 - d
        delta = (r + gamma * next_v * nonterm - v).astype(values.dtype)
        gae = delta + gamma * lam * nonterm * gae
        return (gae, v), gae

    (_, _), adv = jax.lax.scan(
        body, (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones), reverse=True)
    return adv, adv + values


def ppo_train_step(cfg: PPOConfig, env_cfg: EnvConfig, base_model: Model,
                   nets, state: PPOState) -> Tuple[PPOState, dict]:
    """Collect rollout_len steps from all envs + do the PPO update —
    one jit region."""
    policy, value, tx = nets

    def act(params, obs, key):
        # store the UNCLIPPED sample with its logp (SB3 semantics): the
        # (action, logp_old) pair must be consistent or importance
        # ratios at epoch 0 are biased for boundary actions; only the
        # copy sent to the env is clipped.
        mean, log_std = policy.apply(params["pi"], obs)
        eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
        a = mean + jnp.exp(log_std) * eps
        logp = gaussian_logp(mean, log_std, a)
        return a, logp

    def collect(carry, key):
        es, obs = carry
        a, logp = act(state.params, obs, key)
        v = value.apply(state.params["v"], obs)
        es, obs2, r, term, trunc = batch_step(env_cfg, base_model, es,
                                              jnp.clip(a, -1.0, 1.0))
        es, obs2, done = jax.vmap(
            lambda e, o, rr, t, tr: env_auto_reset(
                env_cfg, base_model, e, o, rr, t, tr)
        )(es, obs2, r, term, trunc)
        return (es, obs2), (obs, a, logp, v, r,
                            done.astype(obs.dtype), trunc)

    keys = jax.random.split(state.rng, cfg.rollout_len + 2)
    (es, obs_last), traj = jax.lax.scan(
        collect, (state.env_state, state.obs), keys[:-2])
    obs_t, act_t, logp_t, v_t, r_t, done_t, trunc_t = traj
    last_v = value.apply(state.params["v"], obs_last)
    adv, ret = _gae(r_t, v_t, last_v, done_t, cfg.gamma, cfg.lam)
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)

    # flatten (T, B) -> (N,)
    N = cfg.rollout_len * cfg.n_envs
    flat = lambda x: x.reshape((N,) + x.shape[2:])
    batch = tuple(map(flat, (obs_t, act_t, logp_t, adv, ret)))

    def loss_fn(params, mb):
        obs_b, act_b, logp_old, adv_b, ret_b = mb
        mean, log_std = policy.apply(params["pi"], obs_b)
        logp = gaussian_logp(mean, log_std, act_b)
        ratio = jnp.exp(logp - logp_old)
        pg = -jnp.mean(jnp.minimum(
            ratio * adv_b,
            jnp.clip(ratio, 1 - cfg.clip, 1 + cfg.clip) * adv_b))
        v = value.apply(params["v"], obs_b)
        v_loss = jnp.mean((v - ret_b) ** 2)
        ent = jnp.mean(jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e),
                               axis=-1))
        return pg + cfg.vf_coef * v_loss - cfg.ent_coef * ent, (pg, v_loss)

    def epoch(carry, key):
        params, opt_state = carry
        perm = jax.random.permutation(key, N)

        def minibatch(carry, idx):
            params, opt_state = carry
            mb = tuple(x[idx] for x in batch)
            (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mb)
            updates, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), l

        idxs = perm.reshape(cfg.n_minibatch, N // cfg.n_minibatch)
        (params, opt_state), losses = jax.lax.scan(
            minibatch, (params, opt_state), idxs)
        return (params, opt_state), losses.mean()

    (params, opt_state), losses = jax.lax.scan(
        epoch, (state.params, state.opt_state),
        jax.random.split(keys[-2], cfg.n_epochs))

    # success = fraction of COMPLETED episodes that ended by truncation
    # (standup: the success condition, reward_functions.py:356-372;
    # walk: survived the full time limit without falling) — episode-level,
    # not diluted per-step, and terminal-ended episodes count as failures.
    n_done = jnp.maximum(done_t.sum(), 1.0)
    metrics = dict(loss=losses.mean(), mean_reward=r_t.mean(),
                   episode_done_rate=done_t.mean(),
                   success_rate=trunc_t.astype(r_t.dtype).sum() / n_done)
    new_state = PPOState(params=params, opt_state=opt_state, env_state=es,
                         obs=obs_last, rng=keys[-1],
                         update_count=state.update_count + 1)
    return new_state, metrics
