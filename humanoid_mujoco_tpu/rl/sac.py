"""SAC in pure JAX — the reference's primary training algorithm
(rl/train.py:160-175: SB3 SAC, MlpPolicy 3x128, batch = 4*n_envs,
buffer 1e6) rebuilt with an ON-DEVICE replay buffer so collection and
updates share one jit region.
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
from .networks import DoubleQ, GaussianPolicy, sample_squashed


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SACConfig:
    n_envs: int = dataclasses.field(default=256, metadata=dict(static=True))
    buffer_size: int = dataclasses.field(default=262144,
                                         metadata=dict(static=True))
    batch_size: int = dataclasses.field(default=1024,
                                        metadata=dict(static=True))
    hidden: tuple = dataclasses.field(default=(128, 128, 128),
                                      metadata=dict(static=True))
    steps_per_update: int = dataclasses.field(default=1,
                                              metadata=dict(static=True))
    gamma: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.99))
    tau: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.005))
    lr: float = dataclasses.field(default=3e-4, metadata=dict(static=True))
    target_entropy: float = dataclasses.field(
        default=-12.0, metadata=dict(static=True))  # -act_dim (SB3 "auto")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ReplayBuffer:
    obs: jax.Array        # (cap, obs_dim)
    act: jax.Array
    rew: jax.Array
    next_obs: jax.Array
    done: jax.Array
    ptr: jax.Array        # () int32
    size: jax.Array       # () int32

    def add_batch(self, obs, act, rew, next_obs, done):
        cap = self.obs.shape[0]
        n = obs.shape[0]
        idx = jnp.mod(self.ptr + jnp.arange(n), cap)
        return ReplayBuffer(
            obs=self.obs.at[idx].set(obs),
            act=self.act.at[idx].set(act),
            rew=self.rew.at[idx].set(rew),
            next_obs=self.next_obs.at[idx].set(next_obs),
            done=self.done.at[idx].set(done),
            ptr=jnp.mod(self.ptr + n, cap),
            size=jnp.minimum(self.size + n, cap))

    def sample(self, key, batch_size):
        idx = jax.random.randint(key, (batch_size,), 0,
                                 jnp.maximum(self.size, 1))
        return (self.obs[idx], self.act[idx], self.rew[idx],
                self.next_obs[idx], self.done[idx])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SACState:
    params: dict          # pi, q, q_target, log_alpha
    opt_states: dict
    buffer: ReplayBuffer
    env_state: EnvState
    obs: jax.Array
    rng: jax.Array
    step_count: jax.Array


def sac_init(cfg: SACConfig, env_cfg: EnvConfig, base_model: Model,
             rf: jax.Array, key: jax.Array, obs_dim: int = 30,
             act_dim: int = 12) -> Tuple[SACState, object]:
    ks = jax.random.split(key, 5)
    es, obs = batch_reset(env_cfg, base_model, rf,
                          jax.random.split(ks[0], cfg.n_envs))
    policy = GaussianPolicy(act_dim, cfg.hidden, state_dependent_std=True)
    qnet = DoubleQ(cfg.hidden)
    dummy_o = jnp.zeros((obs_dim,))
    dummy_a = jnp.zeros((act_dim,))
    pi = policy.init(ks[1], dummy_o)
    q = qnet.init(ks[2], dummy_o, dummy_a)
    params = dict(pi=pi, q=q, q_target=q,
                  log_alpha=jnp.asarray(0.0))
    tx = optax.adam(cfg.lr)
    opt_states = dict(pi=tx.init(pi), q=tx.init(q),
                      alpha=tx.init(params["log_alpha"]))
    cap = cfg.buffer_size
    buf = ReplayBuffer(
        obs=jnp.zeros((cap, obs_dim)), act=jnp.zeros((cap, act_dim)),
        rew=jnp.zeros((cap,)), next_obs=jnp.zeros((cap, obs_dim)),
        done=jnp.zeros((cap,)), ptr=jnp.asarray(0, jnp.int32),
        size=jnp.asarray(0, jnp.int32))
    return SACState(params=params, opt_states=opt_states, buffer=buf,
                    env_state=es, obs=obs, rng=ks[3],
                    step_count=jnp.asarray(0, jnp.int32)), (policy, qnet,
                                                            tx)


def sac_train_step(cfg: SACConfig, env_cfg: EnvConfig, base_model: Model,
                   nets, state: SACState) -> Tuple[SACState, dict]:
    """steps_per_update env steps (all envs) + one gradient update."""
    policy, qnet, tx = nets
    p = state.params

    def env_roll(carry, key):
        es, obs, buf = carry
        mean, log_std = policy.apply(p["pi"], obs)
        a, _ = sample_squashed(mean, log_std, key)
        es, obs2, r, term, trunc = batch_step(env_cfg, es, a)
        es, obs2_reset, done = jax.vmap(
            lambda e, o, rr, t, tr: env_auto_reset(
                env_cfg, base_model, e, o, rr, t, tr)
        )(es, obs2, r, term, trunc)
        # bootstrap-cut flag is TERMINAL only: time-limit truncations
        # (incl. the standup success condition) must still bootstrap the
        # Q target (SB3 handle_timeout_termination semantics).
        buf = buf.add_batch(obs, a, r, obs2, term.astype(obs.dtype))
        return (es, obs2_reset, buf), (r, term, trunc)

    keys = jax.random.split(state.rng, cfg.steps_per_update + 4)
    (es, obs, buf), (rews, terms, truncs) = jax.lax.scan(
        env_roll, (state.env_state, state.obs, state.buffer),
        keys[:cfg.steps_per_update])

    ob, ab, rb, nob, db = buf.sample(keys[-1], cfg.batch_size)
    alpha = jnp.exp(p["log_alpha"])

    # --- critic ---
    mean2, ls2 = policy.apply(p["pi"], nob)
    a2, logp2 = sample_squashed(mean2, ls2, keys[-2])
    q1t, q2t = qnet.apply(p["q_target"], nob, a2)
    target = rb + cfg.gamma * (1 - db) * (
        jnp.minimum(q1t, q2t) - alpha * logp2)

    def q_loss(qp):
        q1, q2 = qnet.apply(qp, ob, ab)
        return jnp.mean((q1 - target) ** 2) + jnp.mean((q2 - target) ** 2)

    ql, gq = jax.value_and_grad(q_loss)(p["q"])
    uq, oq = tx.update(gq, state.opt_states["q"], p["q"])
    q_new = optax.apply_updates(p["q"], uq)

    # --- actor ---
    def pi_loss(pip):
        mean, ls = policy.apply(pip, ob)
        a, logp = sample_squashed(mean, ls, keys[-3])
        q1, q2 = qnet.apply(q_new, ob, a)
        return jnp.mean(alpha * logp - jnp.minimum(q1, q2)), logp

    (pl, logp), gp = jax.value_and_grad(pi_loss, has_aux=True)(p["pi"])
    up, op = tx.update(gp, state.opt_states["pi"], p["pi"])
    pi_new = optax.apply_updates(p["pi"], up)

    # --- temperature (SB3 ent_coef="auto") ---
    def alpha_loss(la):
        return -jnp.mean(jnp.exp(la) * (jax.lax.stop_gradient(logp)
                                        + cfg.target_entropy))

    al, ga = jax.value_and_grad(alpha_loss)(p["log_alpha"])
    ua, oa = tx.update(ga, state.opt_states["alpha"], p["log_alpha"])
    la_new = optax.apply_updates(p["log_alpha"], ua)

    # --- target polyak ---
    qt_new = jax.tree.map(lambda t, s: t * (1 - cfg.tau) + s * cfg.tau,
                          p["q_target"], q_new)

    new_state = SACState(
        params=dict(pi=pi_new, q=q_new, q_target=qt_new,
                    log_alpha=la_new),
        opt_states=dict(pi=op, q=oq, alpha=oa),
        buffer=buf, env_state=es, obs=obs, rng=keys[-4],
        step_count=state.step_count + cfg.steps_per_update * cfg.n_envs)
    # episode-level success: completed episodes ending by truncation
    # (standup success / walk survival), not per-step dilution.
    dones = jnp.logical_or(terms, truncs).astype(rews.dtype)
    n_done = jnp.maximum(dones.sum(), 1.0)
    metrics = dict(q_loss=ql, pi_loss=pl, alpha=alpha,
                   mean_reward=rews.mean(),
                   success_rate=truncs.astype(rews.dtype).sum() / n_done)
    return new_state, metrics
