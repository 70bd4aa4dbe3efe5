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
    steps_per_update: int = dataclasses.field(default=32,
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
    # windowed episode counters: success_rate = d(trunc)/d(done) over
    # the train step, not a per-step binary artifact
    ep_done: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.0))
    ep_trunc: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.asarray(0.0))


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
    """steps_per_update rounds of (one env step for all envs + one
    gradient update) in ONE jit region — SB3's train_freq=1 /
    gradient_steps=1 cadence with the per-call dispatch amortized
    (the TPU-tunnel dispatch latency dominates at 1 round/call)."""
    policy, qnet, tx = nets

    def round_(carry, key):
        p, opts, buf, es, obs, dc, tc = carry
        k_act, k_samp, k_crit, k_pi, = jax.random.split(key, 4)

        # --- one env step for all envs ---
        mean, log_std = policy.apply(p["pi"], obs)
        a, _ = sample_squashed(mean, log_std, k_act)
        es, obs2, r, term, trunc = batch_step(env_cfg, base_model, es, a)
        es, obs2_reset, done = jax.vmap(
            lambda e, o, rr, t, tr: env_auto_reset(
                env_cfg, base_model, e, o, rr, t, tr)
        )(es, obs2, r, term, trunc)
        # bootstrap-cut flag is TERMINAL only: time-limit truncations
        # (incl. the standup success condition) must still bootstrap the
        # Q target (SB3 handle_timeout_termination semantics).
        buf = buf.add_batch(obs, a, r, obs2, term.astype(obs.dtype))
        dc = dc + done.astype(r.dtype).sum()
        tc = tc + trunc.astype(r.dtype).sum()

        # --- one gradient update ---
        ob, ab, rb, nob, db = buf.sample(k_samp, cfg.batch_size)
        alpha = jnp.exp(p["log_alpha"])

        mean2, ls2 = policy.apply(p["pi"], nob)
        a2, logp2 = sample_squashed(mean2, ls2, k_crit)
        q1t, q2t = qnet.apply(p["q_target"], nob, a2)
        target = rb + cfg.gamma * (1 - db) * (
            jnp.minimum(q1t, q2t) - alpha * logp2)

        def q_loss(qp):
            q1, q2 = qnet.apply(qp, ob, ab)
            return (jnp.mean((q1 - target) ** 2)
                    + jnp.mean((q2 - target) ** 2))

        ql, gq = jax.value_and_grad(q_loss)(p["q"])
        uq, oq = tx.update(gq, opts["q"], p["q"])
        q_new = optax.apply_updates(p["q"], uq)

        def pi_loss(pip):
            mean, ls = policy.apply(pip, ob)
            aa, logp = sample_squashed(mean, ls, k_pi)
            q1, q2 = qnet.apply(q_new, ob, aa)
            return jnp.mean(alpha * logp - jnp.minimum(q1, q2)), logp

        (pl, logp), gp = jax.value_and_grad(pi_loss, has_aux=True)(p["pi"])
        up, op = tx.update(gp, opts["pi"], p["pi"])
        pi_new = optax.apply_updates(p["pi"], up)

        def alpha_loss(la):
            return -jnp.mean(jnp.exp(la) * (jax.lax.stop_gradient(logp)
                                            + cfg.target_entropy))

        al, ga = jax.value_and_grad(alpha_loss)(p["log_alpha"])
        ua, oa = tx.update(ga, opts["alpha"], p["log_alpha"])
        la_new = optax.apply_updates(p["log_alpha"], ua)

        qt_new = jax.tree.map(
            lambda t, s: t * (1 - cfg.tau) + s * cfg.tau,
            p["q_target"], q_new)

        p_new = dict(pi=pi_new, q=q_new, q_target=qt_new,
                     log_alpha=la_new)
        opts_new = dict(pi=op, q=oq, alpha=oa)
        return (p_new, opts_new, buf, es, obs2_reset, dc, tc), \
            (r.mean(), ql, pl, alpha)

    keys = jax.random.split(state.rng, cfg.steps_per_update + 1)
    carry0 = (state.params, state.opt_states, state.buffer,
              state.env_state, state.obs, state.ep_done, state.ep_trunc)
    (p, opts, buf, es, obs, dc, tc), (rews, qls, pls, alphas) = \
        jax.lax.scan(round_, carry0, keys[:-1])

    new_state = SACState(
        params=p, opt_states=opts, buffer=buf, env_state=es, obs=obs,
        rng=keys[-1],
        step_count=state.step_count + cfg.steps_per_update * cfg.n_envs,
        ep_done=dc, ep_trunc=tc)
    # windowed episode-level success over THIS call: completed episodes
    # that ended by truncation (standup success / walk survival)
    d_done = dc - state.ep_done
    d_trunc = tc - state.ep_trunc
    metrics = dict(q_loss=qls.mean(), pi_loss=pls.mean(),
                   alpha=alphas[-1], mean_reward=rews.mean(),
                   episodes_done=d_done,
                   success_rate=d_trunc / jnp.maximum(d_done, 1.0))
    return new_state, metrics
