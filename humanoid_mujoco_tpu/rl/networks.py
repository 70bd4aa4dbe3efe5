"""Policy/value networks for PPO/SAC (flax.linen).

Architectures mirror the reference's SB3 configs: SAC MlpPolicy with
net_arch [128, 128, 128] (rl/train.py:169-175) and the PPO search space's
[256, 256, 256] (simulation/hyperparam_config.py:5-29).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


class MLP(nn.Module):
    features: Sequence[int]
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x):
        act = dict(tanh=nn.tanh, relu=nn.relu)[self.activation]
        for f in self.features:
            x = act(nn.Dense(f)(x))
        return x


class GaussianPolicy(nn.Module):
    """Squashed-Gaussian actor (SAC) / diagonal-Gaussian actor (PPO)."""

    action_dim: int
    hidden: Sequence[int] = (128, 128, 128)
    activation: str = "tanh"
    state_dependent_std: bool = True   # SAC: yes; PPO: global log_std

    @nn.compact
    def __call__(self, obs):
        h = MLP(self.hidden, self.activation)(obs)
        mean = nn.Dense(self.action_dim)(h)
        if self.state_dependent_std:
            log_std = nn.Dense(self.action_dim)(h)
        else:
            log_std = self.param(
                "log_std", nn.initializers.zeros, (self.action_dim,))
            log_std = jnp.broadcast_to(log_std, mean.shape)
        return mean, jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)


class VFunction(nn.Module):
    hidden: Sequence[int] = (256, 256, 256)
    activation: str = "tanh"

    @nn.compact
    def __call__(self, obs):
        return nn.Dense(1)(MLP(self.hidden, self.activation)(obs))[..., 0]


class QFunction(nn.Module):
    hidden: Sequence[int] = (128, 128, 128)
    activation: str = "relu"

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        return nn.Dense(1)(MLP(self.hidden, self.activation)(x))[..., 0]


class DoubleQ(nn.Module):
    hidden: Sequence[int] = (128, 128, 128)

    @nn.compact
    def __call__(self, obs, act):
        q1 = QFunction(self.hidden)(obs, act)
        q2 = QFunction(self.hidden)(obs, act)
        return q1, q2


def sample_squashed(mean, log_std, key) -> Tuple[jax.Array, jax.Array]:
    """tanh-squashed Gaussian sample + log-prob (SAC)."""
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    pre = mean + std * eps
    act = jnp.tanh(pre)
    logp = jnp.sum(
        -0.5 * (eps ** 2 + 2 * log_std + jnp.log(2 * jnp.pi))
        - jnp.log(jnp.maximum(1 - act ** 2, 1e-6)), axis=-1)
    return act, logp


def gaussian_logp(mean, log_std, act) -> jax.Array:
    std = jnp.exp(log_std)
    return jnp.sum(
        -0.5 * (((act - mean) / std) ** 2 + 2 * log_std
                + jnp.log(2 * jnp.pi)), axis=-1)
