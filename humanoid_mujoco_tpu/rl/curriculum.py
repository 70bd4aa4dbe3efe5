"""Adaptive domain-randomization curriculum.

Rebuild of rl/randomization_adaptation_callback.py:56-75: every
evaluation window, if success rate > target the randomization factor
steps up by +0.01 else down by -0.01 (clamped to [0, 1]); training stops
after `max_successes` evaluation successes at full randomization.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

SUCCESS_RATE_TARGET = 0.5
RAND_STEP = 0.01
MAX_SUCCESSES_AT_FULL = 10


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CurriculumState:
    randomization_factor: jax.Array   # ()
    successes_at_max: jax.Array       # () int32
    done: jax.Array                   # () bool


def curriculum_init(rf0: float = 0.0) -> CurriculumState:
    return CurriculumState(
        randomization_factor=jnp.asarray(rf0),
        successes_at_max=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False))


def curriculum_update(cs: CurriculumState, success_rate: jax.Array,
                      target: float = SUCCESS_RATE_TARGET
                      ) -> CurriculumState:
    ok = success_rate > target
    rf = jnp.clip(cs.randomization_factor
                  + jnp.where(ok, RAND_STEP, -RAND_STEP), 0.0, 1.0)
    at_max = cs.randomization_factor >= 1.0 - 1e-9
    succ = cs.successes_at_max + jnp.where(
        jnp.logical_and(ok, at_max), 1, 0)
    return CurriculumState(
        randomization_factor=rf, successes_at_max=succ,
        done=succ >= MAX_SUCCESSES_AT_FULL)
