"""Ground-truth "estimator" — the registry's null option
(mjpc/estimators/include.cc:23-38 "Ground Truth"): passes the true
simulation state through unchanged. Useful as the baseline in estimator
comparisons and for pure-simulation control loops.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax

from ..physics.model import Model, State
from ..physics.step import step


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GroundTruthState:
    state: State


def ground_truth_init(m: Model, state: State) -> GroundTruthState:
    return GroundTruthState(state=state)


def ground_truth_update(m: Model, gt: GroundTruthState, ctrl: jax.Array,
                        true_state: State
                        ) -> Tuple[GroundTruthState, jax.Array]:
    import jax.numpy as jnp
    return GroundTruthState(state=true_state), jnp.asarray(
        0.0, dtype=true_state.qpos.dtype)
