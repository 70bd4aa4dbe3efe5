"""Quadruped Hill — the reference registry's "Quadruped Hill" entry
(mjpc/tasks/quadruped/quadruped.cc:726-817, tasks.cc:72).

The A1 quadruped (same model as Quadruped Flat) walks a waypoint
circuit over non-flat terrain. The reference's terrain is a PNG
heightfield (task_hill.xml); here the hill is a procedural Gaussian
bump sampled into the engine's bilinear heightfield, and the waypoint
keyframes (task_hill.xml:80-88 mpos/mquat circuit) become a generated
ring of poses around the hill with headings facing travel.

Residual (quadruped.cc:726-770), all quadratic norms
(task_hill.xml:63-66):
    Stand    (1): (trunk z - avg foot z) - height goal   [weight 1.0]
    Body Pos (3): trunk position - waypoint position     [weight 5.0]
    Body Rot (9): R(trunk) - R(waypoint quat), flattened [weight 1.0]
    Control (12): ctrl - home pose                       [weight 0.25]

Transition (quadruped.cc:776-817): when position error <= 0.15 AND
quaternion geodesic distance 1 - |q . q_goal| <= 0.15, advance to the
next waypoint (wrapping) — the waypoint index lives in `task.mode` and
the active goal pose is written into the "goal" mocap body, exactly the
reference's mocap_pos/mocap_quat handoff.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import NormType
from ..physics.math import quat_to_mat
from ..physics.model import Model, State
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task
from .quadruped import _FEET, _HOME_LEG, quadruped_model

_TOL = 0.15              # waypoint tolerance (quadruped.cc:805)
_HILL_H = 0.35           # peak height (m)
_HILL_SIGMA = 1.2        # Gaussian width (m)
_N_WAYPOINTS = 8
_RING_R = 1.6


def _hill_height_np(x, y, hill_h: float = _HILL_H):
    return hill_h * np.exp(-(x * x + y * y) / (2.0 * _HILL_SIGMA ** 2))


def quadruped_hill_model(dt: float = 0.004, dtype=jnp.float32,
                         hill_h: float = _HILL_H) -> Model:
    """A1 on a Gaussian-hill heightfield (task_hill.xml terrain);
    `hill_h` scales the peak (the reference scales its PNG heightfield
    the same way via hfield size attributes)."""
    n, half = 64, 4.0
    m = quadruped_model(dt=dt, dtype=dtype, hfield_shape=(n, n),
                        hfield_halfsize=(half, half))
    xs = np.linspace(-half, half, n)
    X, Y = np.meshgrid(xs, xs, indexing="xy")
    return m.replace(
        hfield_data=jnp.asarray(_hill_height_np(X, Y, hill_h),
                                dtype=dtype))


def waypoints(dtype=jnp.float32, n: int = _N_WAYPOINTS,
              ring_r: float = _RING_R, hill_h: float = _HILL_H):
    """Ring of poses around the hill, headings facing travel
    (the task_hill.xml keyframe circuit analog)."""
    pos, quat = [], []
    for i in range(n):
        th = 2.0 * np.pi * i / n
        x, y = ring_r * np.cos(th), ring_r * np.sin(th)
        z = _hill_height_np(x, y, hill_h) + 0.26
        pos.append([x, y, z])
        yaw = th + np.pi / 2.0          # tangent, counter-clockwise
        quat.append([np.cos(yaw / 2.0), 0.0, 0.0, np.sin(yaw / 2.0)])
    return (jnp.asarray(pos, dtype=dtype), jnp.asarray(quat, dtype=dtype))


def _hill_residual(m: Model, task: Task, state: State, info: StepInfo,
                   ctrl: jax.Array) -> jax.Array:
    s = m.struct
    trunk = s.body_id("trunk")
    foot_z = jnp.stack([info.site_xpos[s.site_id(f)][2] for f in _FEET])
    stand = (info.xpos[trunk, 2] - foot_z.mean() - task.params[0])[None]
    body_pos = info.xpos[trunk] - task.mocap_pos[0]
    body_rot = (quat_to_mat(info.xquat[trunk])
                - quat_to_mat(task.mocap_quat[0])).reshape(-1)
    home = jnp.asarray(np.tile(_HOME_LEG, 4), dtype=ctrl.dtype)
    return jnp.concatenate([stand, body_pos, body_rot, ctrl - home])


def _make_transition(n: int, ring_r: float, hill_h: float):
    def _hill_transition(task: Task, m: Model, state: State,
                         info: StepInfo) -> Task:
        """Advance the waypoint when within tolerance
        (QuadrupedHill::TransitionLocked, quadruped.cc:776-817)."""
        wpos, wquat = waypoints(dtype=task.mocap_pos.dtype, n=n,
                                ring_r=ring_r, hill_h=hill_h)
        trunk = m.struct.body_id("trunk")
        pos_err = jnp.linalg.norm(info.xpos[trunk] - task.mocap_pos[0])
        geo = 1.0 - jnp.abs(jnp.dot(info.xquat[trunk],
                                    task.mocap_quat[0]))
        advance = jnp.logical_and(pos_err <= _TOL, geo <= _TOL)
        idx = jnp.where(advance, (task.mode + 1) % n, task.mode)
        return dataclasses.replace(
            task, mode=idx,
            mocap_pos=task.mocap_pos.at[0].set(wpos[idx]),
            mocap_quat=task.mocap_quat.at[0].set(wquat[idx]))
    return _hill_transition


_TERMS = (
    TermSpec("Stand", 1, NormType.QUADRATIC),
    TermSpec("Body Pos.", 3, NormType.QUADRATIC),
    TermSpec("Body Rot.", 9, NormType.QUADRATIC),
    TermSpec("Control", 12, NormType.QUADRATIC),
)
_WEIGHTS = (1.0, 5.0, 1.0, 0.25)      # task_hill.xml:63-66


def quadruped_hill_task(dtype=jnp.float32, n_waypoints: int = _N_WAYPOINTS,
                        ring_r: float = _RING_R,
                        hill_h: float = _HILL_H) -> Task:
    """`n_waypoints`/`ring_r`/`hill_h` shrink the circuit (the
    reference edits the keyframe ring in task_hill.xml the same
    way); pass the same `hill_h` to quadruped_hill_model."""
    wpos, wquat = waypoints(dtype=dtype, n=n_waypoints, ring_r=ring_r,
                            hill_h=hill_h)
    t = make_task("Quadruped Hill", _TERMS, _hill_residual, _WEIGHTS,
                  params=(0.25,), param_names=("Height Goal",),
                  transition_fn=_make_transition(n_waypoints, ring_r,
                                                 hill_h),
                  mode_names=tuple(f"Waypoint {i}"
                                   for i in range(n_waypoints)),
                  mocap={"goal": (float(wpos[0, 0]), float(wpos[0, 1]),
                                  float(wpos[0, 2]))},
                  dtype=dtype)
    return dataclasses.replace(
        t, mocap_quat=t.mocap_quat.at[0].set(wquat[0]))
