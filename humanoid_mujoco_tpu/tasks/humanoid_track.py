"""Humanoid Track — the reference registry's mocap-tracking task
(mjpc/tasks/humanoid/tracking/{tracking.cc,task.xml}, tasks.cc:59).

The 21-DOF MJPC humanoid (physics/humanoid_upstream.py) tracks one of
ten CMU mocap clips (30 fps marker trajectories for 16 body landmarks,
transcribed to physics/tracking_motions.npz by
tools/gen_tracking_data.py; clip list and lengths = tracking.cc
kMotionLengths). The clip is selected by task `mode`; time indexes the
clip with linear interpolation between frames
(ComputeInterpolationValues, tracking.cc:29-40).

Residual (tracking.cc:95-216), 141-D:
    Joint Vel (21):  qvel[6:]                [Quadratic, w 0.001]
    Control   (21):  ctrl                    [Cosh(0.3), w 0.1]
    Pos[avg]   (3):  marker centroid - tracking-site centroid
                                             [SmoothAbs(0.1), w 100]
    Pos[body] (48):  centered marker - centered site, per landmark
                     pair groups              [w 30 / 0 (head)]
    Vel[body] (48):  FD marker velocity (kFps * frame diff) - site
                     velocity                 [SmoothAbs(0.3), w 0.1]

Site velocity uses the per-body COM velocity (StepInfo.body_com_vel);
the reference's framelinvel adds the omega x r site-offset term, a
small difference for the near-COM markers used here.

Starting state for a clip: `start_state(m, mode)` returns the clip's
first keyframe qpos/qvel (Transition's mode-switch state copy,
tracking.cc:228-238).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.norms import NormType
from ..physics.humanoid_upstream import build_humanoid21
from ..physics.model import Model, State, make_state
from ..physics.step import StepInfo
from .base import Task, TermSpec, make_task

_FPS = 30.0

# marker order = tracking.cc body_names
_MARKERS = ("pelvis", "head", "ltoe", "rtoe", "lheel", "rheel",
            "lknee", "rknee", "lhand", "rhand", "lelbow", "relbow",
            "lshoulder", "rshoulder", "lhip", "rhip")


def _load():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "physics", "tracking_motions.npz")
    z = np.load(path, allow_pickle=False)
    return z


_DATA = _load()
MOTION_NAMES = tuple(str(n) for n in _DATA["names"])
_LENGTHS = np.asarray(_DATA["lengths"])
_STARTS = np.concatenate([[0], np.cumsum(_LENGTHS)[:-1]])


def track_model(dt: float = 0.005, dtype=jnp.float32) -> Model:
    return build_humanoid21(dt=dt, dtype=dtype)


def start_state(m: Model, mode: int = 0) -> State:
    """Clip-start state (the reference's mode-switch qpos/qvel copy)."""
    i = int(_STARTS[mode])
    return make_state(
        m, qpos=jnp.asarray(_DATA["qpos"][i], dtype=m.dt.dtype),
        qvel=jnp.asarray(_DATA["qvel"][i], dtype=m.dt.dtype))


def _frames(task: Task, t, dtype):
    """Interpolated marker frame + FD marker velocity at sim time t."""
    mode = task.mode
    starts = jnp.asarray(_STARTS, jnp.int32)
    lengths = jnp.asarray(_LENGTHS, jnp.int32)
    start = starts[mode]
    last = start + lengths[mode] - 1
    idx = t * _FPS + start.astype(dtype)
    idx = jnp.clip(idx, start.astype(dtype), last.astype(dtype))
    i0 = jnp.floor(idx).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, last)
    w1 = idx - i0.astype(dtype)
    mpos = jnp.asarray(_DATA["mpos"], dtype=dtype)     # (N, 16, 3)
    f0 = mpos[i0]
    f1 = mpos[i1]
    interp = (1.0 - w1) * f0 + w1 * f1
    vel = (f1 - f0) * _FPS
    return interp, vel


def _site_positions(m: Model, info: StepInfo, dtype):
    s = m.struct
    return jnp.stack([info.site_xpos[s.site_id(f"tracking[{n}]")]
                      for n in _MARKERS])


def _site_velocities(m: Model, info: StepInfo, dtype):
    s = m.struct
    return jnp.stack([info.body_com_vel[
        s.site_body[s.site_id(f"tracking[{n}]")]] for n in _MARKERS])


def _track_residual(m: Model, task: Task, state: State, info: StepInfo,
                    ctrl: jax.Array) -> jax.Array:
    dtype = info.xpos.dtype
    markers, marker_vel = _frames(task, state.time, dtype)
    sites = _site_positions(m, info, dtype)
    site_vel = _site_velocities(m, info, dtype)

    avg_m = markers.mean(axis=0)
    avg_s = sites.mean(axis=0)
    pos_err = (markers - avg_m) - (sites - avg_s)       # (16, 3)
    vel_err = marker_vel - site_vel                     # (16, 3)

    return jnp.concatenate([
        state.qvel[6:], ctrl, avg_m - avg_s,
        pos_err.reshape(-1), vel_err.reshape(-1)])


# term grouping follows the task.xml sensor rows: per-landmark-pair
# 6-D blocks in the body_names order (pelvis, head, then l/r pairs)
_TERMS = (
    TermSpec("Joint Vel.", 21, NormType.QUADRATIC),
    TermSpec("Control", 21, NormType.COSH, num_params=1),
    TermSpec("Pos[avg]", 3, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Pos[pelvis]", 3, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Pos[head]", 3, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Pos[toe]", 6, NormType.SMOOTH_ABS2, num_params=2),
    TermSpec("Pos[heel]", 6, NormType.SMOOTH_ABS2, num_params=2),
    TermSpec("Pos[knee]", 6, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Pos[hand]", 6, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Pos[elbow]", 6, NormType.SMOOTH_ABS2, num_params=2),
    TermSpec("Pos[shoulder]", 6, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Pos[hip]", 6, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Vel[root]", 3, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Vel[head]", 3, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Vel[toe]", 6, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Vel[heel]", 6, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Vel[knee]", 6, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Vel[hand]", 6, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Vel[elbow]", 6, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Vel[shoulder]", 6, NormType.SMOOTH_ABS, num_params=1),
    TermSpec("Vel[hip]", 6, NormType.SMOOTH_ABS, num_params=1),
)
# task.xml:82-104
_WEIGHTS = (0.001, 0.1, 100.0, 30.0, 0.0, 30.0, 30.0, 30.0, 30.0, 30.0,
            30.0, 30.0, 0.1, 0.0, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1, 0.1)
_NORM_PARAMS = ((0.0, 0.0), (0.3, 0.0), (0.1, 0.0), (0.1, 0.0),
                (0.1, 0.0), (0.2, 4.0), (0.2, 4.0), (0.1, 0.0),
                (0.1, 0.0), (0.2, 4.0), (0.1, 0.0), (0.1, 0.0),
                (0.3, 0.0), (0.3, 0.0), (0.3, 0.0), (0.3, 0.0),
                (0.3, 0.0), (0.3, 0.0), (0.3, 0.0), (0.3, 0.0),
                (0.3, 0.0))


def track_task(dtype=jnp.float32) -> Task:
    return make_task("Humanoid Track", _TERMS, _track_residual,
                     _WEIGHTS, norm_params=_NORM_PARAMS,
                     mode_names=MOTION_NAMES, dtype=dtype)
