"""On-device lockstep RL environment — the CPUEnv rebuild.

The reference steps 256 CPUEnvs sequentially under SB3's DummyVecEnv
(rl/train.py:134-136) — the #1 thing TPU batching fixes (SURVEY §3.5).
Here ONE env is a pure function of an `EnvState` pytree and the batch is
`jax.vmap`; 4096+ envs run in lockstep on a chip, and the batch axis
shards over a mesh (parallel/).

Domain randomization (simulation/cpu_env.py:189-362, magnitudes from
simulation_parameters.py:4-48) randomizes MODEL LEAVES per environment.
Each env carries ONLY the randomized leaves (`ModelPatch`) with a batch
axis; the non-randomized bulk of the `Model` stays unbatched and is
closed over, so HBM traffic scales with the ~9 randomized leaves instead
of the whole model pytree (round-3 VERDICT weak #4: the full per-env
Model was the env-throughput bandwidth culprit).

Sensor/action DELAYS (cpu_env.py:135-187) are fixed-capacity ring
buffers with a per-env integer delay — read position (t - d) % CAP, so
shapes stay static.

Observation (30-D, cpu_env.py:554-569, all in the reference's
JOINT_NAMES == actuator order):
  [12 noisy joint angles | 12 noisy joint velocities |
   3 noisy WORLD-frame torso angular velocity | 3 local gravity from the
   noisy torso quaternion]
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..physics import math as pm
from ..physics.humanoid import (ACTUATED_JOINT_ORDER, STAND_POS, STAND_QUAT,
                                STANDUP_POS, STANDUP_QUAT, build_humanoid)
from ..physics.model import ActuatorType, Model, State, make_state
from ..physics.step import step
from .rewards import RewardResult, control_input_reward, standup_reward

# simulation_parameters.py constants
_MIN_DELAY, _MAX_DELAY = 0.01, 0.05
_MASS_CHANGE = 0.05
_EXT_MASS = 0.2
_FORCE_DUR = (0.05, 0.15)
_FORCE_MAG = (5.0, 15.0)
_FORCE_INTERVAL = (1.0, 3.0)
_JOINT_OFFSET_MAX = 0.2
_Z_OFFSET_MAX = 0.1
_QUAT_OFFSET_MAX = 0.1
_ARMATURE_CHANGE = 0.0005
# cpu_env.py:197-199: stiffness DR knob exists but the reference ships
# JOINT_STIFFNESS_MAX_CHANGE = 0 (simulation_parameters.py:33, "# 5")
_STIFFNESS_CHANGE = 0.0
_RANGE_CHANGE = 0.1
_MARGIN_CHANGE = 0.05
_FORCE_LIMIT_CHANGE = 0.05
_P_GAIN = 2.0
_P_GAIN_CHANGE = 0.5
_ANGLE_NOISE = 2.0 / 180.0 * jnp.pi       # deg -> rad
_VEL_NOISE = 5.0 / 180.0 * jnp.pi
_IMU_NOISE = 5.0 / 180.0 * jnp.pi
_GYRO_NOISE = 2.0 / 180.0 * jnp.pi
_ACTION_NOISE = 0.5 / 180.0 * jnp.pi
_FLOOR_FRICTION_MULT = (0.5, 1.0)
_MAX_BUMP = 0.1

DELAY_CAP = 26  # ceil(50 ms / 2 ms) + 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvConfig:
    standup: bool = dataclasses.field(default=True,
                                      metadata=dict(static=True))
    physics_steps_per_control: int = dataclasses.field(
        default=1, metadata=dict(static=True))
    use_potential_rewards: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    use_control_inputs: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    max_sim_time: float = dataclasses.field(default=10.0,
                                            metadata=dict(static=True))
    reset_retries: int = dataclasses.field(default=3,
                                           metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ModelPatch:
    """The domain-randomized model leaves — the ONLY per-env model state.

    `apply(base)` grafts them onto the shared base model; under vmap the
    base leaves stay unbatched (broadcast at use sites) while these nine
    carry the env batch axis.
    """

    floor_friction: jax.Array   # ()
    body_mass: jax.Array        # (nbody,)
    dof_armature: jax.Array     # (nv,)
    jnt_stiffness: jax.Array    # (njnt,)
    jnt_margin: jax.Array       # (njnt,)
    jnt_range: jax.Array        # (njnt, 2)
    act_kp: jax.Array           # (nu,)
    act_forcerange: jax.Array   # (nu, 2)
    hfield_data: jax.Array      # (nhrow, nhcol)

    def apply(self, base: Model) -> Model:
        return base.replace(**{
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(self)})


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvState:
    patch: ModelPatch         # per-env randomized model leaves
    phys: State
    rng: jax.Array
    rf: jax.Array             # randomization factor in [0, 1]
    step_count: jax.Array     # () int32 control steps since reset

    # delay ring buffers + per-buffer integer delays
    buf_action: jax.Array     # (CAP, nu)
    buf_jpos: jax.Array       # (CAP, 12)
    buf_jvel: jax.Array       # (CAP, 12)
    buf_angvel: jax.Array     # (CAP, 3)
    buf_gravity: jax.Array    # (CAP, 3)
    d_action: jax.Array       # () int32
    d_joint: jax.Array
    d_angvel: jax.Array
    d_gravity: jax.Array

    prev_action: jax.Array    # (nu,)
    latest_action: jax.Array  # (nu,)
    prev_reward: jax.Array    # () for potential rewards

    target_velocity: jax.Array  # (2,)
    target_yaw: jax.Array       # (1,)

    # external force schedule (cpu_env.py:618-654)
    force_start: jax.Array     # ()
    force_duration: jax.Array  # ()
    force_magnitude: jax.Array  # ()
    force_dir: jax.Array       # (2,)
    force_body: jax.Array      # () int32


def rl_humanoid_model(dtype=jnp.float32) -> Model:
    """RL variant of the humanoid: the reference env rewrites the motor
    actuators into P-position servos gain=kp, bias=-kp*q
    (cpu_env.py:215-221, JOINT_P_GAIN=2) — build with POSITION actuators
    directly."""
    m = build_humanoid(dtype=dtype)
    s = m.struct
    new_struct = dataclasses.replace(
        s, act_type=tuple(ActuatorType.POSITION for _ in range(s.nu)))
    return dataclasses.replace(
        m, struct=new_struct,
        act_kp=jnp.full((s.nu,), _P_GAIN, dtype=dtype),
        act_kv=jnp.zeros((s.nu,), dtype=dtype),
        act_ctrlrange=jnp.tile(
            jnp.asarray([-jnp.pi / 2, jnp.pi / 2], dtype=dtype), (s.nu, 1)))


def _joint_indices(m: Model):
    """qpos/dof/jnt indices for the reference's JOINT_NAMES order."""
    s = m.struct
    jids = [s.jnt_id(n) for n in ACTUATED_JOINT_ORDER]
    qadr = jnp.asarray([s.jnt_qadr[j] for j in jids], dtype=jnp.int32)
    vadr = jnp.asarray([s.jnt_vadr[j] for j in jids], dtype=jnp.int32)
    return jids, qadr, vadr


def _fractal_noise(key, shape, octaves: int = 3):
    """Perlin-like fractal noise in [0, 1] on a small grid (the reference
    uses PerlinNoise(octaves=15) on an 8x8 grid, cpu_env.py:269-285 —
    value-noise octaves are an equivalent smooth random field)."""
    nr, nc = shape
    total = jnp.zeros(shape)
    amp = 1.0
    for o in range(octaves):
        key, k = jax.random.split(key)
        res = 2 ** o + 1
        coarse = jax.random.uniform(k, (res + 1, res + 1))
        # bilinear upsample to (nr, nc)
        gy = jnp.linspace(0.0, res - 1e-6, nr)
        gx = jnp.linspace(0.0, res - 1e-6, nc)
        y0 = jnp.floor(gy).astype(jnp.int32)
        x0 = jnp.floor(gx).astype(jnp.int32)
        fy = (gy - y0)[:, None]
        fx = (gx - x0)[None, :]
        c00 = coarse[y0[:, None], x0[None, :]]
        c01 = coarse[y0[:, None], x0[None, :] + 1]
        c10 = coarse[y0[:, None] + 1, x0[None, :]]
        c11 = coarse[y0[:, None] + 1, x0[None, :] + 1]
        layer = (c00 * (1 - fy) * (1 - fx) + c01 * (1 - fy) * fx
                 + c10 * fy * (1 - fx) + c11 * fy * fx)
        total = total + amp * layer
        amp *= 0.5
    total = total - total.min()
    return total / jnp.maximum(total.max(), 1e-9)


def _randomize_model(base: Model, rf: jax.Array, key: jax.Array
                     ) -> ModelPatch:
    """Per-env model randomization (cpu_env.py:189-285) — returns only
    the randomized leaves."""
    s = base.struct
    dtype = base.body_pos.dtype
    ks = jax.random.split(key, 11)
    u = lambda k, lo, hi, shape=(): jax.random.uniform(
        k, shape, minval=lo, maxval=hi).astype(dtype)

    # floor friction multiplier: (1-rf) + U(0.5, 1)*rf
    fric_mult = (1.0 - rf) + u(ks[0], *_FLOOR_FRICTION_MULT) * rf
    floor_friction = base.floor_friction * fric_mult

    # per-body mass +- 0.05*rf (skip the massless root), one external mass
    dm = u(ks[1], -_MASS_CHANGE, _MASS_CHANGE, (s.nbody,)) * rf
    dm = dm.at[0].set(0.0)
    mass = jnp.maximum(base.body_mass + dm, 1e-5)
    mass = mass.at[0].set(base.body_mass[0])  # massless root stays exact
    ext_body = jax.random.randint(ks[2], (), 1, s.nbody,
                                  dtype=jnp.int32)
    ext_mass = u(ks[3], 0.0, _EXT_MASS) * rf
    mass = mass.at[ext_body].add(ext_mass)

    # joint properties
    arm = base.dof_armature + u(ks[4], 0.0, _ARMATURE_CHANGE,
                                (s.nv,)) * rf
    margin = base.jnt_margin + u(ks[5], 0.0, _MARGIN_CHANGE,
                                 (s.njnt,)) * rf
    drange = u(ks[6], -_RANGE_CHANGE, _RANGE_CHANGE, (s.njnt, 2)) * rf
    jrange = base.jnt_range + drange
    # joint stiffness (cpu_env.py:197-199; the reference's max change is 0)
    stiff = base.jnt_stiffness
    if _STIFFNESS_CHANGE:
        stiff = stiff + u(ks[10], 0.0, _STIFFNESS_CHANGE, (s.njnt,)) * rf

    # actuator gains + force limits
    kp = _P_GAIN + u(ks[7], -_P_GAIN_CHANGE, _P_GAIN_CHANGE,
                     (s.nu,)) * rf
    dfr = u(ks[8], -_FORCE_LIMIT_CHANGE, _FORCE_LIMIT_CHANGE,
            (s.nu, 2)) * rf
    frange = base.act_forcerange + dfr

    # heightfield
    hmax = _MAX_BUMP * rf
    hfield = (_fractal_noise(ks[9], (s.nhrow, s.nhcol)) * hmax
              ).astype(dtype)

    return ModelPatch(
        floor_friction=floor_friction, body_mass=mass, dof_armature=arm,
        jnt_stiffness=stiff, jnt_margin=margin, jnt_range=jrange,
        act_kp=kp, act_forcerange=frange, hfield_data=hfield)


def _sample_delays(rf, key):
    ks = jax.random.split(key, 4)
    dt_ctrl = 0.002  # control period
    def d(k):
        t = jax.random.uniform(k, (), minval=_MIN_DELAY * rf,
                               maxval=_MAX_DELAY * rf + 1e-9)
        return jnp.round(t / dt_ctrl).astype(jnp.int32)
    return d(ks[0]), d(ks[1]), d(ks[2]), d(ks[3])


def _initial_qpos(cfg: EnvConfig, m: Model, rf, key):
    dtype = m.body_pos.dtype
    ks = jax.random.split(key, 4)
    pos0 = STANDUP_POS if cfg.standup else STAND_POS
    quat0 = STANDUP_QUAT if cfg.standup else STAND_QUAT
    q = make_state(m).qpos
    q = q.at[0:3].set(jnp.asarray(pos0, dtype=dtype))
    q = q.at[2].add(jax.random.uniform(ks[0], (), minval=0.0,
                                       maxval=_Z_OFFSET_MAX * rf))
    quat = (jnp.asarray(quat0, dtype=dtype)
            + jax.random.uniform(ks[1], (4,), minval=-_QUAT_OFFSET_MAX,
                                 maxval=_QUAT_OFFSET_MAX) * rf)
    q = q.at[3:7].set(quat / pm.safe_norm(quat))
    djoint = jax.random.uniform(ks[2], (12,), minval=-_JOINT_OFFSET_MAX,
                                maxval=_JOINT_OFFSET_MAX) * rf
    q = q.at[7:19].add(djoint.astype(dtype))
    return q


def env_reset(cfg: EnvConfig, base_model: Model, rf: jax.Array,
              key: jax.Array) -> Tuple["EnvState", jax.Array]:
    """Reset one env: randomize model + state, return (state, obs)."""
    dtype = base_model.body_pos.dtype
    rf = jnp.asarray(rf, dtype=dtype)
    k_model, k_pose, k_delay, k_tgt, k_next = jax.random.split(key, 5)
    patch = _randomize_model(base_model, rf, k_model)
    m = patch.apply(base_model)
    qpos = _initial_qpos(cfg, m, rf, k_pose)
    phys = make_state(m, qpos=qpos)
    d_act, d_joint, d_angvel, d_grav = _sample_delays(rf, k_delay)

    if cfg.use_control_inputs:
        kv, ky = jax.random.split(k_tgt)
        tv = jax.random.uniform(kv, (2,), minval=-2.0, maxval=2.0
                                ).astype(dtype)
        ty = jax.random.uniform(ky, (1,), minval=-jnp.pi, maxval=jnp.pi
                                ).astype(dtype)
    else:
        tv = jnp.zeros(2, dtype=dtype)
        ty = jnp.zeros(1, dtype=dtype)

    nu = base_model.nu
    es = EnvState(
        patch=patch, phys=phys, rng=k_next, rf=rf,
        step_count=jnp.asarray(0, jnp.int32),
        buf_action=jnp.zeros((DELAY_CAP, nu), dtype=dtype),
        buf_jpos=jnp.zeros((DELAY_CAP, 12), dtype=dtype),
        buf_jvel=jnp.zeros((DELAY_CAP, 12), dtype=dtype),
        buf_angvel=jnp.zeros((DELAY_CAP, 3), dtype=dtype),
        buf_gravity=jnp.tile(jnp.asarray([0, 0, -1.0], dtype=dtype),
                             (DELAY_CAP, 1)),
        d_action=d_act, d_joint=d_joint, d_angvel=d_angvel,
        d_gravity=d_grav,
        prev_action=jnp.zeros(nu, dtype=dtype),
        latest_action=jnp.zeros(nu, dtype=dtype),
        prev_reward=jnp.asarray(0.0, dtype=dtype),
        target_velocity=tv, target_yaw=ty,
        force_start=jnp.asarray(0.0, dtype=dtype),
        force_duration=jnp.asarray(0.0, dtype=dtype),
        force_magnitude=jnp.asarray(0.0, dtype=dtype),
        force_dir=jnp.zeros(2, dtype=dtype),
        force_body=jnp.asarray(1, jnp.int32),
    )
    obs = _observe(cfg, m, es)[1]
    return es, obs


def _ring_push_read(buf, value, count, delay):
    """Push `value` (newest at the end); read the value from `delay`
    steps ago (slots not yet written still hold the reset-time fill —
    zeros / [0,0,-1] — reproducing the reference's pre-filled delay
    queues, cpu_env.py:171-187).

    SHIFT buffer + one-hot read, NOT a ring with modular indices: the
    per-env write/read positions are traced, and under a 4096-env vmap
    each dynamic_update/index lowered to a scatter/gather — 8 of them
    per step were a large share of env overhead on TPU (round-5
    profile). The shift is a static concat and the read a tiny masked
    reduction; both fuse. `count` is unused (kept for call symmetry).
    """
    cap = buf.shape[0]
    buf = jnp.concatenate([buf[1:], value[None]], axis=0)
    idx = cap - 1 - jnp.clip(delay, 0, cap - 1)
    onehot = (jnp.arange(cap) == idx).astype(buf.dtype)
    return buf, jnp.sum(onehot[:, None] * buf, axis=0)


def _observe(cfg: EnvConfig, m: Model, es: EnvState,
             torso_quat: jax.Array | None = None):
    """Noisy, delayed 30-D observation (cpu_env.py:465-571).

    `torso_quat` lets env_step reuse the step's own kinematics instead
    of re-running a full fwd_position (a whole extra FK per env step)."""
    dtype = es.phys.qpos.dtype
    _, qadr, vadr = _joint_indices(m)
    k0, k_next = jax.random.split(es.rng)
    # ONE fused normal draw for all four sensor noises: each extra
    # threefry invocation is real per-step cost at 4096 lockstep envs
    eps = jax.random.normal(k0, (31,), dtype=dtype)

    jpos = es.phys.qpos[qadr] + es.rf * _ANGLE_NOISE * eps[0:12]
    jvel = es.phys.qvel[vadr] + es.rf * _VEL_NOISE * eps[12:24]
    # world-frame angular velocity of the free joint... the reference
    # reads qvel[3:6] (cpu_env.py:425) which for MuJoCo free joints is
    # the LOCAL-frame angular velocity; we match that convention.
    angvel = es.phys.qvel[3:6] + es.rf * _GYRO_NOISE * eps[24:27]
    if torso_quat is None:
        torso_quat = _torso_quat(m, es)
    noisy_quat = torso_quat + es.rf * _IMU_NOISE * eps[27:31]
    gravity = pm.quat_rotate_inv(
        noisy_quat / pm.safe_norm(noisy_quat),
        jnp.asarray([0, 0, -1.0], dtype=dtype))

    c = es.step_count
    buf_jpos, jpos_d = _ring_push_read(es.buf_jpos, jpos, c, es.d_joint)
    buf_jvel, jvel_d = _ring_push_read(es.buf_jvel, jvel, c, es.d_joint)
    buf_av, av_d = _ring_push_read(es.buf_angvel, angvel, c, es.d_angvel)
    buf_g, g_d = _ring_push_read(es.buf_gravity, gravity, c, es.d_gravity)

    es = dataclasses.replace(es, buf_jpos=buf_jpos, buf_jvel=buf_jvel,
                             buf_angvel=buf_av, buf_gravity=buf_g,
                             rng=k_next)
    obs = jnp.concatenate([jpos_d, jvel_d, av_d, g_d])
    return es, obs


def _torso_quat(m: Model, es: EnvState):
    from ..physics.model import JointType
    s = m.struct
    torso = s.body_id("torso")
    # free-joint root: world quat IS qpos[3:7] (fwd_position free-joint
    # branch) — avoids a full FK per env_reset, which env_auto_reset
    # otherwise pays EVERY training step for every env (reset-then-mask
    # lockstep semantics)
    for j in s.body_joints[torso]:
        if s.jnt_type[j] == JointType.FREE:
            qadr = s.jnt_qadr[j]
            q = es.phys.qpos[qadr + 3:qadr + 7]
            return q / pm.safe_norm(q)
    from ..physics.engine import fwd_position
    kin = fwd_position(m, es.phys.qpos)
    return kin.xquat[torso]


def _update_forces(m: Model, es: EnvState):
    """External force schedule (cpu_env.py:618-654): every 1-3 s pick a
    random body and push it horizontally with 5-15 N for 0.05-0.15 s."""
    dtype = es.phys.qpos.dtype
    t = es.phys.time
    k0, k_next = jax.random.split(es.rng)
    expired = t >= es.force_start + es.force_duration

    # ONE fused uniform draw: [start, dur, mag, dir_x, dir_y, body]
    u6 = jax.random.uniform(k0, (6,))
    new_start = t + (_FORCE_INTERVAL[0]
                     + u6[0] * (_FORCE_INTERVAL[1] - _FORCE_INTERVAL[0]))
    new_dur = _FORCE_DUR[0] + u6[1] * (_FORCE_DUR[1] - _FORCE_DUR[0])
    new_mag = (_FORCE_MAG[0] + u6[2] * (_FORCE_MAG[1] - _FORCE_MAG[0])
               ) * es.rf
    d = 2.0 * u6[3:5] - 1.0
    new_dir = (d / pm.safe_norm(d)).astype(dtype)
    new_body = (1 + jnp.floor(u6[5] * (m.struct.nbody - 1))).astype(
        jnp.int32)
    new_body = jnp.minimum(new_body, m.struct.nbody - 1)

    es = dataclasses.replace(
        es,
        force_start=jnp.where(expired, new_start.astype(dtype),
                              es.force_start),
        force_duration=jnp.where(expired, new_dur.astype(dtype),
                                 es.force_duration),
        force_magnitude=jnp.where(expired, new_mag.astype(dtype),
                                  es.force_magnitude),
        force_dir=jnp.where(expired, new_dir, es.force_dir),
        force_body=jnp.where(expired, new_body, es.force_body),
        rng=k_next)

    active = jnp.logical_and(t > es.force_start,
                             t < es.force_start + es.force_duration)
    f = jnp.where(active, es.force_magnitude, 0.0)
    # one-hot body row instead of a per-env .at[] scatter (traced body
    # index under vmap = slow TPU scatter)
    onehot = (jnp.arange(m.struct.nbody) == es.force_body).astype(dtype)
    fvec = jnp.concatenate([f * es.force_dir,
                            jnp.zeros((4,), dtype=dtype)])
    xfrc = onehot[:, None] * fvec[None, :]
    return es, xfrc


def env_step(cfg: EnvConfig, base_model: Model, es: EnvState,
             action: jax.Array
             ) -> Tuple[EnvState, jax.Array, jax.Array, jax.Array,
                        jax.Array]:
    """One control step: returns (state', obs, reward, terminal,
    truncated). Mirrors CPUEnv.step (cpu_env.py:676-693)."""
    m = es.patch.apply(base_model)
    dtype = es.phys.qpos.dtype
    k_noise, k_rest = jax.random.split(es.rng)
    es = dataclasses.replace(es, rng=k_rest)

    # action noise + delay (cpu_env.py:656-674)
    action = jnp.asarray(action, dtype=dtype)
    action = action + es.rf * _ACTION_NOISE * jax.random.normal(
        k_noise, action.shape, dtype=dtype)
    buf_a, delayed_action = _ring_push_read(es.buf_action, action,
                                            es.step_count, es.d_action)
    es = dataclasses.replace(
        es, buf_action=buf_a, prev_action=es.latest_action,
        latest_action=delayed_action)

    # external forces
    es, xfrc = _update_forces(m, es)

    # physics
    phys = es.phys
    info = None
    for _ in range(cfg.physics_steps_per_control):
        phys, info = step(m, phys, delayed_action, xfrc=xfrc)
    es = dataclasses.replace(es, phys=phys,
                             step_count=es.step_count + 1)

    # reward (cpu_env.py:586-616): ctrl divided by pi/2 in the call
    _, _, vadr = _joint_indices(m)
    torques = info.qfrc_total[vadr]
    torso = m.struct.body_id("torso")
    reward_fn = standup_reward if cfg.standup else control_input_reward
    rr = reward_fn(
        velocity=phys.qvel[0:3],
        target_velocity=es.target_velocity,
        torso_quat=info.xquat[torso],
        target_yaw=es.target_yaw,
        z_pos=info.xpos[torso, 2],
        joint_torques=torques,
        previous_ctrl=es.prev_action / (jnp.pi / 2),
        latest_ctrl=es.latest_action / (jnp.pi / 2),
        is_self_colliding=_self_collision(m, info),
        time=phys.time,
        max_simulation_time=cfg.max_sim_time)

    reward = rr.reward
    if cfg.use_potential_rewards:
        reward = rr.reward - es.prev_reward
        es = dataclasses.replace(es, prev_reward=rr.reward)

    es, obs = _observe(cfg, m, es, torso_quat=info.xquat[torso])
    return es, obs, reward, rr.terminal, rr.truncated


def _self_collision(m: Model, info) -> jax.Array:
    """Any self-collision pair slot in contact (cpu_env.py:573-584)."""
    if m.ncon == m.struct.n_floor_slots:
        return jnp.asarray(False)     # no self-collision pair slots
    return jnp.any(info.contact_dist[m.struct.n_floor_slots:] < 0.0)


def env_auto_reset(cfg: EnvConfig, base_model: Model, es: EnvState,
                   obs, reward, terminal, truncated):
    """Reset-on-done wrapper (the DummyVecEnv auto-reset semantic)."""
    done = jnp.logical_or(terminal, truncated)
    key = jax.random.fold_in(es.rng, es.step_count)
    es_new, obs_new = env_reset(cfg, base_model, es.rf, key)
    es_out = jax.tree.map(
        lambda a, b: jnp.where(jnp.reshape(done, (1,) * a.ndim), b, a),
        es, es_new)
    obs_out = jnp.where(done, obs_new, obs)
    return es_out, obs_out, done


# ---------------------------------------------------------------------------
# batched API
# ---------------------------------------------------------------------------

def batch_reset(cfg: EnvConfig, base_model: Model, rf: jax.Array,
                keys: jax.Array):
    """Vectorized reset: rf () or (B,), keys (B, 2)."""
    rfb = jnp.broadcast_to(rf, (keys.shape[0],))
    return jax.vmap(lambda r, k: env_reset(cfg, base_model, r, k))(rfb,
                                                                   keys)


def batch_step(cfg: EnvConfig, base_model: Model, es: EnvState,
               actions: jax.Array):
    """Vectorized step over a batched EnvState; `base_model` is shared
    (unbatched) — only the ModelPatch leaves carry the batch axis."""
    return jax.vmap(lambda e, a: env_step(cfg, base_model, e, a))(es,
                                                                  actions)
