"""Branch-free collision detection over a fixed contact capacity.

Replaces MuJoCo's mesh/hfield collision pipeline (which the reference
relies on for foot-ground and self contacts, world.xml:19 condim 6 geoms)
with a TPU-native design: every geom is a SPHERE CLOUD fixed at build
time, so narrowphase is closed-form, every contact has a static slot
(slot k = sphere k vs floor, slot nsph+p = pair p), and activity is a
mask — shapes never depend on data.

Floor is a bilinear heightfield z(x, y) (Perlin-randomizable like
simulation/cpu_env.py:256-285) over a (nhrow, nhcol) grid spanning
[-hx, hx] × [-hy, hy]; flat floor is the zero field.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .model import Model


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Contacts:
    """Fixed-capacity contact set. Slot layout is static:
    [0, nsph)          sphere-vs-floor
    [nsph, nsph+npair) sphere-vs-sphere self-collision pairs
    """

    pos: jax.Array       # (ncon, 3) contact point, world
    normal: jax.Array    # (ncon, 3) unit normal (pushes body_b off body_a)
    dist: jax.Array      # (ncon,) signed gap (negative = penetrating)
    friction: jax.Array  # (ncon,) tangential friction coefficient
    friction_tor: jax.Array   # (ncon,) torsional friction
    friction_roll: jax.Array  # (ncon,) rolling friction


def hfield_height(m: Model, xy: jax.Array) -> jax.Array:
    """Bilinear floor height at world (x, y); xy: (..., 2) -> (...)."""
    nr, nc = m.struct.nhrow, m.struct.nhcol
    hx, hy = m.hfield_halfsize[0], m.hfield_halfsize[1]
    # grid: data[i, j] at x = -hx + j*2hx/(nc-1), y = -hy + i*2hy/(nr-1)
    gx = (xy[..., 0] + hx) / (2 * hx) * (nc - 1)
    gy = (xy[..., 1] + hy) / (2 * hy) * (nr - 1)
    gx = jnp.clip(gx, 0.0, nc - 1.000001)
    gy = jnp.clip(gy, 0.0, nr - 1.000001)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, nc - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, nr - 2)
    fx = gx - x0
    fy = gy - y0
    h00 = m.hfield_data[y0, x0]
    h01 = m.hfield_data[y0, x0 + 1]
    h10 = m.hfield_data[y0 + 1, x0]
    h11 = m.hfield_data[y0 + 1, x0 + 1]
    h = (h00 * (1 - fx) * (1 - fy) + h01 * fx * (1 - fy)
         + h10 * (1 - fx) * fy + h11 * fx * fy)
    return m.floor_z + h


def hfield_normal(m: Model, xy: jax.Array, eps: float = 1e-3) -> jax.Array:
    """Floor surface normal via central differences of the height field."""
    dx = jnp.asarray([eps, 0.0], dtype=xy.dtype)
    dy = jnp.asarray([0.0, eps], dtype=xy.dtype)
    hpx = hfield_height(m, xy + dx)
    hmx = hfield_height(m, xy - dx)
    hpy = hfield_height(m, xy + dy)
    hmy = hfield_height(m, xy - dy)
    n = jnp.stack([-(hpx - hmx) / (2 * eps), -(hpy - hmy) / (2 * eps),
                   jnp.ones_like(hpx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def sphere_world_centers(m: Model, xpos: jax.Array, xmat: jax.Array
                         ) -> jax.Array:
    """World centers of all collision spheres: (nsph, 3)."""
    s = m.struct
    if s.nsph == 0:
        return jnp.zeros((0, 3), dtype=xpos.dtype)
    body = jnp.asarray(s.sph_body, dtype=jnp.int32)
    return xpos[body] + jnp.einsum("nij,nj->ni", xmat[body], m.sph_pos)


def collide(m: Model, xpos: jax.Array, xmat: jax.Array) -> Contacts:
    s = m.struct
    dtype = xpos.dtype
    centers = sphere_world_centers(m, xpos, xmat)

    # --- floor contacts: one slot per sphere ---
    if s.nsph and s.has_floor:
        h = hfield_height(m, centers[:, :2])
        n_floor = hfield_normal(m, centers[:, :2])
        dist_f = centers[:, 2] - m.sph_radius - h
        pos_f = centers - n_floor * (m.sph_radius + 0.5 * dist_f)[:, None]
        fric_f = jnp.maximum(m.sph_friction, m.floor_friction)
        tor_f = jnp.maximum(m.sph_friction_tor, m.floor_friction_tor)
        roll_f = jnp.maximum(m.sph_friction_roll, m.floor_friction_roll)
    else:
        dist_f = jnp.full((s.nsph,), 1e9, dtype=dtype)
        n_floor = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], dtype=dtype), (s.nsph, 3))
        pos_f = centers
        fric_f = m.sph_friction
        tor_f = m.sph_friction_tor
        roll_f = m.sph_friction_roll

    # --- self-collision pairs ---
    if s.npair:
        ia = jnp.asarray(s.pair_a, dtype=jnp.int32)
        ib = jnp.asarray(s.pair_b, dtype=jnp.int32)
        ca, cb = centers[ia], centers[ib]
        ra, rb = m.sph_radius[ia], m.sph_radius[ib]
        delta = cb - ca
        dnorm = jnp.linalg.norm(delta, axis=-1)
        n_pair = delta / jnp.maximum(dnorm, 1e-9)[:, None]
        dist_p = dnorm - (ra + rb)
        pos_p = ca + n_pair * (ra + 0.5 * dist_p)[:, None]
        fric_p = jnp.maximum(m.sph_friction[ia], m.sph_friction[ib])
        tor_p = jnp.maximum(m.sph_friction_tor[ia], m.sph_friction_tor[ib])
        roll_p = jnp.maximum(m.sph_friction_roll[ia],
                             m.sph_friction_roll[ib])
        pos = jnp.concatenate([pos_f, pos_p], axis=0)
        normal = jnp.concatenate([n_floor, n_pair], axis=0)
        dist = jnp.concatenate([dist_f, dist_p], axis=0)
        fric = jnp.concatenate([fric_f, fric_p], axis=0)
        tor = jnp.concatenate([tor_f, tor_p], axis=0)
        roll = jnp.concatenate([roll_f, roll_p], axis=0)
    else:
        pos, normal, dist, fric = pos_f, n_floor, dist_f, fric_f
        tor, roll = tor_f, roll_f

    return Contacts(pos=pos, normal=normal, dist=dist, friction=fric,
                    friction_tor=tor, friction_roll=roll)


def select_contacts(contacts: Contacts, k: int
                    ) -> tuple[Contacts, jax.Array]:
    """Keep the k most-penetrating contact slots (smallest signed gap).

    Static-shape analog of mj_makeConstraint's dynamic contact count: the
    solve is exact whenever at most k slots are active, because dropped
    slots have the largest gaps and produce zero force. Returns the
    reduced Contacts plus `sel` (k,) int32 — original slot indices, for
    gathering per-slot static tables and scattering forces back.
    """
    _, sel = jax.lax.top_k(-contacts.dist, k)

    def g(x):
        return x[sel]

    return Contacts(pos=g(contacts.pos), normal=g(contacts.normal),
                    dist=g(contacts.dist), friction=g(contacts.friction),
                    friction_tor=g(contacts.friction_tor),
                    friction_roll=g(contacts.friction_roll)), sel


def tangent_frame(normal: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Two unit tangents orthogonal to each normal, branch-free.

    normal: (..., 3) -> (t1, t2) each (..., 3).
    """
    n = normal
    up_dominant = jnp.abs(n[..., 2:3]) > 0.9
    ref = jnp.where(up_dominant,
                    jnp.asarray([1.0, 0.0, 0.0], dtype=n.dtype),
                    jnp.asarray([0.0, 0.0, 1.0], dtype=n.dtype))
    t1 = jnp.cross(ref, n)
    t1 = t1 / jnp.maximum(
        jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2
