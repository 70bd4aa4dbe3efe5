"""Quaternion / spatial math identities and FD checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mujoco_tpu.physics import math as hm


def rnd_quat(key, shape=()):
    q = jax.random.normal(key, shape + (4,))
    return hm.quat_normalize(q)


def test_quat_mul_identity():
    key = jax.random.PRNGKey(0)
    q = rnd_quat(key, (16,))
    qi = jnp.broadcast_to(hm.quat_id(), (16, 4))
    np.testing.assert_allclose(hm.quat_mul(q, qi), q, atol=1e-6)
    np.testing.assert_allclose(hm.quat_mul(qi, q), q, atol=1e-6)


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(1)
    q = rnd_quat(key, (8,))
    v = jax.random.normal(jax.random.PRNGKey(2), (8, 3))
    R = hm.quat_to_mat(q)
    np.testing.assert_allclose(
        hm.quat_rotate(q, v), jnp.einsum("bij,bj->bi", R, v), atol=1e-5
    )


def test_mat_quat_roundtrip():
    key = jax.random.PRNGKey(3)
    q = rnd_quat(key, (32,))
    q = q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)
    q2 = hm.mat_to_quat(hm.quat_to_mat(q))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_exp_log_roundtrip():
    v = jax.random.normal(jax.random.PRNGKey(4), (16, 3)) * 0.8
    np.testing.assert_allclose(hm.quat_log(hm.quat_exp(v)), v, atol=1e-5)


def test_quat_sub_integrate_inverse():
    key = jax.random.PRNGKey(5)
    qa = rnd_quat(jax.random.fold_in(key, 0), (8,))
    omega = jax.random.normal(jax.random.fold_in(key, 1), (8, 3))
    qb = hm.quat_integrate(qa, omega, 0.1)
    diff = hm.quat_sub(qb, qa)
    np.testing.assert_allclose(diff, omega * 0.1, atol=1e-5)


def test_quat_rotate_inv():
    q = rnd_quat(jax.random.PRNGKey(6), (8,))
    v = jax.random.normal(jax.random.PRNGKey(7), (8, 3))
    np.testing.assert_allclose(
        hm.quat_rotate_inv(q, hm.quat_rotate(q, v)), v, atol=1e-5
    )


def test_skew_cross():
    a = jax.random.normal(jax.random.PRNGKey(8), (8, 3))
    b = jax.random.normal(jax.random.PRNGKey(9), (8, 3))
    np.testing.assert_allclose(
        jnp.einsum("bij,bj->bi", hm.skew(a), b), jnp.cross(a, b), atol=1e-6
    )


def test_quat_rotate_composition():
    qa = rnd_quat(jax.random.PRNGKey(10), (8,))
    qb = rnd_quat(jax.random.PRNGKey(11), (8,))
    v = jax.random.normal(jax.random.PRNGKey(12), (8, 3))
    lhs = hm.quat_rotate(hm.quat_mul(qa, qb), v)
    rhs = hm.quat_rotate(qa, hm.quat_rotate(qb, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_spatial_inertia_symmetric_psd(seed):
    key = jax.random.PRNGKey(seed)
    mass = jax.random.uniform(jax.random.fold_in(key, 0), (4,), minval=0.1)
    d = jax.random.uniform(jax.random.fold_in(key, 1), (4, 3),
                           minval=0.01, maxval=0.1)
    I = jnp.einsum("bi,ij->bij", d, jnp.eye(3))
    c = jax.random.normal(jax.random.fold_in(key, 2), (4, 3)) * 0.2
    S = hm.spatial_inertia(mass, I, c)
    np.testing.assert_allclose(S, jnp.swapaxes(S, -1, -2), atol=1e-6)
    eigs = jnp.linalg.eigvalsh(S)
    assert (eigs > -1e-6).all()
