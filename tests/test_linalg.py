"""Unrolled Cholesky factor/solve vs numpy."""

import jax
import jax.numpy as jnp
import numpy as np

from humanoid_mujoco_tpu.ops import linalg


def rnd_spd(key, b, n):
    A = jax.random.normal(key, (b, n, n))
    return A @ jnp.swapaxes(A, -1, -2) + 0.5 * jnp.eye(n)


def test_chol_factor_matches_numpy():
    A = rnd_spd(jax.random.PRNGKey(0), 4, 18)
    L = linalg.chol_factor(A)
    np.testing.assert_allclose(
        L @ jnp.swapaxes(L, -1, -2), A, rtol=2e-4, atol=1e-3
    )


def test_chol_solve_vector():
    A = rnd_spd(jax.random.PRNGKey(1), 3, 12)
    b = jax.random.normal(jax.random.PRNGKey(2), (3, 12))
    x = linalg.solve_psd(A, b)
    np.testing.assert_allclose(
        jnp.einsum("bij,bj->bi", A, x), b, rtol=1e-3, atol=1e-3
    )


def test_chol_solve_matrix_rhs():
    A = rnd_spd(jax.random.PRNGKey(3), 2, 10)
    B = jax.random.normal(jax.random.PRNGKey(4), (2, 10, 7))
    X = linalg.solve_psd(A, B)
    np.testing.assert_allclose(A @ X, B, rtol=1e-3, atol=1e-3)


def test_vmap_and_jit():
    A = rnd_spd(jax.random.PRNGKey(5), 8, 6)
    b = jax.random.normal(jax.random.PRNGKey(6), (8, 6))
    x = jax.jit(jax.vmap(lambda a, c: linalg.solve_psd(a, c)))(A, b)
    np.testing.assert_allclose(
        jnp.einsum("bij,bj->bi", A, x), b, rtol=1e-3, atol=1e-3
    )


def test_grad_flows():
    A = rnd_spd(jax.random.PRNGKey(7), 1, 5)[0]
    b = jnp.ones(5)

    def f(a):
        return jnp.sum(linalg.solve_psd(a, b))

    g = jax.grad(f)(A)
    assert jnp.isfinite(g).all()
