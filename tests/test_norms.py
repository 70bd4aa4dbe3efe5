"""Norms library: analytic grad/Hess vs jax autodiff (reference norm.cc parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mujoco_tpu.ops import norms

CASES = [
    (norms.NormType.QUADRATIC, 0.0, 0.0),
    (norms.NormType.L22, 0.1, 2.0),
    (norms.NormType.L2, 0.1, 0.0),
    (norms.NormType.COSH, 0.3, 0.0),
    (norms.NormType.POWER_LOSS, 2.0, 0.0),
    (norms.NormType.SMOOTH_ABS, 0.1, 0.0),
    (norms.NormType.SMOOTH_ABS2, 0.1, 2.0),
    (norms.NormType.RECTIFY, 0.1, 0.0),
]


@pytest.mark.parametrize("ntype,p,q", CASES)
def test_grad_matches_autodiff(ntype, p, q):
    x = jnp.array([0.3, -0.2, 0.15, 0.4])
    y, g = norms.norm_grad(x, ntype, p, q)
    y2 = norms.norm_value(x, ntype, p, q)
    np.testing.assert_allclose(y, y2, rtol=1e-5)
    g_ad = jax.grad(lambda z: norms.norm_value(z, ntype, p, q))(x)
    np.testing.assert_allclose(g, g_ad, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("ntype,p,q", CASES)
def test_hess_matches_autodiff(ntype, p, q):
    x = jnp.array([0.3, -0.2, 0.15, 0.4])
    _, _, H = norms.norm_hess(x, ntype, p, q)
    H_ad = jax.hessian(lambda z: norms.norm_value(z, ntype, p, q))(x)
    np.testing.assert_allclose(H, H_ad, rtol=2e-3, atol=1e-4)


def test_reference_values():
    """Spot values re-derived from the reference formulas (norm.cc:50-200)."""
    x = jnp.array([0.5, -0.25])
    # quadratic: 0.5 * x.x
    np.testing.assert_allclose(
        norms.norm_value(x, norms.NormType.QUADRATIC), 0.5 * (0.25 + 0.0625)
    )
    # smooth abs: sum sqrt(x^2+p^2) - p
    p = 0.1
    expect = sum(np.sqrt(v * v + p * p) - p for v in [0.5, -0.25])
    np.testing.assert_allclose(
        norms.norm_value(x, norms.NormType.SMOOTH_ABS, p), expect, rtol=1e-6
    )
    # cosh: sum p^2 (cosh(x/p) - 1)
    p = 0.3
    expect = sum(p * p * (np.cosh(v / p) - 1.0) for v in [0.5, -0.25])
    np.testing.assert_allclose(
        norms.norm_value(x, norms.NormType.COSH, p), expect, rtol=1e-5
    )


def test_batched():
    x = jax.random.normal(jax.random.PRNGKey(0), (7, 5))
    y = norms.norm_value(x, norms.NormType.SMOOTH_ABS, 0.1)
    assert y.shape == (7,)
    y1, g = norms.norm_grad(x, norms.NormType.L2, 0.1)
    assert g.shape == (7, 5)
    _, _, H = norms.norm_hess(x, norms.NormType.QUADRATIC)
    assert H.shape == (7, 5, 5)
