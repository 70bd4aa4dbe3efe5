"""Spline sampling semantics (reference utilities.cc:286-397 / spline.h)."""

import jax.numpy as jnp
import numpy as np

from humanoid_mujoco_tpu.ops.spline import (
    SplineOrder, fd_slopes, spline_sample, spline_resample,
)


def mk():
    times = jnp.array([0.0, 1.0, 2.0, 3.0])
    values = jnp.array([[0.0, 1.0], [1.0, 0.0], [0.0, -1.0], [2.0, 3.0]])
    return times, values


def test_zero_hold():
    t, v = mk()
    out = spline_sample(t, v, jnp.array([0.5, 1.5, 2.99]), SplineOrder.ZERO)
    np.testing.assert_allclose(out, v[jnp.array([0, 1, 2])])


def test_zero_clamps():
    t, v = mk()
    np.testing.assert_allclose(spline_sample(t, v, -1.0, SplineOrder.ZERO), v[0])
    np.testing.assert_allclose(spline_sample(t, v, 9.0, SplineOrder.ZERO), v[3])


def test_linear_midpoints():
    t, v = mk()
    out = spline_sample(t, v, 0.5, SplineOrder.LINEAR)
    np.testing.assert_allclose(out, 0.5 * (v[0] + v[1]))
    out = spline_sample(t, v, jnp.array([1.25]), SplineOrder.LINEAR)
    np.testing.assert_allclose(out[0], 0.75 * v[1] + 0.25 * v[2])


def test_linear_clamps():
    t, v = mk()
    np.testing.assert_allclose(spline_sample(t, v, -5.0, SplineOrder.LINEAR), v[0])
    np.testing.assert_allclose(spline_sample(t, v, 50.0, SplineOrder.LINEAR), v[3])


def test_cubic_interpolates_knots():
    t, v = mk()
    for i in range(4):
        out = spline_sample(t, v, t[i], SplineOrder.CUBIC)
        np.testing.assert_allclose(out, v[i], atol=1e-5)


def test_cubic_smooth_between():
    """Cubic must lie within a reasonable envelope and be C1 at knots."""
    t, v = mk()
    ts = jnp.linspace(0.0, 3.0, 301)
    out = spline_sample(t, v, ts, SplineOrder.CUBIC)
    assert jnp.isfinite(out).all()
    # C1: numerical derivative continuous at interior knots
    eps = 1e-3
    for tk in [1.0, 2.0]:
        d_left = (spline_sample(t, v, tk - eps, SplineOrder.CUBIC)
                  - spline_sample(t, v, tk - 2 * eps, SplineOrder.CUBIC)) / eps
        d_right = (spline_sample(t, v, tk + 2 * eps, SplineOrder.CUBIC)
                   - spline_sample(t, v, tk + eps, SplineOrder.CUBIC)) / eps
        # slopes are shared at knots (C1); curvature may jump, so the
        # one-sided estimates differ by O(eps * f'') — allow that envelope
        np.testing.assert_allclose(d_left, d_right, atol=0.15)


def test_fd_slopes_reference_semantics():
    t, v = mk()
    m = fd_slopes(t, v)
    sec = (v[1:] - v[:-1]) / 1.0
    np.testing.assert_allclose(m[0], sec[0])
    np.testing.assert_allclose(m[1], 0.5 * (sec[0] + sec[1]))
    np.testing.assert_allclose(m[3], sec[2])


def test_resample_identity_on_knots():
    t, v = mk()
    out = spline_resample(t, v, t, SplineOrder.LINEAR)
    np.testing.assert_allclose(out, v, atol=1e-6)
