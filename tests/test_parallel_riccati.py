"""Associative-scan Riccati vs the sequential oracle (SURVEY §5
long-context analog; round-3 verdict stretch #10)."""

import jax
import jax.numpy as jnp
import numpy as np

from humanoid_mujoco_tpu.planners.parallel_riccati import (
    parallel_riccati, sequential_riccati)


def _random_lqr(T, n, nu, seed=0):
    rng = np.random.default_rng(seed)

    def spd(T, n, scale):
        M = rng.standard_normal((T, n, n)) * scale
        return M @ np.swapaxes(M, -1, -2) + 0.5 * np.eye(n)

    A = np.stack([np.eye(n) + 0.05 * rng.standard_normal((n, n))
                  for _ in range(T)])
    B = 0.1 * rng.standard_normal((T, n, nu))
    c = 0.01 * rng.standard_normal((T, n))
    cxx = spd(T, n, 0.3)
    cuu = spd(T, nu, 0.3)
    cxu = 0.05 * rng.standard_normal((T, n, nu))
    cx = 0.1 * rng.standard_normal((T, n))
    cu = 0.1 * rng.standard_normal((T, nu))
    PT = spd(1, n, 0.3)[0]
    pT = 0.1 * rng.standard_normal(n)
    return [jnp.asarray(x, jnp.float64)
            for x in (A, B, c, cxx, cxu, cuu, cx, cu, PT, pT)]


class TestParallelRiccati:
    def test_matches_sequential_oracle(self):
        """Gains, affine terms and value expansions agree with the
        O(T) scan to f64 precision (T=64, humanoid-scale dims)."""
        args = _random_lqr(64, 6, 3)
        Kp, kp, Pp, pp = parallel_riccati(*args)
        Ks, ks, Ps, ps = sequential_riccati(*args)
        np.testing.assert_allclose(np.asarray(Kp), np.asarray(Ks),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(kp), np.asarray(ks),
                                   atol=1e-10)
        np.testing.assert_allclose(np.asarray(Pp[:64]), np.asarray(Ps),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(pp[:64]), np.asarray(ps),
                                   atol=1e-10)

    def test_policy_is_finite_horizon_optimal(self):
        """Simulating the returned affine policy achieves lower total
        cost than any perturbed policy — direct finite-horizon
        optimality, no steady-state asymptotics involved."""
        T, n, nu = 40, 3, 2
        args = _random_lqr(T, n, nu, seed=3)
        A, B, c, cxx, cxu, cuu, cx, cu, PT, pT = [np.asarray(a)
                                                  for a in args]
        Kp, kp, _, _ = parallel_riccati(*args)
        Kp, kp = np.asarray(Kp), np.asarray(kp)

        def rollout_cost(K, k):
            x = np.ones(n) * 0.3
            total = 0.0
            for t in range(T):
                u = -K[t] @ x - k[t]
                total += (0.5 * x @ cxx[t] @ x + cx[t] @ x
                          + 0.5 * u @ cuu[t] @ u + cu[t] @ u
                          + x @ cxu[t] @ u)
                x = A[t] @ x + B[t] @ u + c[t]
            return total + 0.5 * x @ PT @ x + pT @ x

        base = rollout_cost(Kp, kp)
        rng = np.random.default_rng(11)
        for _ in range(5):
            dK = 0.03 * rng.standard_normal(Kp.shape)
            dk = 0.03 * rng.standard_normal(kp.shape)
            assert rollout_cost(Kp + dK, kp + dk) > base - 1e-9
