"""Fused smooth-stage kernel (pallas_smooth) tests.

The kernel targets TPU; on the CPU test platform it runs in pallas
interpret mode, validating the kernel program (FK, composite-inertia
CRB, RNEA, actuation/passive, collision, contact/limit raw rows)
against the pure-JAX oracle jax_smooth_single — which is itself the
exact _prepare_smooth + contact_raw + limit_rows_data pipeline the
step() fast path used before this kernel existed.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from humanoid_mujoco_tpu.physics import humanoid, pallas_smooth
from humanoid_mujoco_tpu.physics.model import make_state

NAMES = ("M", "qfrc_smooth", "cdof", "rel", "nrm", "dist", "mu3",
         "kc", "bc", "dc", "lpos", "kl", "bl", "dl", "xpos", "xquat",
         "xipos", "bcv", "site_xpos", "anchor", "com_vel", "actf")


@pytest.fixture(scope="module")
def model():
    return humanoid.build_humanoid()


@pytest.fixture(scope="module")
def batch_states(model):
    m = model
    q0 = humanoid.stand_qpos(m)
    B = 4
    key = jax.random.PRNGKey(0)
    qpos = jnp.tile(q0, (B, 1)).at[:, 7:].add(
        0.07 * jax.random.normal(key, (B, 12))).astype(jnp.float32)
    # tilt the root so floor normals/pair contacts vary per env
    qpos = qpos.at[:, 3:7].add(
        0.05 * jax.random.normal(jax.random.PRNGKey(3), (B, 4)))
    qvel = 0.3 * jax.random.normal(jax.random.PRNGKey(1),
                                   (B, 18)).astype(jnp.float32)
    ctrl = 0.4 * jax.random.normal(jax.random.PRNGKey(2),
                                   (B, 12)).astype(jnp.float32)
    return qpos, qvel, ctrl


def _check(ref, out, tol=2e-4):
    for name, r, o in zip(NAMES, ref, out):
        r = np.asarray(r, np.float64)
        o = np.asarray(o, np.float64)
        assert r.shape == o.shape, (name, r.shape, o.shape)
        scale = np.max(np.abs(r)) + 1e-9
        if name == "dist":
            # inactive far slots carry 1e9 sentinels; compare the
            # near-field (everything below 1e8) exactly, sentinels by
            # identity
            sent = r > 1e8
            assert np.array_equal(sent, o > 1e8), name
            r, o = r[~sent], o[~sent]
            scale = np.max(np.abs(r)) + 1e-9
        err = np.max(np.abs(r - o)) if r.size else 0.0
        assert err / scale < tol, (name, err, scale)


class TestSmoothKernel:
    def test_supported(self, model):
        assert pallas_smooth.supported(model)

    def test_interpret_matches_oracle(self, model, batch_states):
        m = model
        qpos, qvel, ctrl = batch_states
        ref = jax.vmap(
            lambda qp, qv, ct: pallas_smooth.jax_smooth_single(
                m, qp, qv, ct))(qpos, qvel, ctrl)
        params = pallas_smooth._pack_params(m)
        out = pallas_smooth.smooth_batched(
            m.struct, qpos, qvel, ctrl, None, params, interpret=True)
        _check(ref, out)

    def test_interpret_with_xfrc(self, model, batch_states):
        m = model
        qpos, qvel, ctrl = batch_states
        B = qpos.shape[0]
        xfrc = 2.0 * jax.random.normal(
            jax.random.PRNGKey(7), (B, m.struct.nbody, 6)).astype(
                jnp.float32)
        ref = jax.vmap(
            lambda qp, qv, ct, xf: pallas_smooth.jax_smooth_single(
                m, qp, qv, ct, xf))(qpos, qvel, ctrl, xfrc)
        params = pallas_smooth._pack_params(m)
        out = pallas_smooth.smooth_batched(
            m.struct, qpos, qvel, ctrl, xfrc, params, interpret=True)
        _check(ref, out)

    def test_batch_padding(self, model, batch_states):
        """B=4 pads to one 128-lane tile; padding must not leak."""
        m = model
        qpos, qvel, ctrl = batch_states
        params = pallas_smooth._pack_params(m)
        out4 = pallas_smooth.smooth_batched(
            m.struct, qpos, qvel, ctrl, None, params, interpret=True)
        out1 = pallas_smooth.smooth_batched(
            m.struct, qpos[1:2], qvel[1:2], ctrl[1:2], None, params,
            interpret=True)
        for name, a, b in zip(NAMES, out4, out1):
            np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[0]),
                                       atol=2e-5, err_msg=name)

    def test_fallback_on_cpu(self, model, batch_states):
        """On the CPU test platform smooth_raw must take the JAX path."""
        assert jax.default_backend() == "cpu"
        assert not pallas_smooth.enabled()
        m = model
        qpos, qvel, ctrl = batch_states
        out = pallas_smooth.smooth_raw(m, qpos[0], qvel[0], ctrl[0])
        ref = pallas_smooth.jax_smooth_single(m, qpos[0], qvel[0],
                                              ctrl[0])
        for name, r, o in zip(NAMES, ref, out):
            np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                       err_msg=name)

    def test_batched_params_interpret(self, model, batch_states):
        """Per-env model params (domain-randomization / ModelPatch
        path): batched params stream per-lane; outputs must match
        per-env JAX oracles."""
        import dataclasses
        m = model
        qpos, qvel, ctrl = batch_states
        B = qpos.shape[0]
        key = jax.random.PRNGKey(11)
        mass_b = m.body_mass[None] * (1.0 + 0.2 * jax.random.uniform(
            key, (B, m.struct.nbody), minval=-1.0, maxval=1.0))
        hf_b = (m.hfield_data[None]
                + 0.02 * jax.random.uniform(
                    jax.random.PRNGKey(12),
                    (B,) + m.hfield_data.shape)).astype(jnp.float32)

        ref = jax.vmap(
            lambda qp, qv, ct, mb, hb: pallas_smooth.jax_smooth_single(
                dataclasses.replace(m, body_mass=mb, hfield_data=hb),
                qp, qv, ct))(qpos, qvel, ctrl, mass_b, hf_b)

        def pack_one(mb, hb):
            return pallas_smooth._pack_params(
                dataclasses.replace(m, body_mass=mb, hfield_data=hb))

        params = jax.vmap(pack_one)(mass_b, hf_b)
        # bodyp (idx 0) and hfield (idx 8) are batched; rest replicated
        pb = tuple(i in (0, 8) for i in range(9))
        params = tuple(p if b else jax.tree.map(lambda x: x[0], p)
                       for p, b in zip(params, pb))
        out = pallas_smooth.smooth_batched(
            m.struct, qpos, qvel, ctrl, None, params,
            params_batched=pb, interpret=True)
        _check(ref, out)
