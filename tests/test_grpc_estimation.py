"""Filter/Direct gRPC service tests — the reference's
filter_service/direct_service surfaces (mjpc/grpc/filter.proto,
direct.proto; binaries CMakeLists.txt:281,312) exercised over an
in-process loopback server (the agent_service_test.cc pattern)."""

import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mujoco_tpu.direct.service import DirectService
from humanoid_mujoco_tpu.estimators import default_sensor_model, measure
from humanoid_mujoco_tpu.physics import humanoid
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.serving.estimation_servers import (
    make_direct_server, make_filter_server)
from humanoid_mujoco_tpu.serving.filtering import FilterService
from humanoid_mujoco_tpu.serving.grpc_estimation import (GrpcDirect,
                                                         GrpcFilter)


@pytest.fixture(scope="module")
def model():
    return humanoid.build_humanoid()


@pytest.fixture(scope="module")
def filter_client(model):
    server, port = make_filter_server(FilterService(model), port=0)
    server.start()
    client = GrpcFilter(task_id="Humanoid Cap Stand",
                        address=f"127.0.0.1:{port}")
    yield client, model
    client.close()
    server.stop(None)


@pytest.fixture(scope="module")
def direct_client(model):
    server, port = make_direct_server(
        DirectService(model, configuration_length=5), port=0)
    server.start()
    client = GrpcDirect(task_id="Humanoid Cap Stand",
                        configuration_length=5,
                        address=f"127.0.0.1:{port}")
    yield client, model
    client.close()
    server.stop(None)


class TestFilterWire:
    def test_init_state_roundtrip(self, filter_client):
        client, m = filter_client
        q0 = np.asarray(humanoid.stand_qpos(m))
        client.init(q0)
        s = client.state()
        np.testing.assert_allclose(s["qpos"], q0, atol=1e-5)
        np.testing.assert_allclose(s["qvel"], 0.0, atol=1e-6)

    def test_update_tracks_measurement(self, filter_client):
        """Feeding the exact measurement of the current state keeps the
        state (small innovation) — the kalman_test.cc consistency bar."""
        client, m = filter_client
        q0 = np.asarray(humanoid.stand_qpos(m))
        client.init(q0)
        s = make_state(m, qpos=jnp.asarray(q0))
        y = np.asarray(measure(m, s.qpos, s.qvel))
        innov = client.update(np.zeros(m.nu), y)
        assert np.isfinite(innov)
        s1 = client.state()
        # root stays near the stand pose after one predict+update
        assert abs(s1["qpos"][2] - q0[2]) < 0.05

    def test_covariance_and_noise(self, filter_client):
        client, m = filter_client
        client.init(np.asarray(humanoid.stand_qpos(m)))
        cov = client.covariance()
        assert cov.shape == (2 * m.nv, 2 * m.nv)
        # SPD-ish: symmetric, positive diagonal
        np.testing.assert_allclose(cov, cov.T, atol=1e-5)
        assert np.all(np.diag(cov) > 0)
        noise = client.noise()
        assert noise.shape == (30,) and np.all(noise > 0)

    def test_update_before_init_aborts(self, model):
        server, port = make_filter_server(FilterService(model), port=0)
        server.start()
        try:
            client = GrpcFilter(task_id="Humanoid Cap Stand",
                                address=f"127.0.0.1:{port}")
            with pytest.raises(Exception):
                client.update(np.zeros(model.nu), np.zeros(30))
            client.close()
        finally:
            server.stop(None)


class TestDirectWire:
    def test_settings_roundtrip(self, direct_client):
        client, _ = direct_client
        out = client.settings(gn_iters=2, force_weight=1e-4,
                              regularization=1e-4)
        assert out["gn_iters"] == 2
        assert out["force_weight"] == pytest.approx(1e-4)

    def test_optimize_denoises_window(self, direct_client):
        """Noisy configuration window in, smoothed window out with
        lower cost (direct_optimize's own test bar, over the wire)."""
        client, m = direct_client
        client.settings(gn_iters=2)
        rng = np.random.default_rng(0)
        q0 = np.asarray(humanoid.stand_qpos(m))
        T = 5
        qs = np.tile(q0, (T, 1))
        qs[:, 7:] += 0.01 * rng.standard_normal((T, m.nq - 7))
        s = make_state(m, qpos=jnp.asarray(q0))
        y = np.asarray(measure(m, s.qpos, s.qvel))
        client.data(qs, sensor=np.tile(y, (T, 1)),
                    ctrl=np.zeros((T, m.nu)))
        out = client.optimize()
        assert out["qpos"].shape == (T, m.nq)
        assert out["qvel"].shape == (T - 1, m.nv)
        assert np.isfinite(out["cost"])
        assert out["cost"] <= out["cost_initial"]
        st = client.status()
        assert st["optimized"] and st["cost"] == pytest.approx(
            out["cost"])
        assert client.cost() == pytest.approx(out["cost"])

    def test_reset_clears_window(self, direct_client):
        client, _ = direct_client
        client.reset()
        with pytest.raises(Exception):
            client.optimize()
