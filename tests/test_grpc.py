"""gRPC wire-protocol tests — agent_service_test.cc (in-process server)
and python/mujoco_mpc/agent_test.py (spawned server binary) analogs."""

import numpy as np
import pytest

from humanoid_mujoco_tpu.agent import Agent
from humanoid_mujoco_tpu.serving.grpc_client import GrpcAgent
from humanoid_mujoco_tpu.serving.grpc_server import make_server
from humanoid_mujoco_tpu.tasks import get_task, particle_model


@pytest.fixture(scope="module")
def served():
    """In-process servicer on a loopback port (the reference uses
    server->InProcessChannel, agent_service_test.cc:50-55)."""
    agent = Agent(particle_model(dt=0.02), get_task("ParticleFixed"),
                  planner="sampling", nsample=8, horizon=8, plan_dt=0.02)
    server, port = make_server(agent, port=0)
    server.start()
    client = GrpcAgent(task_id="", address=f"127.0.0.1:{port}",
                       spawn=False)
    yield client, agent
    client.close()
    server.stop(None)


class TestWireProtocol:
    def test_state_roundtrip(self, served):
        client, _ = served
        client.set_state(qpos=[0.1, -0.2], qvel=[0.0, 0.0], time=0.0)
        s = client.get_state()
        np.testing.assert_allclose(s["qpos"], [0.1, -0.2], atol=1e-6)
        assert s["time"] == 0.0

    def test_planner_improves_and_action_finite(self, served):
        client, _ = served
        client.set_state(qpos=[0.1, -0.2], qvel=[0.0, 0.0], time=0.0)
        r0 = client.planner_step()
        r = client.planner_step(iterations=3)
        assert np.isfinite(r0) and np.isfinite(r)
        u = client.get_action()
        assert u.shape == (2,) and np.all(np.isfinite(u))
        assert np.all(np.abs(u) <= 1.0 + 1e-6)

    def test_step_advances_server_side_sim(self, served):
        client, _ = served
        t0 = client.get_state()["time"]
        client.step()
        assert client.get_state()["time"] > t0

    def test_weights_params_mode_mocap(self, served):
        client, _ = served
        client.set_cost_weights({"Position": 11.0})
        assert client.get_cost_weights()["Position"] == 11.0
        vals = client.get_cost_term_values()
        assert set(vals) == {"Position", "Velocity", "Control"}
        assert client.get_mode() == "default"
        client.set_mocap("goal", pos=[0.3, 0.1, 0.0])
        r = client.get_residuals()
        # position residual = qpos - goal: reflects the mocap move
        q = client.get_state()["qpos"]
        np.testing.assert_allclose(r[:2], q - [0.3, 0.1], atol=1e-5)

    def test_best_trajectory_and_set_anything(self, served):
        client, _ = served
        tr = client.best_trajectory()
        assert tr["knots"].shape[1] == 2
        client.set_anything(state={"time": 2.0})
        assert client.get_state()["time"] == pytest.approx(2.0)
        with pytest.raises(Exception):
            client.set_anything(task={"Bogus": 1.0})
        # server survives the aborted RPC
        assert client.get_mode() == "default"

    def test_reset(self, served):
        client, _ = served
        client.set_state(qpos=[0.4, 0.4])
        client.reset()
        np.testing.assert_allclose(client.get_state()["qpos"], 0.0,
                                   atol=1e-6)


class TestSpawnedServer:
    def test_spawn_init_plan_act(self):
        """Full binding path: subprocess server + Init-by-task_id
        (python/mujoco_mpc/agent.py:81-123 + test_step_env_with_planner)."""
        with GrpcAgent(task_id="ParticleFixed", planner="sampling",
                       nsample=8, horizon=8) as ag:
            ag.set_state(qpos=[0.0, 0.0], qvel=[0.0, 0.0], time=0.0)
            for _ in range(40):
                ag.planner_step()
                ag.step()
            s = ag.get_state()
            # moved toward the (0.25, 0) goal (0.8 s of sim)
            assert s["qpos"][0] > 0.05
            u = ag.get_action(nominal_action=True)
            assert np.all(np.isfinite(u))
