"""Agent API + TCP serving protocol tests (agent_service_test.cc /
agent_test.py analogs — in-process + real socket round trip)."""

import json
import socket
import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from humanoid_mujoco_tpu.agent import Agent
from humanoid_mujoco_tpu.physics.humanoid import build_humanoid, stand_qpos
from humanoid_mujoco_tpu.serving.server import MPCServer
from humanoid_mujoco_tpu.tasks import stand_task


@pytest.fixture(scope="module")
def agent():
    m = build_humanoid()
    a = Agent(m, stand_task(), planner="sampling", nsample=4, horizon=3)
    a.set_state(qpos=np.array(stand_qpos(m)))
    return a


class TestAgentAPI:
    def test_planner_step_and_action(self, agent):
        r = agent.planner_step()
        assert np.isfinite(r)
        a = agent.get_action()
        assert a.shape == (12,)
        assert np.all(np.abs(a) <= 1.0 + 1e-6)

    def test_action_averaging(self, agent):
        a = agent.get_action(averaging_duration=0.006)
        assert a.shape == (12,)

    def test_state_roundtrip(self, agent):
        st = agent.get_state()
        agent.set_state(qpos=st["qpos"], qvel=st["qvel"],
                        time=st["time"])
        st2 = agent.get_state()
        np.testing.assert_allclose(st2["qpos"], st["qpos"])

    def test_cost_weights_roundtrip(self, agent):
        w0 = agent.get_cost_weights()
        agent.set_cost_weights({"Height": 42.0})
        assert agent.get_cost_weights()["Height"] == 42.0
        agent.set_cost_weights({"Height": w0["Height"]})

    def test_residuals_and_terms(self, agent):
        r = agent.get_residuals()
        assert r.shape == (28,)
        terms = agent.get_cost_term_values()
        assert set(terms) == {"Height", "Balance", "CoM Vel.",
                              "Joint Vel.", "Control"}

    def test_step_advances_sim(self, agent):
        t0 = agent.get_state()["time"]
        agent.step()
        assert agent.get_state()["time"] > t0

    def test_best_trajectory(self, agent):
        bt = agent.best_trajectory()
        assert "knots" in bt or "actions" in bt

    def test_unknown_planner_rejected(self):
        m = build_humanoid()
        with pytest.raises(ValueError):
            Agent(m, stand_task(), planner="nope")

    def test_set_weights_no_retrace_and_state_preserved(self, agent):
        agent.planner_step()  # ensure compiled
        qpos0 = agent.get_state()["qpos"].copy()
        pstate0 = agent.pstate
        n_compiles = agent._plan._cache_size()
        agent.set_cost_weights({"Height": 3.5})
        agent.set_task_parameter("Height Goal", 0.41)
        # sim state, planner state, rng survive the change (the reference
        # SetCostWeights RPC does not reset the episode)
        np.testing.assert_allclose(agent.get_state()["qpos"], qpos0)
        assert agent.pstate is pstate0
        agent.planner_step()
        assert agent._plan._cache_size() == n_compiles  # no retrace
        agent.set_cost_weights({"Height": 30.0})
        agent.set_task_parameter("Height Goal", 0.425)


class TestTCPServer:
    def test_socket_round_trip_and_malformed(self, agent):
        srv = MPCServer(agent, planner_iterations=1, port=5763)
        th = threading.Thread(target=srv.serve_forever, daemon=True)
        th.start()
        time.sleep(0.5)
        c = socket.create_connection(("127.0.0.1", 5763), timeout=300)
        req = dict(joint_pos=[0.0] * 12, joint_vel=[0.0] * 12,
                   ang_vel=[0.0] * 3, quat=[-0.7071, 0, 0, 0.7071])
        c.sendall(json.dumps(req).encode())
        reply = json.loads(c.recv(1 << 16).decode())
        assert isinstance(reply, list) and len(reply) == 12
        assert all(np.isfinite(reply))
        # malformed request -> structured error, connection survives
        c.sendall(b'{"joint_pos": [1]}')
        err = json.loads(c.recv(1 << 16).decode())
        assert "error" in err
        c.sendall(json.dumps(req).encode())
        reply2 = json.loads(c.recv(1 << 16).decode())
        assert len(reply2) == 12
        c.close()
        srv.stop()

    def test_coalesced_requests_both_served(self, agent):
        srv = MPCServer(agent, planner_iterations=0, port=5764)
        th = threading.Thread(target=srv.serve_forever, daemon=True)
        th.start()
        time.sleep(0.5)
        c = socket.create_connection(("127.0.0.1", 5764), timeout=300)
        req = json.dumps(dict(
            joint_pos=[0.0] * 12, joint_vel=[0.0] * 12,
            ang_vel=[0.0] * 3, quat=[-0.7071, 0, 0, 0.7071])).encode()
        # two requests in ONE send: raw_decode framing must serve both
        c.sendall(req + req)
        dec = json.JSONDecoder()
        buf = ""
        replies = []
        while len(replies) < 2:
            buf += c.recv(1 << 16).decode()
            while True:
                try:
                    obj, end = dec.raw_decode(buf.lstrip())
                except json.JSONDecodeError:
                    break
                replies.append(obj)
                buf = buf.lstrip()[end:]
        assert all(len(r) == 12 for r in replies)
        c.close()
        srv.stop()

    def test_position_mode(self, agent):
        srv = MPCServer(agent, planner_iterations=0, position_mode=True)
        jp = np.full(12, 0.3)
        out = srv.compute_action(jp, np.zeros(12), np.zeros(3),
                                 [-0.7071, 0, 0, 0.7071])
        # position targets = joint_pos + 0.3 * torque-action
        assert out.shape == (12,)
        assert np.all(np.isfinite(out))
