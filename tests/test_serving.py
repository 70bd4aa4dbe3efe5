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


class TestServingFilter:
    """Estimator-in-the-loop serving (app.cc:151-205 filter thread /
    filter_server analog): the EKF must TRACK root linear velocity
    across requests — the quantity the per-request state rebuild
    (set_robot_state) zeroes every time."""

    def test_ekf_tracks_root_velocity_across_requests(self):
        import jax
        from humanoid_mujoco_tpu.physics.model import make_state
        from humanoid_mujoco_tpu.physics.step import step
        from humanoid_mujoco_tpu.serving.filtering import ServingFilter

        m = build_humanoid()
        s = make_state(m, qpos=stand_qpos(m))
        # drop the robot with a lateral shove: nonzero root velocity
        s = s.replace(qvel=s.qvel.at[0].set(0.4))
        f = ServingFilter(m)
        u = np.zeros(12, dtype=np.float32)
        step_j = jax.jit(lambda st: step(m, st, jnp.asarray(u))[0])

        est_v = truth_v = None
        for i in range(60):
            jp = np.asarray(s.qpos[7:])
            jv = np.asarray(s.qvel[6:])
            w = np.asarray(s.qvel[3:6])
            quat = np.asarray(s.qpos[3:7])
            est = f.update(jp, jv, w, quat, last_ctrl=u)
            est_v = np.asarray(est.qvel[:3])
            truth_v = np.asarray(s.qvel[:3])
            s = step_j(s)
        assert np.all(np.isfinite(est_v))
        # the root x-velocity (the shove) locks on within ~40 updates
        assert abs(est_v[0] - truth_v[0]) < 0.05, (est_v, truth_v)
        # and overall the filter beats the zero-velocity rebuild
        err_ekf = np.linalg.norm(est_v - truth_v)
        err_zero = np.linalg.norm(truth_v)
        assert err_ekf < 0.6 * err_zero, (est_v, truth_v)

    def test_filter_service_verbs(self):
        from humanoid_mujoco_tpu.estimators.sensors import measure
        from humanoid_mujoco_tpu.serving.filtering import FilterService

        m = build_humanoid()
        svc = FilterService(m)
        q0 = np.asarray(stand_qpos(m))
        svc.init(q0)
        st = svc.state()
        assert np.allclose(st["qpos"], q0, atol=1e-6)
        y = np.asarray(measure(m, jnp.asarray(q0), jnp.zeros(m.nv)))
        innov = svc.update(np.zeros(12), y)
        assert np.isfinite(innov)
        cov = svc.covariance()
        assert cov.shape == (2 * m.nv, 2 * m.nv)
        assert np.all(np.isfinite(cov))
        assert svc.noise().shape == (30,)
        svc.reset()
        assert svc.state() is None

    def test_server_ekf_mode_smoke(self):
        m = build_humanoid()
        a = Agent(m, stand_task(), planner="sampling", nsample=4,
                  horizon=3)
        srv = MPCServer(a, planner_iterations=1, filter="ekf")
        jp = np.zeros(12)
        out1 = srv.compute_action(jp, np.zeros(12), np.zeros(3),
                                  [-0.7071, 0, 0, 0.7071])
        out2 = srv.compute_action(jp, np.zeros(12), np.zeros(3),
                                  [-0.7071, 0, 0, 0.7071])
        assert out1.shape == out2.shape == (12,)
        assert np.all(np.isfinite(out1)) and np.all(np.isfinite(out2))
        assert srv._filter is not None and srv._filter.ekf is not None


class TestAgentVerbParity:
    """SetMocap / SetAnything / nominal GetAction — the remaining
    agent.proto verb surface (agent.proto:19-60,
    python/mujoco_mpc/agent.py:135-393)."""

    def test_set_anything_task_and_state(self, agent):
        agent.set_anything(task={"Height": 12.5},
                           state={"time": 0.5})
        assert agent.get_cost_weights()["Height"] == 12.5
        assert agent.get_state()["time"] == pytest.approx(0.5)
        with pytest.raises(KeyError):
            agent.set_anything(task={"NoSuchField": 1.0})

    def test_set_anything_model_rebuilds_and_takes_effect(self):
        from humanoid_mujoco_tpu.tasks import get_task, particle_model
        m = particle_model(dt=0.02)
        a = Agent(m, get_task("ParticleFixed"), planner="sampling",
                  nsample=4, horizon=4, plan_dt=0.02)
        a.planner_step()
        qv_before = a.get_state()["qvel"].copy()
        # flip gravity to a strong +x field: the free particle must
        # accelerate in +x after the model edit (proves the jitted step
        # closure was rebuilt around the new model, not stale-baked)
        a.set_anything(model={"gravity": [5.0, 0.0, 0.0]})
        for _ in range(5):
            a.step()
        qv = a.get_state()["qvel"]
        assert qv[0] > qv_before[0] + 0.1, qv

    def test_nominal_action_drops_feedback(self):
        from humanoid_mujoco_tpu.physics.humanoid import (build_humanoid,
                                                          stand_qpos)
        m = build_humanoid()
        a = Agent(m, stand_task(), planner="ilqg", horizon=5)
        a.set_state(qpos=np.asarray(stand_qpos(m)))
        a.planner_step()
        # force unit feedback scaling (the nominal line search may pick
        # k_scale=0, which would make both actions identical), then
        # move the state off the nominal so K·dx is nonzero
        import dataclasses
        a.pstate = dataclasses.replace(
            a.pstate, policy=a.pstate.policy.replace(
                k_scale=jnp.asarray(1.0, dtype=a.state.qpos.dtype)))
        q = np.array(a.state.qpos)   # writable copy
        q[7:] += 0.05
        a.set_state(qpos=q)
        u_fb = a.get_action()
        u_nom = a.get_action(nominal_action=True)
        assert u_fb.shape == u_nom.shape == (12,)
        assert np.all(np.isfinite(u_fb)) and np.all(np.isfinite(u_nom))
        assert not np.allclose(u_fb, u_nom)
