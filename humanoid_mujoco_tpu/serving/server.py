"""Robot-facing TCP/JSON MPC server — the controllers/mpc_server.py
analog.

Protocol (mpc_server.py:32-65): client sends one JSON object
  {"joint_pos": [12], "joint_vel": [12], "ang_vel": [3], "quat": [4]}
per request; server replies a JSON list of 12 torques (or position
targets when position_mode, TORQUE_TO_POSITION_MULTIPLIER=0.3,
mpc_server.py:8-20).

Per request: re-estimate the full state (height scan), run H planner
iterations, return the policy action (compute_action,
controllers/mpc_utils.py:89-106).
"""

from __future__ import annotations

import json
import socket
import threading
import time
from typing import Optional

import numpy as np

from ..agent import Agent
from .state_estimation import set_robot_state

TORQUE_TO_POSITION_MULTIPLIER = 0.3   # mpc_server.py:16
DEFAULT_PORT = 5555                   # mpc_server.py:22


class MPCServer:
    def __init__(self, agent: Agent, planner_iterations: int = 2,
                 position_mode: bool = False, port: int = DEFAULT_PORT,
                 host: str = "127.0.0.1", async_mode: bool = False,
                 filter: str = "none"):
        """`async_mode=True` runs the reference's plan-while-acting
        architecture (agent.cc:318-329): a background thread iterates the
        planner continuously against the freshest request state, and each
        request returns immediately from the latest published policy —
        request latency is one jitted action query, not
        `planner_iterations` plan solves.

        `filter="ekf"` runs the estimator in the loop (the reference's
        estimator thread, app.cc:151-205): requests fold into a
        persistent EKF so root linear velocity and height are tracked
        across requests instead of re-guessed per request."""
        self.agent = agent
        self.planner_iterations = planner_iterations
        self.position_mode = position_mode
        self.port = port
        self.host = host
        self.async_mode = async_mode
        if filter not in ("none", "ekf"):
            raise ValueError(f"unknown filter {filter!r}")
        self.filter_mode = filter
        self._filter = None
        self._last_action = None
        self._async = None
        self._t0 = None
        self._sock: Optional[socket.socket] = None
        self._stop = threading.Event()

    def start_async(self):
        """Start the background plan loop (idempotent)."""
        if self._async is None:
            from ..native.async_agent import AsyncAgent
            self._async = AsyncAgent(self.agent)
            self._t0 = time.monotonic()
            self._async.start()
        return self._async

    def stop_async(self):
        if self._async is not None:
            self._async.stop()
            self._async = None

    @property
    def plan_iterations(self) -> int:
        return self._async.plan_iterations if self._async else 0

    def compute_action(self, joint_pos, joint_vel, ang_vel, quat):
        """State re-estimation + plan + action (mpc_utils.py:89-106)."""
        if self.filter_mode == "ekf":
            if self._filter is None:
                from .filtering import ServingFilter
                self._filter = ServingFilter(self.agent.model)
            state = self._filter.update(joint_pos, joint_vel, ang_vel,
                                        quat, last_ctrl=self._last_action)
        else:
            state = set_robot_state(self.agent.model, joint_pos,
                                    joint_vel, ang_vel, quat)
        if self.async_mode:
            a = self.start_async()
            t = time.monotonic() - self._t0
            a.set_state(np.asarray(state.qpos), np.asarray(state.qvel), t)
            action = a.get_action(np.asarray(state.qpos),
                                  np.asarray(state.qvel), t)
        else:
            self.agent.state = state
            for _ in range(self.planner_iterations):
                self.agent.planner_step()
            action = self.agent.get_action()
        self._last_action = np.asarray(action)   # EKF predict ctrl
        if self.position_mode:
            # convert torque command to joint position targets
            action = (np.asarray(joint_pos)
                      + TORQUE_TO_POSITION_MULTIPLIER * action)
        return np.asarray(action)

    def handle(self, conn: socket.socket):
        # raw_decode consumes ONE object per pass so coalesced requests
        # (two sends arriving in one recv) don't wedge the connection,
        # and the remainder stays buffered for the next pass.
        decoder = json.JSONDecoder()
        buf = ""
        with conn:
            while not self._stop.is_set():
                data = conn.recv(65536)
                if not data:
                    break
                buf += data.decode()
                while True:
                    stripped = buf.lstrip()
                    if not stripped:
                        buf = ""
                        break
                    try:
                        msg, end = decoder.raw_decode(stripped)
                    except json.JSONDecodeError:
                        buf = stripped  # partial message — await more
                        break
                    buf = stripped[end:]
                    t0 = time.perf_counter()
                    try:
                        action = self.compute_action(
                            msg["joint_pos"], msg["joint_vel"],
                            msg["ang_vel"], msg["quat"])
                        reply = json.dumps(
                            [float(x) for x in action]).encode()
                    except (KeyError, ValueError, TypeError) as e:
                        reply = json.dumps({"error": str(e)}).encode()
                    conn.sendall(reply)
                    dt = time.perf_counter() - t0
                    # control-frequency probe (mpc_server.py:67-69)
                    print(f"control frequency: "
                          f"{1.0 / max(dt, 1e-9):.1f} Hz", flush=True)

    def serve_forever(self):
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((self.host, self.port))
        self._sock.listen(1)
        print(f"MPC server listening on {self.host}:{self.port}")
        while not self._stop.is_set():
            try:
                self._sock.settimeout(1.0)
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            self.handle(conn)

    def stop(self):
        self._stop.set()
        self.stop_async()
        if self._sock is not None:
            self._sock.close()


def serve(planner: str = "ilqg", port: int = DEFAULT_PORT, **agent_kw):
    from ..physics.humanoid import build_humanoid
    from ..tasks import stand_task
    agent = Agent(build_humanoid(), stand_task(), planner=planner,
                  **agent_kw)
    MPCServer(agent, port=port).serve_forever()


if __name__ == "__main__":
    serve()
