"""Asynchronous agent: the reference's physics-thread / plan-thread
architecture (mjpc/agent.cc:318-329 + app.cc:90-93,493-496) on the
native runtime.

A C++ background thread runs the planner continuously against the
freshest state snapshot (NativeStateStore); the control side queries
actions at any rate from the most recently published policy
(NativePolicyBuffer). This is the async semantics the synchronous
mpc.mpc_rollout does not provide — planning overlaps execution, exactly
like the real robot serving path.
"""

from __future__ import annotations

import pickle

import jax
import numpy as np

from ..agent import Agent
from . import NativeAgentLoop, NativePolicyBuffer, NativeStateStore


class AsyncAgent:
    def __init__(self, agent: Agent):
        self.agent = agent
        m = agent.model
        self.state_store = NativeStateStore(m.nq, m.nv)
        self.policy_buf = NativePolicyBuffer()
        self.loop = NativeAgentLoop()
        s = agent.state
        self.state_store.set(np.asarray(s.qpos), np.asarray(s.qvel),
                             float(s.time))
        self._publish_policy()

    def _publish_policy(self):
        blob = pickle.dumps(jax.tree.map(np.asarray, self.agent.pstate))
        self.policy_buf.publish(blob)

    def _plan_once(self) -> bool:
        qp, qv, t = self.state_store.get()
        self.agent.set_state(qpos=qp, qvel=qv, time=t)
        self.agent.planner_step()
        self._publish_policy()
        return False  # keep looping

    def start(self):
        """Start the background plan loop (plan thread analog)."""
        self.loop.start(self._plan_once)

    def stop(self):
        self.loop.stop()

    def set_state(self, qpos, qvel, time: float):
        """Publish a fresh state snapshot (physics thread analog)."""
        self.state_store.set(np.asarray(qpos), np.asarray(qvel),
                             float(time))

    def get_action(self, qpos, qvel, time: float):
        """Query the freshest published policy at the control rate."""
        blob = self.policy_buf.read()
        if blob is not None:
            pstate = pickle.loads(blob)
            pstate = jax.tree.map(jax.numpy.asarray, pstate)
            self.agent.pstate = pstate
        self.agent.set_state(qpos=qpos, qvel=qvel, time=time)
        return self.agent.get_action(time=time)

    @property
    def plan_iterations(self) -> int:
        return self.loop.iterations
