"""Asynchronous agent: the reference's physics-thread / plan-thread
architecture (mjpc/agent.cc:318-329 + app.cc:90-93,493-496) on the
native runtime.

A background thread runs the planner continuously against the freshest
state snapshot (NativeStateStore, the states/state.h shared-mutex
analog); the control side queries actions at any rate from the most
recently published policy (NativePolicyBuffer, the policy shared-mutex
analog, sampling/planner.h:162).

Thread-safety contract (fixing the round-1 race): the PLAN thread is the
only owner of the shared `Agent`'s mutable fields (state, pstate, rng).
The CONTROL side never touches them — it deserializes the published
policy into its own local copy and calls the agent's *stateless jitted
action closure* directly (jit dispatch is thread-safe; the closure only
reads static config). State flows control->plan exclusively through the
native seqlock StateStore; policy flows plan->control exclusively
through the PolicyBuffer.
"""

from __future__ import annotations

import pickle
import queue

import jax
import numpy as np

from ..agent import Agent
from . import NativeAgentLoop, NativePolicyBuffer, NativeStateStore


class AsyncAgent:
    def __init__(self, agent: Agent, control_device: str = "cpu"):
        """`control_device`: where the control-side action closure runs.
        Planning stays on the default backend (TPU); the action lookup is
        tiny math (spline eval / K(t)·dx), so compiling it for the host
        CPU keeps the control path off the accelerator dispatch tunnel —
        ~11 µs/query instead of a ~100 ms TPU round-trip. This is the
        reference's deployment shape: the 500 Hz physics thread only ever
        does ActionFromPolicy locally (app.cc:90-93) while the plan
        thread owns the heavy compute."""
        self.agent = agent
        m = agent.model
        self.state_store = NativeStateStore(m.nq, m.nv)
        self.policy_buf = NativePolicyBuffer()
        self.loop = NativeAgentLoop()
        s = agent.state
        self.state_store.set(np.asarray(s.qpos), np.asarray(s.qvel),
                             float(s.time))
        # control-side action closure on the control device
        self._ctl_action = self._build_ctl_action(control_device)
        # control-side policy copy (owned by the control thread only)
        self._ctl_pstate = jax.tree.map(np.asarray, agent.pstate)
        # agent mutations (weight sliders, task params — the GUI verbs,
        # agent.cc slider handling) are queued here and applied BY the
        # plan thread, which is the sole owner of the shared Agent
        self._cmds: queue.Queue = queue.Queue()
        self._publish_policy()

    def _build_ctl_action(self, control_device):
        a = self.agent
        dev = jax.devices(control_device)[0] if control_device else None
        if a.planner == "ilqg":
            from ..planners import ilqg_action
            fn = lambda pol, qp, qv, t: ilqg_action(a.model, pol, qp,
                                                    qv, t)
        else:
            from ..planners import policy_action
            order = a.cfg.order
            fn = lambda pol, t: policy_action(a.model, pol, t, order)
        return jax.jit(fn, device=dev) if dev is not None else jax.jit(fn)

    # ---- plan thread side (sole owner of self.agent mutables) ----
    def _publish_policy(self):
        blob = pickle.dumps(jax.tree.map(np.asarray, self.agent.pstate))
        self.policy_buf.publish(blob)

    def _plan_once(self) -> bool:
        while True:   # drain queued agent mutations (GUI verbs)
            try:
                fn = self._cmds.get_nowait()
            except queue.Empty:
                break
            fn(self.agent)
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

    # ---- control thread side (never mutates self.agent) ----
    def submit(self, fn):
        """Queue an agent mutation (e.g. lambda a:
        a.set_cost_weights({...})) for the plan thread to apply before
        its next iteration — the GUI-slider path without breaking the
        single-owner contract."""
        self._cmds.put(fn)

    def set_state(self, qpos, qvel, time: float):
        """Publish a fresh state snapshot (physics thread analog)."""
        self.state_store.set(np.asarray(qpos), np.asarray(qvel),
                             float(time))

    def get_action(self, qpos, qvel, time: float):
        """Query the freshest published policy at the control rate.

        Reads the policy buffer into a control-side copy and evaluates
        the stateless jitted action closure — no shared mutable state
        with the plan thread (ActionFromPolicy under the policy
        shared_lock, app.cc:90-93)."""
        blob = self.policy_buf.read()
        if blob is not None:
            # numpy leaves: the control-device jit takes them directly
            # (host arrays go to the control device, not the TPU)
            self._ctl_pstate = pickle.loads(blob)
        ps = self._ctl_pstate
        a = self.agent
        t = np.asarray(time, dtype=np.asarray(qpos).dtype)
        if a.planner == "ilqg":
            u = self._ctl_action(ps.policy, np.asarray(qpos),
                                 np.asarray(qvel), t)
        else:
            u = self._ctl_action(ps, t)
        return np.asarray(u)

    @property
    def plan_iterations(self) -> int:
        return self.loop.iterations
