"""Native (C++) runtime bindings: thread pool, state store, policy
buffer, async agent loop — the reference's C++ runtime substrate
(mjpc/threadpool.cc, states/state.cc, the Agent plan thread) rebuilt as
a small dependency-free shared library loaded through ctypes.

The library auto-builds on first import with g++ (no pip installs);
set HMT_NO_NATIVE=1 to skip (everything degrades to pure-Python
fallbacks in async_agent.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "runtime.cpp")
_SO = os.path.join(_DIR, "libhmt_runtime.so")
_LOCK = threading.Lock()
_LIB = None


def _build():
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    """Load (building if needed) the native runtime library."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if os.environ.get("HMT_NO_NATIVE") == "1":
            raise RuntimeError("native runtime disabled (HMT_NO_NATIVE=1)")
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        # signatures
        lib.threadpool_create.restype = ctypes.c_void_p
        lib.threadpool_create.argtypes = [ctypes.c_int]
        lib.threadpool_destroy.argtypes = [ctypes.c_void_p]
        lib.threadpool_schedule.argtypes = [ctypes.c_void_p,
                                            ctypes.c_void_p,
                                            ctypes.c_void_p]
        lib.threadpool_wait_count.argtypes = [ctypes.c_void_p,
                                              ctypes.c_long]
        lib.threadpool_reset_count.argtypes = [ctypes.c_void_p]
        lib.threadpool_count.restype = ctypes.c_long
        lib.threadpool_count.argtypes = [ctypes.c_void_p]
        lib.state_create.restype = ctypes.c_void_p
        lib.state_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.state_destroy.argtypes = [ctypes.c_void_p]
        lib.state_set.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_double),
                                  ctypes.POINTER(ctypes.c_double),
                                  ctypes.c_double]
        lib.state_get.restype = ctypes.c_double
        lib.state_get.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_double),
                                  ctypes.POINTER(ctypes.c_double)]
        lib.state_version.restype = ctypes.c_long
        lib.state_version.argtypes = [ctypes.c_void_p]
        lib.policy_create.restype = ctypes.c_void_p
        lib.policy_destroy.argtypes = [ctypes.c_void_p]
        lib.policy_publish.argtypes = [ctypes.c_void_p,
                                       ctypes.c_char_p, ctypes.c_long]
        lib.policy_size.restype = ctypes.c_long
        lib.policy_size.argtypes = [ctypes.c_void_p]
        lib.policy_read.restype = ctypes.c_long
        lib.policy_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_long]
        lib.policy_version.restype = ctypes.c_long
        lib.policy_version.argtypes = [ctypes.c_void_p]
        lib.agentloop_create.restype = ctypes.c_void_p
        lib.agentloop_start.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                        ctypes.c_void_p]
        lib.agentloop_stop.argtypes = [ctypes.c_void_p]
        lib.agentloop_iterations.restype = ctypes.c_long
        lib.agentloop_iterations.argtypes = [ctypes.c_void_p]
        lib.agentloop_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


PLAN_CB = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.c_void_p)
TASK_FN = ctypes.CFUNCTYPE(None, ctypes.c_void_p)


class NativeThreadPool:
    """mjpc::ThreadPool semantics: Schedule / WaitCount / ResetCount."""

    def __init__(self, n_workers: int):
        self._lib = load()
        self._p = self._lib.threadpool_create(n_workers)
        self._refs = []  # keep callbacks alive

    def schedule(self, fn):
        cb = TASK_FN(lambda _arg: fn())
        self._refs.append(cb)
        self._lib.threadpool_schedule(
            self._p, ctypes.cast(cb, ctypes.c_void_p), None)

    def wait_count(self, n: int):
        self._lib.threadpool_wait_count(self._p, n)
        self._refs.clear()

    def reset_count(self):
        self._lib.threadpool_reset_count(self._p)

    @property
    def count(self) -> int:
        return self._lib.threadpool_count(self._p)

    def close(self):
        if self._p:
            self._lib.threadpool_destroy(self._p)
            self._p = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeStateStore:
    """mjpc::State semantics: thread-safe snapshot set/get."""

    def __init__(self, nq: int, nv: int):
        import numpy as np
        self._lib = load()
        self._nq, self._nv = nq, nv
        self._p = self._lib.state_create(nq, nv)
        self._np = np

    def set(self, qpos, qvel, time: float):
        np = self._np
        qp = np.ascontiguousarray(qpos, dtype=np.float64)
        qv = np.ascontiguousarray(qvel, dtype=np.float64)
        self._lib.state_set(
            self._p, qp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            qv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            float(time))

    def get(self):
        np = self._np
        qp = np.empty(self._nq, dtype=np.float64)
        qv = np.empty(self._nv, dtype=np.float64)
        t = self._lib.state_get(
            self._p, qp.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            qv.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return qp, qv, t

    @property
    def version(self) -> int:
        return self._lib.state_version(self._p)

    def close(self):
        if self._p:
            self._lib.state_destroy(self._p)
            self._p = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativePolicyBuffer:
    """Double-buffered policy blob (pickled pytree) with atomic swap."""

    def __init__(self):
        self._lib = load()
        self._p = self._lib.policy_create()

    def publish(self, blob: bytes):
        self._lib.policy_publish(self._p, blob, len(blob))

    def read(self):
        n = self._lib.policy_size(self._p)
        if n == 0:
            return None
        buf = ctypes.create_string_buffer(n)
        got = self._lib.policy_read(self._p, buf, n)
        return buf.raw[:got]

    @property
    def version(self) -> int:
        return self._lib.policy_version(self._p)

    def close(self):
        if self._p:
            self._lib.policy_destroy(self._p)
            self._p = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeAgentLoop:
    """Background plan loop (Agent::Plan busy loop, agent.cc:318-329)."""

    def __init__(self):
        self._lib = load()
        self._p = self._lib.agentloop_create()
        self._cb = None

    def start(self, plan_once):
        """plan_once() -> bool (True = stop)."""
        def _cb(_ctx):
            try:
                return 1 if plan_once() else 0
            except Exception:
                return 1
        self._cb = PLAN_CB(_cb)
        self._lib.agentloop_start(
            self._p, ctypes.cast(self._cb, ctypes.c_void_p), None)

    def stop(self):
        self._lib.agentloop_stop(self._p)

    @property
    def iterations(self) -> int:
        return self._lib.agentloop_iterations(self._p)

    def close(self):
        if self._p:
            self._lib.agentloop_destroy(self._p)
            self._p = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
