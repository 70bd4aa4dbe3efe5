"""Native C++ runtime tests: thread pool, state store, policy buffer,
agent loop (the reference's threadpool_test / state_test analogs)."""

import threading
import time

import numpy as np
import pytest

native = pytest.importorskip("humanoid_mujoco_tpu.native")

try:
    native.load()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native runtime unavailable")


class TestThreadPool:
    def test_schedule_and_wait(self):
        tp = native.NativeThreadPool(4)
        results = []
        lock = threading.Lock()
        for i in range(20):
            def fn(i=i):
                with lock:
                    results.append(i * i)
            tp.schedule(fn)
        tp.wait_count(20)
        assert sorted(results) == [i * i for i in range(20)]
        tp.reset_count()
        assert tp.count == 0
        tp.close()


class TestStateStore:
    def test_set_get_roundtrip_and_version(self):
        ss = native.NativeStateStore(19, 18)
        qp = np.arange(19, dtype=np.float64)
        qv = np.arange(18, dtype=np.float64) * 0.1
        v0 = ss.version
        ss.set(qp, qv, 1.25)
        qp2, qv2, t = ss.get()
        np.testing.assert_allclose(qp2, qp)
        np.testing.assert_allclose(qv2, qv)
        assert t == 1.25
        assert ss.version == v0 + 1
        ss.close()

    def test_concurrent_readers_see_consistent_snapshots(self):
        ss = native.NativeStateStore(4, 4)
        stop = threading.Event()
        bad = []

        def writer():
            i = 0
            while not stop.is_set():
                v = np.full(4, float(i))
                ss.set(v, v, float(i))
                i += 1

        def reader():
            while not stop.is_set():
                qp, qv, t = ss.get()
                if not (qp == qp[0]).all() or not (qv == qp[0]).all():
                    bad.append((qp.copy(), qv.copy()))

        ths = [threading.Thread(target=writer)] + [
            threading.Thread(target=reader) for _ in range(2)]
        for t in ths:
            t.start()
        time.sleep(0.5)
        stop.set()
        for t in ths:
            t.join()
        assert not bad  # no torn reads


class TestPolicyBuffer:
    def test_publish_read(self):
        pb = native.NativePolicyBuffer()
        assert pb.read() is None
        pb.publish(b"hello-policy")
        assert pb.read() == b"hello-policy"
        pb.publish(b"v2")
        assert pb.read() == b"v2"
        assert pb.version == 2
        pb.close()


class TestAgentLoop:
    def test_background_iterations(self):
        loop = native.NativeAgentLoop()
        counter = dict(n=0)

        def plan_once():
            counter["n"] += 1
            time.sleep(0.001)
            return False

        loop.start(plan_once)
        time.sleep(0.3)
        loop.stop()
        assert counter["n"] > 10
        assert loop.iterations == counter["n"]

    def test_stop_on_true(self):
        loop = native.NativeAgentLoop()

        def plan_once():
            return True  # stop immediately

        loop.start(plan_once)
        time.sleep(0.2)
        assert loop.iterations == 1
        loop.close()
