"""Interactive viewer tests (viz/viewer.py — the headless analog of the
reference's GUI app / rl/visualize_policy.py)."""

import json
import re
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

from humanoid_mujoco_tpu.physics import humanoid
from humanoid_mujoco_tpu.physics.model import make_state
from humanoid_mujoco_tpu.physics.step import step
from humanoid_mujoco_tpu.viz.viewer import (export_html, serve,
                                            trajectory_scene)


def _short_traj(n=20):
    m = humanoid.build_humanoid()
    s = make_state(m, qpos=humanoid.stand_qpos(m))
    st = jax.jit(lambda s: step(m, s, jnp.zeros(m.nu))[0])
    traj = [np.asarray(s.qpos)]
    for _ in range(n):
        s = st(s)
        traj.append(np.asarray(s.qpos))
    return m, np.stack(traj)


class TestViewer:
    def test_scene_structure(self):
        m, traj = _short_traj(20)
        scene = trajectory_scene(m, traj, stride=4)
        assert len(scene["frames"]) == len(traj[::4])
        nsph = m.struct.nsph
        assert len(scene["radii"]) == nsph
        assert len(scene["bodies"]) == nsph
        for f in scene["frames"]:
            assert len(f) == nsph and len(f[0]) == 3
        # playback dt reflects the stride
        assert abs(scene["dt"] - 4 * float(m.dt)) < 1e-9
        # JSON-serializable end to end
        json.loads(json.dumps(scene))

    def test_export_html_embeds_scene(self, tmp_path):
        m, traj = _short_traj(8)
        scene = trajectory_scene(m, traj, stride=2)
        path = export_html(scene, str(tmp_path / "v.html"))
        html = open(path).read()
        assert html.startswith("<!DOCTYPE html>")
        # the embedded JSON must parse back to the same scene
        mm = re.search(r"const S = (\{.*?\});\n", html, re.S)
        assert mm, "scene JSON not found in page"
        embedded = json.loads(mm.group(1))
        assert embedded["frames"] == scene["frames"]
        assert embedded["radii"] == scene["radii"]
        # interactive controls present
        for widget in ("id=\"play\"", "id=\"scrub\"", "onmousedown",
                       "onwheel"):
            assert widget in html

    def test_serve_responds(self):
        m, traj = _short_traj(4)
        scene = trajectory_scene(m, traj, stride=1)
        srv = serve(scene, port=0, block=False)
        try:
            port = srv.server_address[1]
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/", timeout=10) as r:
                body = r.read().decode()
            assert r.status == 200
            assert "const S =" in body
        finally:
            srv.shutdown()


class TestLiveViewer:
    """Plan-in-the-loop live surface (viz/live.py — the mjpc app
    analog, app.cc:209-496): physics + async plan loop, live snapshot,
    weight sliders, perturbations."""

    def test_live_session_end_to_end(self):
        import time

        from humanoid_mujoco_tpu.viz.live import LiveSession, serve_live

        session = LiveSession(task_name="ParticleFixed",
                              planner="sampling", nsample=8, horizon=8,
                              control_hz=50.0, realtime=False)
        session.start()
        srv = serve_live(session, port=0, block=False)
        try:
            port = srv.server_address[1]

            def get(path):
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}{path}",
                        timeout=30) as r:
                    return json.loads(r.read())

            def post(path, payload):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}{path}",
                    data=json.dumps(payload).encode(), method="POST")
                urllib.request.urlopen(req, timeout=30).read()

            # page served with embedded meta
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/", timeout=30) as r:
                page = r.read().decode()
            assert "const META =" in page and "set_weight" in page

            # live state advances between polls
            s1 = get("/state.json")
            time.sleep(0.5)
            s2 = get("/state.json")
            assert s2["t"] > s1["t"]
            assert len(s2["spheres"]) == len(session.meta["radii"])
            assert s2["control_hz"] > 0

            # weight slider reaches the plan thread's agent
            post("/set_weight", {"name": "Position", "value": 7.5})
            deadline = time.time() + 10
            while time.time() < deadline:
                w = session.agent.get_cost_weights().get("Position")
                if w == 7.5:
                    break
                time.sleep(0.05)
            assert session.agent.get_cost_weights()["Position"] == 7.5

            # perturbation visibly moves the particle
            q_before = np.asarray(session._state.qpos).copy()
            post("/perturb", {"force": [5.0, 0.0, 0.0]})
            time.sleep(0.5)
            q_after = np.asarray(session._state.qpos)
            assert not np.allclose(q_before, q_after, atol=1e-5)
        finally:
            srv.shutdown()
            session.stop()
