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
