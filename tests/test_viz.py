"""Software renderer + policy-video export tests
(generate_policy_videos.py / visualize_policy.py analogs)."""

import os

import numpy as np
import pytest

from humanoid_mujoco_tpu.physics.humanoid import build_humanoid, stand_qpos
from humanoid_mujoco_tpu.viz.render import (Camera, render_frame,
                                            render_trajectory)


@pytest.fixture(scope="module")
def model():
    return build_humanoid()


class TestRenderFrame:
    def test_shape_and_content(self, model):
        img = render_frame(model, stand_qpos(model), width=160,
                           height=120)
        assert img.shape == (120, 160, 3) and img.dtype == np.uint8
        # the robot + floor must actually be drawn: many distinct colors
        assert len(np.unique(img.reshape(-1, 3), axis=0)) > 10

    def test_greenscreen_background(self, model):
        img = render_frame(model, stand_qpos(model), width=160,
                           height=120, greenscreen=True)
        # corners are pure chroma green (BGR)
        for c in (img[0, 0], img[0, -1], img[-1, 0], img[-1, -1]):
            assert tuple(c) == (0, 255, 0)
        # but the robot occupies some non-green pixels
        nongreen = np.any(img != np.array([0, 255, 0]), axis=-1)
        assert nongreen.sum() > 50

    def test_camera_moves_the_view(self, model):
        q = stand_qpos(model)
        a = render_frame(model, q, 160, 120,
                         camera=Camera(azimuth=0.0))
        b = render_frame(model, q, 160, 120,
                         camera=Camera(azimuth=90.0))
        assert np.any(a != b)


class TestVideoExport:
    def test_render_trajectory_writes_readable_video(self, model,
                                                     tmp_path):
        import cv2
        q = np.asarray(stand_qpos(model))
        traj = np.stack([q] * 5)
        traj[:, 2] += 0.01 * np.arange(5)          # slight motion
        path = render_trajectory(model, traj,
                                 str(tmp_path / "clip.mp4"),
                                 fps=10, width=160, height=120)
        assert os.path.exists(path) and os.path.getsize(path) > 0
        cap = cv2.VideoCapture(path)
        n = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            assert frame.shape == (120, 160, 3)
            n += 1
        cap.release()
        assert n == 5

    def test_record_episode_and_video(self, tmp_path):
        from humanoid_mujoco_tpu.rl.videos import (generate_policy_videos,
                                                   record_episode)
        em, traj = record_episode(None, seconds=0.05, seed=0)
        assert traj.ndim == 2 and traj.shape[0] >= 2
        paths = generate_policy_videos(None, str(tmp_path), n_videos=1,
                                       seconds=0.03, width=160,
                                       height=120)
        assert len(paths) == 1 and os.path.getsize(paths[0]) > 0
