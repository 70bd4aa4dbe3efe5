"""Generate physics/tracking_motions.npz from the reference's CMU
mocap keyframes (mjpc/tasks/humanoid/tracking/keyframes/*.xml).

Each keyframe file holds one clip: per-frame marker positions `mpos`
(16 markers x 3, model mocap-body order = tracking.cc body_names),
plus the humanoid qpos/qvel. The motion NUMBERS are the spec
(CMU mocap data redistributed by the reference). Order and lengths
follow tracking.cc kMotionLengths.

Run from the repo root: python tools/gen_tracking_data.py
"""

import os
import re

import numpy as np

SRC = "/root/reference/mujoco_mpc/mjpc/tasks/humanoid/tracking/keyframes"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "humanoid_mujoco_tpu", "physics",
    "tracking_motions.npz")

# (clip name, file) in tracking.cc kMotionLengths order
CLIPS = (
    ("Jump", "CMU-CMU-02-02_04_poses.xml"),
    ("Kick Spin", "CMU-CMU-87-87_01_poses.xml"),
    ("Spin Kick", "CMU-CMU-88-88_06_poses.xml"),
    ("Cartwheel (1)", "CMU-CMU-88-88_07_poses.xml"),
    ("Crouch Flip", "CMU-CMU-88-88_08_poses.xml"),
    ("Cartwheel (2)", "CMU-CMU-88-88_09_poses.xml"),
    ("Monkey Flip", "CMU-CMU-90-90_19_poses.xml"),
    ("Dance", "CMU-CMU-103-103_08_poses.xml"),
    ("Run", "CMU-CMU-108-108_13_poses.xml"),
    ("Walk", "CMU-CMU-137-137_40_poses.xml"),
)


def parse(path):
    xml = open(path).read()
    mpos, qpos, qvel = [], [], []
    widths = dict(mpos=48, qpos=28, qvel=27)
    for key in re.finditer(r"<key [^>]*/>", xml, re.S):
        k = key.group(0)
        for field, out in (("mpos", mpos), ("qpos", qpos),
                           ("qvel", qvel)):
            mobj = re.search(field + r'="([^"]+)"', k)
            out.append([float(v) for v in mobj.group(1).split()]
                       if mobj else [0.0] * widths[field])
    return (np.asarray(mpos, np.float32).reshape(len(mpos), 16, 3),
            np.asarray(qpos, np.float32),
            np.asarray(qvel, np.float32))


def main():
    all_mpos, all_qpos, all_qvel, lengths, names = [], [], [], [], []
    for name, fn in CLIPS:
        mpos, qpos, qvel = parse(os.path.join(SRC, fn))
        all_mpos.append(mpos)
        all_qpos.append(qpos)
        all_qvel.append(qvel)
        lengths.append(mpos.shape[0])
        names.append(name)
        print(f"{name:15s} {mpos.shape[0]:4d} frames")
    np.savez_compressed(
        OUT,
        mpos=np.concatenate(all_mpos, axis=0),
        qpos=np.concatenate(all_qpos, axis=0),
        qvel=np.concatenate(all_qvel, axis=0),
        lengths=np.asarray(lengths, np.int32),
        names=np.asarray(names))
    print(f"wrote {OUT} ({os.path.getsize(OUT)//1024} KiB)")


if __name__ == "__main__":
    main()
