"""Generate the golden-trajectory parity fixture from REAL MuJoCo.

Runs the reference's own scene (/root/reference/simulation/assets/
world.xml — floor + 12-DOF humanoid, the model every reference component
simulates) under recorded open-loop control sequences and saves the
resulting qpos/qvel trajectories. tests/test_parity.py replays the same
controls through OUR engine and asserts trajectory agreement — the
BASELINE.md north-star "control-sequence parity within tolerance of CPU
MuJoCo" made concrete (VERDICT round-1 weak #8).

Run where the `mujoco` wheel is available:
  python tests/make_golden.py [--out tests/fixtures/golden_mujoco.npz]

The fixture is checked in so the parity test also works in images
without MuJoCo.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORLD_XML = "/root/reference/simulation/assets/world.xml"
N_STEPS = 250            # 0.5 s at the reference's 0.002 s timestep
SINE_AMPL = 0.25         # ctrl units (gear 20 -> ±5 N·m wiggle)


def control_sequences(nu: int, n_steps: int, dt: float):
    """Deterministic recorded controls: zero hold + multi-sine wiggle."""
    t = np.arange(n_steps)[:, None] * dt
    freqs = 0.7 + 0.31 * np.arange(nu)[None, :]
    phases = 1.7 * np.arange(nu)[None, :]
    sine = SINE_AMPL * np.sin(2 * np.pi * freqs * t + phases)
    return {"zero": np.zeros((n_steps, nu)),
            "sine": sine.astype(np.float64)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures",
        "golden_mujoco.npz"))
    ap.add_argument("--xml", default=WORLD_XML)
    args = ap.parse_args()

    import mujoco

    from humanoid_mujoco_tpu.physics import humanoid

    m = mujoco.MjModel.from_xml_path(args.xml)
    jnt_names = [m.joint(i).name for i in range(m.njnt)]
    act_names = [m.actuator(i).name for i in range(m.nu)]

    # initial state: our stand keyframe, mapped into MuJoCo's layout by
    # joint name (root free joint first in both)
    our = humanoid.build_humanoid()
    q_our = np.asarray(humanoid.stand_qpos(our))
    qpos0 = np.zeros(m.nq)
    qpos0[:7] = q_our[:7]
    for j, name in enumerate(jnt_names):
        if name == "humanoid_free":
            continue
        adr = m.jnt_qposadr[j]
        our_j = our.struct.jnt_names.index(name)
        qpos0[adr] = q_our[our.struct.jnt_qadr[our_j]]

    out = {"jnt_names": np.array(jnt_names), "act_names": np.array(act_names),
           "dt": np.float64(m.opt.timestep), "qpos0": qpos0}
    seqs = control_sequences(m.nu, N_STEPS, m.opt.timestep)
    for tag, ctrl in seqs.items():
        d = mujoco.MjData(m)
        d.qpos[:] = qpos0
        qs, vs = [], []
        for k in range(ctrl.shape[0]):
            d.ctrl[:] = ctrl[k]
            mujoco.mj_step(m, d)
            qs.append(d.qpos.copy())
            vs.append(d.qvel.copy())
        out[f"{tag}_ctrl"] = ctrl
        out[f"{tag}_qpos"] = np.stack(qs)
        out[f"{tag}_qvel"] = np.stack(vs)
        print(f"{tag}: final z={qs[-1][2]:.4f} "
              f"max|qvel|={np.abs(vs[-1]).max():.3f}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print("wrote", args.out, os.path.getsize(args.out), "bytes")


if __name__ == "__main__":
    main()
