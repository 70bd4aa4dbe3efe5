"""Generate physics/op3_data.py from the reference's ROBOTIS OP3 model.

Loads mjpc/tasks/op3/op3.xml (menagerie robotis_op3, modified per the
task's op3.xml.patch) with the MuJoCo compiler to extract the exact
kinematic/inertial/joint tables, and records them as plain numeric
tuples — the model NUMBERS are the spec being rebuilt (same approach as
physics/humanoid21_data.py). Missing large-blob meshes are stubbed with
tiny tetrahedra: every inertial is explicit in the XML so mesh geometry
never affects the extracted numbers.

Run from the repo root: python tools/gen_op3_data.py
"""

import os
import shutil
import struct

import mujoco
import numpy as np

SRC = "/root/reference/mujoco_mpc/build/mjpc/tasks/op3"
TMP = "/tmp/op3_xlate"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "humanoid_mujoco_tpu", "physics",
    "op3_data.py")


def stub_stl(path):
    """Minimal binary STL: a 1 mm tetrahedron (4 distinct vertices)."""
    v = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1)]
    v = [tuple(c * 2e-2 for c in p) for p in v]
    faces = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(faces)))
        for a, b, c in faces:
            f.write(struct.pack("<3f", 0, 0, 1))
            for p in (v[a], v[b], v[c]):
                f.write(struct.pack("<3f", *p))
            f.write(struct.pack("<H", 0))


def prepare():
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(os.path.join(TMP, "assets", "simplified_convex"))
    shutil.copy(os.path.join(SRC, "op3.xml"), TMP)
    src_assets = os.path.join(SRC, "assets")
    for sub in ("", "simplified_convex"):
        s = os.path.join(src_assets, sub)
        d = os.path.join(TMP, "assets", sub)
        for f in os.listdir(s):
            p = os.path.join(s, f)
            if os.path.isfile(p):
                shutil.copy(p, os.path.join(d, f))
    # stub the stripped large blobs (.MISSING_LARGE_BLOBS)
    import re
    xml = open(os.path.join(TMP, "op3.xml")).read()
    for ref in re.findall(r'file="([^"]+\.stl)"', xml):
        p = os.path.join(TMP, "assets", ref)
        if not os.path.exists(p):
            stub_stl(p)
    return os.path.join(TMP, "op3.xml")


def fmt(x, nd=8):
    a = np.asarray(x, dtype=float).ravel()
    return "(" + ", ".join(f"{v:.8g}" for v in a) + ")"


def main():
    path = prepare()
    m = mujoco.MjModel.from_xml_path(path)

    lines = [
        '"""ROBOTIS OP3 model tables — transcribed by tools/gen_op3_data.py',
        "from the reference's mjpc/tasks/op3/op3.xml (menagerie",
        "robotis_op3 as modified by op3.xml.patch: head joints removed,",
        "head/torso/hand/foot sites added). Numbers only — the model IS",
        'the spec being rebuilt."""',
        "",
        "# (name, parent, pos, quat, mass, ipos, iquat, diaginertia)",
        "BODIES = (",
    ]
    names = []
    for b in range(1, m.nbody):
        name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY, b)
        names.append(name)
        parent = (mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY,
                                    m.body_parentid[b])
                  if m.body_parentid[b] else None)
        lines.append(
            f"    ({name!r}, {parent!r}, {fmt(m.body_pos[b])}, "
            f"{fmt(m.body_quat[b])}, {m.body_mass[b]:.8g}, "
            f"{fmt(m.body_ipos[b])}, {fmt(m.body_iquat[b])}, "
            f"{fmt(m.body_inertia[b])}),")
    lines.append(")")
    lines.append("")
    lines.append("# hinge joints (patch removes head_pan/head_tilt):")
    lines.append("# (name, body, axis, pos, range, damping, armature)")
    lines.append("JOINTS = (")
    for j in range(m.njnt):
        if m.jnt_type[j] != mujoco.mjtJoint.mjJNT_HINGE:
            continue
        name = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_JOINT, j)
        if name in ("head_pan", "head_tilt"):
            continue
        body = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY,
                                 m.jnt_bodyid[j])
        dof = m.jnt_dofadr[j]
        lines.append(
            f"    ({name!r}, {body!r}, {fmt(m.jnt_axis[j])}, "
            f"{fmt(m.jnt_pos[j])}, {fmt(m.jnt_range[j])}, "
            f"{m.dof_damping[dof]:.8g}, {m.dof_armature[dof]:.8g}),")
    lines.append(")")
    lines.append("")
    lines.append("# foot collision boxes: (body, pos, size) from the")
    lines.append("# 'foot' geom class rows")
    lines.append("FOOT_BOXES = (")
    for g in range(m.ngeom):
        if m.geom_type[g] != mujoco.mjtGeom.mjGEOM_BOX:
            continue
        body = mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_BODY,
                                 m.geom_bodyid[g])
        lines.append(f"    ({body!r}, {fmt(m.geom_pos[g])}, "
                     f"{fmt(m.geom_size[g])}),")
    lines.append(")")
    lines.append("")
    lines.append("# task keyframes (op3/task.xml): name -> qpos (25,)")
    lines.append("KEYFRAMES = {")
    for kf, q in (
        ("home",
         "-0.00363268 -6.3448e-07 0.246 1 0 0 0 -0.534072 0.879648 "
         "-0.62832 0.534072 -0.879648 0.62832 1.93442e-05 -6.23496e-05 "
         "-0.596904 1.13098 0.534072 0 -1.80695e-05 6.15245e-05 "
         "0.596904 -1.13098 -0.534072 4.91532e-06"),
        ("handstand",
         "-0.00363268 -6.3448e-07 0.338 0 1 0 0 3.1416 0.879648 "
         "-0.62832 -3.1416 -0.879648 0.62832 1.93442e-05 -6.23496e-05 "
         "-0.596904 1.13098 0.534072 0 -1.80695e-05 6.15245e-05 "
         "0.596904 -1.13098 -0.534072 4.91532e-06")):
        vals = ", ".join(q.split())
        lines.append(f"    {kf!r}: ({vals}),")
    lines.append("}")
    lines.append("")
    lines.append("# sites added by op3.xml.patch: (name, body, pos)")
    lines.append("SITES = (")
    for name, body, pos in (
            ("head", "head_pan_link", (0.0, 0.0, 0.0)),
            ("torso", "body_link", (0.0, 0.0, 0.0)),
            ("left_hand", "l_el_link", (-0.02, 0.14, 0.0)),
            ("right_hand", "r_el_link", (-0.02, -0.14, 0.0)),
            ("left_foot", "l_ank_roll_link", (0.025, 0.0, -0.025)),
            ("right_foot", "r_ank_roll_link", (0.025, 0.0, -0.025))):
        lines.append(f"    ({name!r}, {body!r}, {fmt(pos)}),")
    lines.append(")")
    lines.append("")
    lines.append("# position-servo class (op3.xml defaults): kp 21.1,")
    lines.append("# ctrl +-pi, force +-5; joint frictionloss 0.03 is")
    lines.append("# folded into damping by the builder")
    lines.append("SERVO = dict(kp=21.1, ctrlrange=3.141592,")
    lines.append("             forcerange=5.0)")
    lines.append("")
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}: {len(names)} bodies")


if __name__ == "__main__":
    main()
