"""SMPL -> Unitree G1 retargeting demo on TPU (committed evidence).

The CPU test suite gates the end-to-end URDF-chain IK (grad of the
42-joint kinematic chain compiles pathologically on XLA CPU), so this
script runs it at real scale on the TPU and writes the loss table to
docs/retarget_g1.md.

Reference parity: pyroki_retarget/10_humanoid_retargeting.py (SMPL
keypoints -> G1 via per-frame IK); here one jitted Adam loop over the
whole trajectory.

Usage:  python tools/retarget_g1_demo.py [--frames 60] [--iters 1500]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

G1_URDF = ("/root/reference/pyroki_retarget/unitree_description/urdf/"
           "g1_retarget/main.urdf")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--iters", type=int, default=1500)
    p.add_argument("--out", default="docs/retarget_g1.md")
    args = p.parse_args()

    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from parc_tpu.retarget import urdf as urdf_lib
    from parc_tpu.retarget.keypoint_ik import SMPL_JOINT_NAMES
    from parc_tpu.data.synthetic import walking_clip
    from parc_tpu.data.humanoid import humanoid_spec
    from parc_tpu.retarget.keypoint_ik import keypoints_from_motion

    robot = urdf_lib.parse_urdf(G1_URDF)
    print(f"parsed {robot.name}: {len(robot.link_names)} links, "
          f"{robot.num_dofs} dofs")

    # source: SMPL-style keypoints exported from a real humanoid clip
    # (the reference feeds smpl_keypoints.npy; same layout)
    model = humanoid_spec().build()
    clip = walking_clip(seed=0, n=args.frames)
    body_kps = keypoints_from_motion(model, np.asarray(clip.frames))
    from parc_tpu.retarget.keypoint_ik import DEFAULT_SMPL_TO_HUMANOID
    kps = np.zeros((args.frames, len(SMPL_JOINT_NAMES), 3), np.float32)
    body_names = list(model.body_names)
    for smpl_name, body_name in DEFAULT_SMPL_TO_HUMANOID.items():
        kps[:, SMPL_JOINT_NAMES.index(smpl_name)] = (
            body_kps[:, body_names.index(body_name)])

    t0 = time.time()
    root_pos, root_quat, q, losses = urdf_lib.retarget_keypoints_to_robot(
        robot, kps,
        cfg=urdf_lib.UrdfRetargetConfig(iters=args.iters))
    wall = time.time() - t0
    print({k: round(v, 5) for k, v in losses.items()}, f"wall={wall:.1f}s")

    in_limits = bool(np.all(q >= robot.lower_limits - 1e-4)
                     and np.all(q <= robot.upper_limits + 1e-4))
    lines = [
        "# SMPL -> Unitree G1 retargeting (TPU run)",
        "",
        "Reference pipeline: pyroki_retarget/10_humanoid_retargeting.py",
        "(SMPL keypoints -> G1 URDF via keypoint-alignment IK).  Here:",
        "`parc_tpu/retarget/urdf.py` — stdlib URDF parse -> batched JAX FK",
        "-> one jitted Adam loop over the whole trajectory (all frames in",
        "one device program).  The CPU test suite covers parse/FK/mimic",
        "analytically (tests/test_retarget.py); this run is the",
        "end-to-end IK evidence at real scale.",
        "",
        f"- source: {args.frames}-frame walking clip keypoints "
        "(SMPL joint layout)",
        f"- robot: {robot.name}, {len(robot.link_names)} links / "
        f"{robot.num_dofs} actuated dofs (G1 URDF)",
        f"- IK: {args.iters} Adam iters, wall {wall:.1f}s "
        f"(backend: {jax.default_backend()})",
        f"- joint limits respected: {in_limits}",
        "",
        "| loss term | final value |",
        "|---|---|",
    ]
    for k, v in sorted(losses.items()):
        lines.append(f"| {k} | {v:.5f} |")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
