#!/usr/bin/env python
"""Render a fixed-seed synthetic sequence in TUM RGB-D layout.

The container has no network access, so the TUM benchmark sequences
cannot be fetched; this generates the standardized stand-in: a
few-hundred-frame CLOSED-LOOP trajectory (the camera returns to its
starting view, so keyframe insertion, culling, local BA, loop closing
and global BA all fire) through the textured CornerField world, written
exactly like a TUM sequence:

  OUT_DIR/rgb.txt            "timestamp path" index
  OUT_DIR/rgb/<t>.png        8-bit grayscale frames
  OUT_DIR/groundtruth.txt    "t tx ty tz qx qy qz qw" (camera-to-world)
  OUT_DIR/Settings.yaml      reference-style calibration for the loader

`examples/eval_tum.py OUT_DIR --settings OUT_DIR/Settings.yaml` then
exercises the full io/tum.py + tracker + metrics path end-to-end and
reports Sim(3)-aligned ATE / RPE against the written ground truth
(BASELINE.md "synthetic loop ATE" row).

Usage: python examples/make_synthetic_tum.py OUT_DIR [--frames N]
           [--seed S] [--mode loop] [--points N]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FPS = 30.0


def rotation_to_quat(R):
    """[3,3] camera-to-world rotation -> (qx, qy, qz, qw)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                         (R[1, 0] - R[0, 1]) / s, 0.25 * s])
    i = int(np.argmax(np.diagonal(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.zeros(4)
    q[i] = 0.25 * s
    q[j] = (R[j, i] + R[i, j]) / s
    q[k] = (R[k, i] + R[i, k]) / s
    q[3] = (R[k, j] - R[j, k]) / s
    return q


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mode", default="loop",
                    choices=["loop", "strafe", "forward", "circuit",
                             "planar", "rotation", "lowtex"])
    ap.add_argument("--points", type=int, default=900)
    ap.add_argument("--noise", type=float, default=0.0,
                    help="per-frame gaussian sensor noise, gray levels. "
                         "Noise degrades keypoint localization so drift "
                         "accumulates like on a real camera — on the "
                         "circuit this is what forces the EXPLICIT loop "
                         "closure (projection matching alone cannot "
                         "reconnect a drifted revisit)")
    ap.add_argument("--blackout", default=None, metavar="N,M",
                    help="blank frames N..M (inclusive, 0-based) to near-"
                         "black: the tracker MUST drop to LOST there "
                         "(the reference's mState=LOST intent, "
                         "tracking.hpp LOST state) and the benchmark "
                         "measures the recovery tiers — BoW/PnP "
                         "relocalization and TrackReferenceKeyFrame — "
                         "once the scene returns: recovery rate, frames-"
                         "to-recover, post-recovery ATE")
    args = ap.parse_args()
    blackout = None
    if args.blackout:
        n, m = (int(v) for v in args.blackout.split(","))
        assert 0 <= n <= m, (n, m)
        blackout = (n, m)

    from PIL import Image

    from orb_slam_tracking_tpu.config import CameraConfig
    from orb_slam_tracking_tpu.utils.synthetic import (
        CornerField,
        make_trajectory,
        plane_points,
        render_frame,
        ring_points,
    )

    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                       width=640, height=480, fps=FPS)
    rng = np.random.default_rng(args.seed)
    if args.mode == "circuit":
        # a 360-degree ring world surrounding the circuit: the start view
        # is only re-seen at the end, so drift accumulated over the
        # circuit must be absorbed by EXPLICIT loop closing
        n = max(args.points, 2400)
        field = CornerField(rng, pts=ring_points(rng, n=n))
    elif args.mode == "planar":
        # PLANAR-DOMINANT: every world point on one fronto-parallel wall.
        # Two-view initialization must route through the homography
        # branch end-to-end (the reference's RH ratio model selection,
        # Initializer.cpp:471-485: a plane degenerates F, RH > 0.40
        # selects ReconstructH) — the sequence-level exercise of the
        # H path that unit tests alone don't give.
        field = CornerField(rng, pts=plane_points(rng, n=args.points))
    elif args.mode == "lowtex":
        # LOW-TEXTURE / HIGH-NOISE stress: a sparse world (an order of
        # magnitude fewer textured patches than the other modes, so only
        # a few dozen corners land in any one view) under strong sensor
        # noise. Starves the FAST budget (the dual-threshold minTh
        # fallback must fire, reference ORBextractor.cpp ComputeKeyPoints
        # minThFAST retry), thins the matcher's mutual-best set, and
        # degrades descriptor stability — the regime where real trackers
        # drop to LOST.
        n = min(args.points, 220)
        field = CornerField(rng, n=n, x=(-5.0, 5.0),
                            y=(-3.5, 3.5), z=(3.0, 10.0))
        if args.noise == 0.0:
            args.noise = 12.0
    else:
        # a deep, wide field so every loop pose sees plenty of texture;
        # the rotation sweep pans right, so extend the field that way
        xr = (-5.0, 8.0) if args.mode == "rotation" else (-5.0, 5.0)
        field = CornerField(rng, n=args.points, x=xr,
                            y=(-3.5, 3.5), z=(3.0, 10.0))
    # the planar world pairs with the strafe trajectory (translation
    # parallel to the wall maximizes the plane-induced homography)
    traj_mode = {"planar": "strafe", "lowtex": "loop"}.get(
        args.mode, args.mode)
    poses = make_trajectory(args.frames, traj_mode)

    rgb_dir = os.path.join(args.out_dir, "rgb")
    os.makedirs(rgb_dir, exist_ok=True)
    index_rows = []
    gt_rows = []
    for i, (R, t) in enumerate(poses):
        ts = i / FPS
        img = render_frame(field, cam, R, t)
        if args.noise > 0:
            img = img + rng.normal(0.0, args.noise, img.shape)
        if blackout is not None and blackout[0] <= i <= blackout[1]:
            # a sensor blackout: uniform near-black + faint noise so the
            # extractor finds essentially no corners (FAST needs
            # contrast). The noise comes from an INDEPENDENT generator
            # so the main rng stream stays aligned with a same-seed
            # no-blackout control run — post-blackout frames are then
            # pixel-identical between the two (review finding r5)
            bo_rng = np.random.default_rng((args.seed, 0xB1AC, i))
            img = np.full_like(img, 8.0) + bo_rng.normal(0.0, 1.0,
                                                         img.shape)
        img = np.clip(img, 0, 255).astype(np.uint8)
        name = f"rgb/{ts:.6f}.png"
        Image.fromarray(img, mode="L").save(
            os.path.join(args.out_dir, name))
        index_rows.append(f"{ts:.6f} {name}")
        centre = -R.T @ t
        q = rotation_to_quat(R.T.astype(np.float64))
        gt_rows.append(
            f"{ts:.6f} {centre[0]:.6f} {centre[1]:.6f} {centre[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}")
        if (i + 1) % 50 == 0:
            print(f"rendered {i + 1}/{len(poses)}", flush=True)

    with open(os.path.join(args.out_dir, "rgb.txt"), "w") as f:
        f.write("# timestamp filename\n" + "\n".join(index_rows) + "\n")
    with open(os.path.join(args.out_dir, "groundtruth.txt"), "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n"
                + "\n".join(gt_rows) + "\n")
    with open(os.path.join(args.out_dir, "Settings.yaml"), "w") as f:
        f.write(f"""%YAML:1.0
Camera.fx: {cam.fx}
Camera.fy: {cam.fy}
Camera.cx: {cam.cx}
Camera.cy: {cam.cy}
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.fps: {FPS}
Camera.RGB: 0
Camera.width: {cam.width}
Camera.height: {cam.height}
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
    print(f"wrote {len(poses)} frames to {args.out_dir} "
          f"(mode={args.mode}, seed={args.seed})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
