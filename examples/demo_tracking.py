#!/usr/bin/env python
"""Full tracking-loop demo.

Runs the completed tracking state machine (the subsystem the reference
declares but never finishes, ``tracking.{hpp,cpp}``) over either:
- a directory of image frames (``--images DIR``), or
- a rendered synthetic sequence with exact ground truth (default), in
  which case ATE against ground truth is reported.

Usage:
  python examples/demo_tracking.py [--frames N] [--cpu] [--images DIR --settings YAML]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--images", default=None, help="directory of frames")
    ap.add_argument("--settings", default=None, help="settings YAML for --images")
    ap.add_argument("--trajectory", default="strafe", choices=["strafe", "forward"])
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from orb_slam_tracking_tpu.config import (
        CameraConfig, OrbConfig, SystemConfig, TrackerConfig, load_system_config,
    )
    from orb_slam_tracking_tpu.slam import Tracker, TrackState

    if args.images:
        if not args.settings:
            print("error: --images requires --settings", file=sys.stderr)
            return 2
        from orb_slam_tracking_tpu.io import load_gray

        files = sorted(
            f for f in os.listdir(args.images) if f.lower().endswith((".png", ".jpg"))
        )[: args.frames if args.frames else None]
        if not files:
            print(f"error: no images in {args.images}", file=sys.stderr)
            return 2
        first = load_gray(os.path.join(args.images, files[0]))
        cfg = load_system_config(args.settings, width=first.shape[1], height=first.shape[0])
        # native prefetching decode pipeline (falls back to PIL if unbuilt)
        from orb_slam_tracking_tpu.io.native_loader import FrameLoader

        frames = FrameLoader([os.path.join(args.images, f) for f in files])
        gt = None
        n_frames = len(files)
    else:
        from orb_slam_tracking_tpu.utils.synthetic import (
            CornerField, make_trajectory, render_frame,
        )

        rng = np.random.default_rng(0)
        cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, width=640, height=480)
        cfg = SystemConfig(
            camera=cam, orb=OrbConfig(n_features=1000),
            tracker=TrackerConfig(max_map_points=2048, max_keyframes=16, ba_window=8),
        )
        field = CornerField(rng, n=900)
        gt = make_trajectory(args.frames, args.trajectory)
        frames = (render_frame(field, cam, R, t) for R, t in gt)
        n_frames = args.frames

    tracker = Tracker(cfg)
    t0 = time.time()
    n_working = 0
    for i, frame in enumerate(frames):
        m = tracker.track(frame, i / 30.0)
        tag = ""
        if "kf" in m:
            tag = (f" [KF obs={m.get('kf_obs')} new={m.get('kf_new_points')} "
                   f"BA {m.get('ba_cost0', 0):.0f}->{m.get('ba_cost', 0):.0f}]")
        if "init" in m:
            tag = f" [init: {m['init']}]"
        if "lost" in m:
            tag = f" [LOST: {m['lost']}]"
        if "reloc" in m:
            tag = f" [reloc: {m['reloc']}]"
        print(f"frame {i:3d} {m['state_after']:<15s} kps={m['n_kps']:4d} "
              f"inl={m.get('n_inliers', '-'):>4}{tag}")
        if tracker.state == TrackState.WORKING:
            n_working += 1
    wall = time.time() - t0
    print(f"\ntracked {n_working}/{n_frames} frames in {wall:.1f}s "
          f"({n_frames / wall:.2f} fps incl. compile); "
          f"keyframes={tracker.n_kf}, map points={int(tracker.map.n_points())}")

    if gt is not None and len(tracker.trajectory) > 5:
        from orb_slam_tracking_tpu.utils.metrics import ate_rmse

        est = {fid: (-R.T @ t) for fid, ts, R, t in tracker.trajectory}
        gtc = {i: (-gt[i][0].T @ gt[i][1]) for i in range(len(gt))}
        common = sorted(set(est) & set(gtc))
        ate = ate_rmse(
            np.stack([est[i] for i in common]), np.stack([gtc[i] for i in common])
        )
        print(f"ATE (Sim3-aligned) over {len(common)} frames: {ate:.4f} scene units")
        return 0 if ate < 0.05 else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
