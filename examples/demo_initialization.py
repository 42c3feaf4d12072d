#!/usr/bin/env python
"""Two-view initialization demo over an image directory.

CLI equivalent of the reference's ``demo_initialization``
(``demo/demo_initialization.cpp:16-194``): scan a directory for ``.png``
frames, try pairs ``(i, i+skip)`` until two-view initialization succeeds,
print match/model/triangulation statistics, and write the triangulated
points to ``triangulatedPoints.txt``.

Usage:
  python examples/demo_initialization.py SETTINGS_YAML IMAGE_DIR SKIP [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("image_dir")
    ap.add_argument("skip", type=int, nargs="?", default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=2000,
                    help="RANSAC iterations (demo default 2000, tracking 200)")
    ap.add_argument("--out", default="triangulatedPoints.txt")
    ap.add_argument("--save-viz", default=None, metavar="PREFIX",
                    help="write PREFIX-keypoints.png / PREFIX-matches.png "
                         "(the reference demo's DLib visualization)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from orb_slam_tracking_tpu.config import InitConfig, load_system_config
    from orb_slam_tracking_tpu.geometry import camera
    from orb_slam_tracking_tpu.geometry.twoview import initialize_two_view
    from orb_slam_tracking_tpu.io import load_gray
    from orb_slam_tracking_tpu.ops import orb_extract
    from orb_slam_tracking_tpu.ops.matcher import (
        compact_matches,
        search_for_initialization,
    )

    frames = sorted(
        f for f in os.listdir(args.image_dir) if f.lower().endswith(".png")
    )
    if len(frames) < 1 + args.skip:
        print(f"error: need at least {1 + args.skip} .png images in {args.image_dir}",
              file=sys.stderr)
        return 2

    first = load_gray(os.path.join(args.image_dir, frames[0]))
    h, w = first.shape
    cfg = load_system_config(args.settings, width=w, height=h)
    ocfg = cfg.init_orb  # 2x features during init (tracking.cpp:17-23)
    icfg = InitConfig(ransac_iterations=args.iters)
    K = camera.intrinsics_matrix(cfg.camera)
    print(f"settings: {args.settings}; {len(frames)} frames; init features "
          f"{ocfg.n_features}; RANSAC iters {icfg.ransac_iterations}")

    for i in range(len(frames) - args.skip):
        f1, f2 = frames[i], frames[i + args.skip]
        img1 = load_gray(os.path.join(args.image_dir, f1))
        img2 = load_gray(os.path.join(args.image_dir, f2))
        t0 = time.time()
        k1 = orb_extract(jnp.asarray(img1), ocfg)
        k2 = orb_extract(jnp.asarray(img2), ocfg)
        un1 = camera.undistort_pixels(cfg.camera, k1.xy)
        un2 = camera.undistort_pixels(cfg.camera, k2.xy)
        res = search_for_initialization(
            k1.desc, un1, k1.octave, k1.angle_deg, k1.valid,
            k2.desc, un2, k2.octave, k2.angle_deg, k2.valid,
            cfg.matcher,
        )
        nm = int(res.n_matches)
        print(f"pair ({f1}, {f2}): kps {int(k1.kps.count()) if hasattr(k1,'kps') else int(np.asarray(k1.valid).sum())}"
              f"/{int(np.asarray(k2.valid).sum())}, matches {nm} "
              f"(rejects d/r/o {int(res.n_reject_distance)}/"
              f"{int(res.n_reject_ratio)}/{int(res.n_reject_orientation)})")
        if args.save_viz:
            from orb_slam_tracking_tpu.utils.viz import draw_keypoints, draw_matches

            draw_keypoints(img1, np.asarray(k1.xy), np.asarray(k1.valid),
                           np.asarray(k1.octave),
                           path=f"{args.save_viz}-keypoints.png")
            draw_matches(img1, np.asarray(un1), img2, np.asarray(un2),
                         np.asarray(res.matches12),
                         path=f"{args.save_viz}-matches.png")
            print(f"  wrote {args.save_viz}-keypoints.png / -matches.png")
        if nm < icfg.min_matches:
            print(f"  too few matches (<{icfg.min_matches}), trying next pair")
            continue
        pairs, pv = compact_matches(res.matches12, cfg.matcher.max_matches)
        tv = initialize_two_view(
            un1[pairs[:, 0]], un2[pairs[:, 1]], pv, K,
            jax.random.PRNGKey(0), icfg,
        )
        dt = time.time() - t0
        rh = float(tv.score_h) / max(float(tv.score_h) + float(tv.score_f), 1e-9)
        print(f"  Score of H: {float(tv.score_h):.1f}")
        print(f"  Score of F: {float(tv.score_f):.1f}")
        print(f"  RH={rh:.3f} -> model: {'H' if bool(tv.used_homography) else 'F'}")
        print(f"  inliers: {int(tv.n_inliers)}/{int(np.asarray(pv).sum())}, "
              f"triangulated (good): {int(np.asarray(tv.tri_mask).sum())}, "
              f"nGood: {int(tv.n_good)}, parallax: {float(tv.parallax_deg):.2f} deg, "
              f"wall: {dt:.2f}s")
        if bool(tv.success):
            R = np.asarray(tv.R21)
            t = np.asarray(tv.t21)
            print("  Initialization successful!")
            print("  R21:\n", np.array2string(R, precision=4))
            print("  t21:", np.array2string(t, precision=4))
            pts = np.asarray(tv.points3d)[np.asarray(tv.tri_mask)]
            with open(args.out, "w") as fh:
                for p in pts:
                    fh.write(f"{p[0]} {p[1]} {p[2]}\n")
            print(f"  wrote {len(pts)} points to {args.out}")
            return 0
        print("  Initialization failed on this pair "
              "(low parallax / ambiguous / too few good points)")
    print("Initialization did not succeed on any pair")
    return 1


if __name__ == "__main__":
    sys.exit(main())
