#!/usr/bin/env python
"""Train an ORB vocabulary artifact from a corpus of frames.

The offline-artifact workflow of DBoW2 (``TemplatedVocabulary.h:107-140``
``create`` from per-image feature lists, ``:229-265`` save/load): extract
ORB descriptors from many frames, cluster a (k, L) tree, save it as npz.
Point ``TrackerConfig.vocab_path`` at the output to use it for
place-recognition instead of the per-run init-frame vocabulary.

Usage:
  python examples/train_vocabulary.py out.npz --images dir/  # PNG/JPG dir
  python examples/train_vocabulary.py out.npz --synthetic 40 # no dataset
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output .npz vocabulary path")
    ap.add_argument("--images", help="directory of grayscale-able images")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="train from N rendered synthetic frames instead")
    ap.add_argument("-k", type=int, default=10, help="branching factor")
    ap.add_argument("-L", "--depth", type=int, default=4, help="tree depth")
    ap.add_argument("--n-features", type=int, default=1000)
    ap.add_argument("--max-descriptors", type=int, default=200_000,
                    help="subsample the pooled corpus to this many "
                         "descriptors before clustering. Scale with the "
                         "tree: a k=10 L=5 (100k-word) vocabulary needs "
                         "several descriptors per leaf to be non-degenerate")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (offline artifact "
                         "creation does not need the accelerator)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from orb_slam_tracking_tpu.bow import (
        build_vocabulary_from_frames,
        save_vocabulary,
    )
    from orb_slam_tracking_tpu.config import OrbConfig

    frames = []
    if args.images:
        from orb_slam_tracking_tpu.io.images import load_gray

        names = sorted(os.listdir(args.images))
        for n in names:
            if n.lower().endswith((".png", ".jpg", ".jpeg", ".pgm")):
                frames.append(load_gray(os.path.join(args.images, n)))
        if not frames:
            print(f"no images found in {args.images}", file=sys.stderr)
            return 1
    elif args.synthetic:
        from orb_slam_tracking_tpu.config import CameraConfig
        from orb_slam_tracking_tpu.utils.synthetic import (
            CornerField,
            make_trajectory,
            render_frame,
        )

        rng = np.random.default_rng(args.seed)
        cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                           width=640, height=480)
        # many independent scenes x varied trajectories for descriptor
        # diversity (the reference's pretrained ORBvoc is built from a
        # large heterogeneous image corpus; this is the no-network
        # equivalent: every scene is a fresh world, and the camera motion
        # cycles through the trajectory families so viewpoint/scale
        # variation enters the corpus too)
        per_scene = 8
        n_scenes = max(1, args.synthetic // per_scene)
        modes = ("strafe", "loop", "forward", "rotation")
        # appearance families (CornerField style, round 5): corpora drawn
        # from one texture family cluster too narrowly — cycle four
        # procedural families so the vocabulary sees edge-, checker- and
        # speckle-statistics alongside the blob constellations
        styles = ("blobs", "edges", "checker", "speckle")
        for s in range(n_scenes):
            field = CornerField(
                rng, n=int(rng.integers(400, 900)),
                x=(-6.0, 6.0), y=(-3.5, 3.5),
                z=(float(rng.uniform(2.5, 4.0)), float(rng.uniform(8.0, 12.0))),
                style=styles[int(rng.integers(0, len(styles)))])
            traj = make_trajectory(per_scene * 4, modes[s % len(modes)])
            for R, t in traj[:: 4]:
                frames.append(render_frame(field, cam, R, t))
    else:
        print("pass --images DIR or --synthetic N", file=sys.stderr)
        return 1

    ocfg = OrbConfig(n_features=args.n_features)
    voc = build_vocabulary_from_frames(
        frames, ocfg, k=args.k, depth=args.depth, seed=args.seed,
        max_descriptors=args.max_descriptors,
    )
    save_vocabulary(voc, args.out)
    print(f"trained (k={args.k}, L={args.depth}) vocabulary "
          f"({voc.n_words} words) from {len(frames)} frames -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
