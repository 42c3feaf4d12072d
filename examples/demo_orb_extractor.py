#!/usr/bin/env python
"""ORB extraction smoke demo.

CLI equivalent of the reference's ``demo_ORBextractor``
(``demo/demo_ORBextractor.cpp:15-65``): extract with the 1250-feature
operating point, print the per-level budget, totals, and descriptor shape.

Usage: python examples/demo_orb_extractor.py IMAGE [--features N] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image")
    ap.add_argument("--features", type=int, default=1250)
    ap.add_argument("--levels", type=int, default=8)
    ap.add_argument("--scale", type=float, default=1.2)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from orb_slam_tracking_tpu.config import OrbConfig
    from orb_slam_tracking_tpu.io import load_gray
    from orb_slam_tracking_tpu.ops import orb_extract

    img = load_gray(args.image)
    print(f"image: {args.image} {img.shape[1]}x{img.shape[0]}")
    cfg = OrbConfig(
        n_features=args.features, n_levels=args.levels, scale_factor=args.scale
    )
    budgets = cfg.features_per_level()
    print("Number of features per level:", " ".join(map(str, budgets)))
    print("Sum of features in all levels:", sum(budgets))

    t0 = time.time()
    kps = orb_extract(jnp.asarray(img), cfg)
    kps.xy.block_until_ready()
    t_compile = time.time() - t0
    t0 = time.time()
    kps = orb_extract(jnp.asarray(img), cfg)
    kps.xy.block_until_ready()
    t_run = time.time() - t0

    v = np.asarray(kps.valid)
    n = int(v.sum())
    print("Feature extraction successful!" if n > 0 else "Feature extraction failed!")
    print("Total number of features:", n)
    per_level = [int(((np.asarray(kps.octave) == l) & v).sum()) for l in range(args.levels)]
    print("Extracted per level:      ", " ".join(map(str, per_level)))
    d = np.asarray(kps.desc)
    print(f"Descriptor shape: [{d.shape[0]}, {d.shape[1]}] uint32 (= 256 bits/kp)")
    print(f"timing: first call {t_compile:.2f}s (includes compile), steady-state {t_run*1000:.1f}ms")
    return 0 if n > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
