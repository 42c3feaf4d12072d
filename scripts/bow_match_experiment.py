"""Measure SearchByBoW (node-restricted) vs global ratio-test matching
on two noisy observations of the same synthetic scene.

The loop-closing Sim(3) stage seeds from descriptor matches between the
revisit keyframe pair; on self-similar textures the global ratio test
starves it (2-7 seeds out of ~400 keypoints on the circuit evals). This
quantifies the fix: circuit-world frames rendered twice with independent
sensor noise (same viewpoint and a shifted one), matched both ways.

Usage: python scripts/bow_match_experiment.py [--noise 15]
"""

import argparse
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orb_slam_tracking_tpu.bow.vocabulary import (  # noqa: E402
    direct_index_nodes, load_vocabulary, transform,
)
from orb_slam_tracking_tpu.config import CameraConfig, OrbConfig  # noqa: E402
from orb_slam_tracking_tpu.ops.extractor import orb_extract  # noqa: E402
from orb_slam_tracking_tpu.ops.matcher import (  # noqa: E402
    match_descriptors, match_descriptors_bow,
)
from orb_slam_tracking_tpu.utils.synthetic import (  # noqa: E402
    CornerField, make_trajectory, render_frame, ring_points,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--noise", type=float, default=15.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                       width=640, height=480, fps=30.0)
    field = CornerField(rng, pts=ring_points(rng, n=2400))
    poses = make_trajectory(300, "circuit")

    ocfg = OrbConfig(n_features=1000)
    import orb_slam_tracking_tpu as _pkg
    voc = load_vocabulary(os.path.join(
        os.path.dirname(os.path.abspath(_pkg.__file__)),
        "data", "orbvoc_synth_k10_L4.npz"))

    def obs(R, t):
        img = render_frame(field, cam, R, t).astype(np.float64)
        img = np.clip(img + rng.normal(0, args.noise, img.shape), 0, 255)
        return orb_extract(jnp.asarray(img, jnp.float32), ocfg)

    # frame 0 vs itself (renoised) and vs the nearby revisit frame
    pairs = [("same frame, independent noise", poses[0], poses[0]),
             ("frame 0 vs frame 295 (revisit)", poses[0], poses[295]),
             ("frame 0 vs frame 10", poses[0], poses[10])]
    for name, (Ra, ta), (Rb, tb) in pairs:
        k1, k2 = obs(Ra, ta), obs(Rb, tb)
        m_glob = np.asarray(match_descriptors(
            k1.desc, k1.valid, k2.desc, k2.valid))
        w1, _ = transform(voc, k1.desc, k1.valid)
        w2, _ = transform(voc, k2.desc, k2.valid)
        m_bow = np.asarray(match_descriptors_bow(
            k1.desc, k1.valid, direct_index_nodes(voc, w1),
            k2.desc, k2.valid, direct_index_nodes(voc, w2)))
        n1 = int(np.asarray(k1.valid).sum())
        n2 = int(np.asarray(k2.valid).sum())
        print(f"{name}: kps {n1}/{n2}  global={int((m_glob >= 0).sum())}  "
              f"searchbybow={int((m_bow >= 0).sum())}", flush=True)


if __name__ == "__main__":
    main()
