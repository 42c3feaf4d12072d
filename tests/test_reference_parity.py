"""Cross-implementation parity against the reference C++ extractor.

A dump of the reference ``ORBextractor`` output (keypoints + descriptors,
produced by compiling the reference source at /root/reference — see
BASELINE.md for the harness) is compared against this framework's output
on the same image: descriptors at spatially-coincident corners must be
near-bit-identical (the rBRIEF pattern, rotation handling and blur all
agree), and IC angles must match. Keypoint SETS differ by design — the
quadtree is replaced by grid selection (SURVEY.md §7.3) — so parity is
measured on the intersection.
"""

import os
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

REF_IMG = "/root/reference/demo/initImages/frame_01425127694_0544666611.png"
DUMP = "/tmp/ref_kps.txt"

_DUMP_SRC = r"""
#include <cstdio>
#include <opencv2/opencv.hpp>
#include "Features/ORBextractor.hpp"
using namespace ORB_SLAM_Tracking;
int main(int argc, char** argv) {
  cv::Mat img = cv::imread(argv[1], cv::IMREAD_GRAYSCALE);
  ORBextractor ext(2000, 1.2f, 8, 20, 7);
  std::vector<cv::KeyPoint> kps; cv::Mat desc; std::vector<int> lap{0,0};
  ext(img, cv::Mat(), kps, desc, lap);
  FILE* f = std::fopen(argv[2], "w");
  for (size_t i = 0; i < kps.size(); ++i) {
    std::fprintf(f, "%.3f %.3f %d %.3f", kps[i].pt.x, kps[i].pt.y,
                 kps[i].octave, kps[i].angle);
    for (int j = 0; j < 32; ++j) std::fprintf(f, " %u", desc.at<uchar>(i, j));
    std::fprintf(f, "\n");
  }
  std::fclose(f);
  return 0;
}
"""


def _ensure_dump():
    if os.path.exists(DUMP) and os.path.getsize(DUMP) > 0:
        return True
    if not os.path.exists("/root/reference/Features/ORBextractor.cpp"):
        return False
    try:
        flags = subprocess.run(
            ["pkg-config", "--cflags", "--libs", "opencv4"],
            capture_output=True, text=True, check=True,
        ).stdout.split()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    os.makedirs("/tmp/refparity", exist_ok=True)
    src = "/tmp/refparity/dump.cpp"
    with open(src, "w") as f:
        f.write(_DUMP_SRC)
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++20", src,
             "/root/reference/Features/ORBextractor.cpp",
             "-I/root/reference", *flags, "-o", "/tmp/refparity/dump"],
            check=True, capture_output=True,
        )
        subprocess.run(["/tmp/refparity/dump", REF_IMG, DUMP], check=True,
                       capture_output=True)
    except subprocess.CalledProcessError:
        return False
    return os.path.exists(DUMP)


@pytest.mark.skipif(not os.path.exists(REF_IMG), reason="no reference data")
def test_descriptor_bit_compatibility_with_reference():
    if not _ensure_dump():
        pytest.skip("reference extractor dump unavailable (no toolchain)")
    from orb_slam_tracking_tpu.config import OrbConfig
    from orb_slam_tracking_tpu.io import load_gray
    from orb_slam_tracking_tpu.ops import orb_extract

    rows = [l.split() for l in open(DUMP)]
    ref_xy = np.array([[float(r[0]), float(r[1])] for r in rows], np.float32)
    ref_oct = np.array([int(r[2]) for r in rows])
    ref_ang = np.array([float(r[3]) for r in rows], np.float32)
    ref_desc = np.array(
        [[int(v) for v in r[4:36]] for r in rows], np.uint8
    ).view(np.uint32)

    img = load_gray(REF_IMG)
    kps = orb_extract(jnp.asarray(img), OrbConfig(n_features=2000, max_keypoints=2048))
    v = np.asarray(kps.valid)
    our_xy = np.asarray(kps.xy)[v]
    our_desc = np.asarray(kps.desc)[v]
    our_oct = np.asarray(kps.octave)[v]
    our_ang = np.asarray(kps.angle_deg)[v]

    m0 = ref_oct == 0
    o0 = our_oct == 0
    # nearest-neighbour association at octave 0 (both in level-0 pixels)
    d = np.linalg.norm(
        ref_xy[m0][:, None, :] - our_xy[o0][None, :, :], axis=-1
    )
    idx = d.argmin(1)
    close = d.min(1) <= 2.0
    # selection strategies differ (grid vs quadtree): expect substantial
    # but not full overlap
    assert close.mean() > 0.4

    rd = ref_desc[m0][close]
    od = our_desc[o0][idx[close]]
    ham = np.unpackbits((rd ^ od).view(np.uint8), axis=1).sum(1)
    # near-bit-identical descriptors at coincident corners (random pairs
    # sit at ~128); measured median is 7/256
    assert np.median(ham) <= 16, f"median cross-Hamming {np.median(ham)}"

    da = np.abs(((ref_ang[m0][close] - our_ang[o0][idx[close]]) + 180) % 360 - 180)
    assert np.median(da) < 1.0  # IC angles agree
