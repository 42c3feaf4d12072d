"""Static tables for ORB: the BRIEF-256 sampling pattern and the
intensity-centroid disc bounds.

The 256 point-pair pattern is the public Willow-Garage/OpenCV learned
pattern (carried by the reference as ``bit_pattern_31_``,
``Features/ORBextractor.cpp:233-490``), stored here as binary data
(``_brief_pattern.npy``, int32 [256, 4] = x1,y1,x2,y2).

The disc bound table ``umax`` replicates the reference ctor's computation
(``ORBextractor.cpp:562-594``): for each |v| <= 15, the maximum |u| such
that (u, v) lies in the radius-15 circular patch, built with the same
round-half-even midpoint split and the symmetry fix-up.
"""

from __future__ import annotations

import functools
import os

import numpy as np

HALF_PATCH_SIZE = 15
PATCH_SIZE = 31
EDGE_THRESHOLD = 19  # ORBextractor.cpp:90

_PATTERN_PATH = os.path.join(os.path.dirname(__file__), "_brief_pattern.npy")


@functools.lru_cache(maxsize=1)
def brief_pattern() -> np.ndarray:
    """[256, 4] int32: (x1, y1, x2, y2) sample offsets, |coord| <= 13."""
    pat = np.load(_PATTERN_PATH)
    assert pat.shape == (256, 4) and pat.dtype == np.int32
    return pat


@functools.lru_cache(maxsize=1)
def umax_table() -> np.ndarray:
    """[HALF_PATCH_SIZE + 1] int32: max |u| per |v| for the r=15 disc.

    Same construction as the reference ctor: the lower half via rounding
    sqrt(r^2 - v^2), the upper half mirrored to keep the disc symmetric.
    """
    r = HALF_PATCH_SIZE
    umax = np.zeros(r + 1, dtype=np.int32)
    vmax = int(np.floor(r * np.sqrt(2.0) / 2 + 1))
    vmin = int(np.ceil(r * np.sqrt(2.0) / 2))
    hp2 = float(r * r)
    for v in range(vmax + 1):
        # cvRound == round-half-even == np.rint
        umax[v] = int(np.rint(np.sqrt(hp2 - v * v)))
    # mirror for symmetry
    v0 = 0
    for v in range(r, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax


@functools.lru_cache(maxsize=1)
def disc_mask() -> np.ndarray:
    """[31, 31] bool mask of the r=15 intensity-centroid disc
    (row = y offset + 15, col = x offset + 15)."""
    umax = umax_table()
    m = np.zeros((PATCH_SIZE, PATCH_SIZE), dtype=bool)
    for dy in range(-HALF_PATCH_SIZE, HALF_PATCH_SIZE + 1):
        u = umax[abs(dy)]
        m[dy + HALF_PATCH_SIZE, HALF_PATCH_SIZE - u : HALF_PATCH_SIZE + u + 1] = True
    return m


@functools.lru_cache(maxsize=1)
def moment_kernels() -> tuple:
    """(kx, ky): [31, 31] float32 kernels s.t. conv(img, kx) at a pixel is
    the disc moment m10 and conv(img, ky) is m01 — the dense-map equivalent
    of the reference's per-keypoint IC_Angle loop (ORBextractor.cpp:103-159).
    """
    m = disc_mask().astype(np.float32)
    xs = np.arange(-HALF_PATCH_SIZE, HALF_PATCH_SIZE + 1, dtype=np.float32)
    kx = m * xs[None, :]
    ky = m * xs[:, None]
    return kx, ky
