"""Core pytree containers (fixed-capacity, mask-validated).

TPU-native replacements for the reference's dynamically-sized containers:
``std::vector<cv::KeyPoint>`` + ``cv::Mat`` descriptors on ``Frame``
(``SlamTypes/Frame.hpp:20-136``) become a fixed-capacity ``Keypoints``
NamedTuple whose row count is a static shape and whose occupancy is a
boolean mask — the discipline that lets every downstream op compile once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["Keypoints", "Frame"]


class Keypoints(NamedTuple):
    """Extracted ORB keypoints in level-0 pixel coordinates.

    All arrays share the static capacity N = OrbConfig.max_keypoints; rows
    with ``valid == False`` are padding. Equivalent information to the
    reference's ``cv::KeyPoint`` fields pt/response/angle/octave/size
    (populated in ``ORBextractor.cpp:1171-1188,1625-1648``) plus the
    [N, 8]-uint32 packed 256-bit rBRIEF descriptors (vs the reference's
    N x 32 CV_8U matrix).
    """

    xy: jnp.ndarray        # [N, 2] float32, level-0 pixel coords (x, y)
    response: jnp.ndarray  # [N] float32, FAST score
    angle_deg: jnp.ndarray # [N] float32, IC orientation in degrees [0, 360)
    octave: jnp.ndarray    # [N] int32, pyramid level
    size: jnp.ndarray      # [N] float32, PATCH_SIZE * level scale
    desc: jnp.ndarray      # [N, 8] uint32, packed 256-bit descriptor
    valid: jnp.ndarray     # [N] bool

    @property
    def capacity(self) -> int:
        return self.xy.shape[-2]

    def count(self) -> jnp.ndarray:
        """Number of valid keypoints (traced scalar)."""
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


class Frame(NamedTuple):
    """Per-image record: keypoints + undistorted coordinates + pose.

    Functional equivalent of the reference ``Frame``
    (``SlamTypes/Frame.cpp:40-82``): construction = extract, undistort,
    assign id; pose is world-to-camera (Tcw) like ``Frame::SetPose``
    (``Frame.cpp:84-87``). The 64x48 search grid (``Frame.hpp:15-16``) has
    no array analog here — windowed search is done by masked distance in
    the matcher, which is the dense-TPU equivalent of a grid lookup.
    """

    frame_id: jnp.ndarray   # [] int32
    timestamp: jnp.ndarray  # [] float32
    kps: Keypoints          # keypoints, distorted (raw) coords
    xy_un: jnp.ndarray      # [N, 2] float32, undistorted level-0 coords
    R_cw: jnp.ndarray       # [3, 3] world-to-camera rotation
    t_cw: jnp.ndarray       # [3] world-to-camera translation
