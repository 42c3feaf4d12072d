"""Pinhole + Brown distortion camera model (batched, jit-friendly).

Replaces the reference's OpenCV camera calls: ``cv::undistortPoints``
(``SlamTypes/Frame.cpp:119,150``) and the implicit projection model used in
``Initializer::CheckRT`` (``Initialization/Initializer.cpp:676-689``).

Undistortion inverts the Brown model with a fixed-iteration fixed-point
scheme (compile-friendly: static trip count, no data-dependent control flow).
All functions broadcast over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import CameraConfig

__all__ = [
    "intrinsics_matrix",
    "distort_normalized",
    "undistort_normalized",
    "undistort_pixels",
    "project",
    "project_pixels",
    "compute_undistorted_bounds",
]

_UNDISTORT_ITERS = 10


def intrinsics_matrix(cam: CameraConfig, dtype=jnp.float32):
    return jnp.array(
        [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy], [0.0, 0.0, 1.0]],
        dtype=dtype,
    )


def distort_normalized(cam: CameraConfig, xy):
    """Apply Brown radial-tangential distortion to normalized coords
    ``xy: [..., 2]``."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(cam: CameraConfig, xy_dist):
    """Invert the Brown model by fixed-point iteration (the same scheme
    ``cv::undistortPoints`` uses internally, with a static trip count)."""
    x0, y0 = xy_dist[..., 0], xy_dist[..., 1]
    x, y = x0, y0
    for _ in range(_UNDISTORT_ITERS):
        r2 = x * x + y * y
        radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
        dx = 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
        dy = cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
        x = (x0 - dx) / radial
        y = (y0 - dy) / radial
    return jnp.stack([x, y], axis=-1)


def undistort_pixels(cam: CameraConfig, uv):
    """Undistort pixel coords ``[..., 2]`` -> undistorted pixel coords.

    Equivalent of ``Frame::UndistortKeyPoints`` (``Frame.cpp:136-161``):
    pixels -> normalized -> undistort -> re-project with K.
    """
    if not cam.has_distortion:
        return uv
    xn = (uv[..., 0] - cam.cx) / cam.fx
    yn = (uv[..., 1] - cam.cy) / cam.fy
    xy = undistort_normalized(cam, jnp.stack([xn, yn], axis=-1))
    u = xy[..., 0] * cam.fx + cam.cx
    v = xy[..., 1] * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def project(cam: CameraConfig, pts_cam, distort: bool = False):
    """Project camera-frame 3D points ``[..., 3]`` to pixels ``[..., 2]``.

    Returns ``(uv, z)``; callers mask on ``z > 0`` for cheirality
    (``Initializer.cpp:664-670`` semantics).
    """
    z = pts_cam[..., 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xy = pts_cam[..., :2] / zsafe[..., None]
    if distort and cam.has_distortion:
        xy = distort_normalized(cam, xy)
    u = xy[..., 0] * cam.fx + cam.cx
    v = xy[..., 1] * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1), z


def project_pixels(cam: CameraConfig, R, t, pts_world, distort: bool = False):
    """World points through pose (R, t) then the camera. Returns (uv, z)."""
    pts_cam = jnp.einsum("...ij,...nj->...ni", R, pts_world) + t[..., None, :]
    return project(cam, pts_cam, distort=distort)


def compute_undistorted_bounds(cam: CameraConfig):
    """Undistorted image bounds from the four corners, as in
    ``Frame::ComputeImageBounds`` (``Frame.cpp:101-134``).

    Returns (min_x, max_x, min_y, max_y) as python floats (host-side, once
    per camera config).
    """
    import numpy as np

    corners = jnp.array(
        [
            [0.0, 0.0],
            [cam.width, 0.0],
            [0.0, cam.height],
            [cam.width, cam.height],
        ],
        dtype=jnp.float32,
    )
    und = np.asarray(undistort_pixels(cam, corners))
    min_x = float(min(und[0, 0], und[2, 0]))
    max_x = float(max(und[1, 0], und[3, 0]))
    min_y = float(min(und[0, 1], und[1, 1]))
    max_y = float(max(und[2, 1], und[3, 1]))
    return min_x, max_x, min_y, max_y
