"""Intensity-centroid keypoint orientation.

TPU-native replacement for the reference's per-keypoint ``IC_Angle`` loop
(``Features/ORBextractor.cpp:103-159``): the disc moments

    m10 = sum_{(u,v) in disc} u * I(x+u, y+v)
    m01 = sum_{(u,v) in disc} v * I(x+u, y+v)

are computed as two *dense* 31x31 convolutions over the whole level image —
a conv maps straight onto the TPU conv/MXU path, whereas the reference's
per-keypoint patch walk would be a scalar gather loop. The per-keypoint
angle is then two gathers into the moment maps.

Angles are in degrees [0, 360), like ``cv::fastAtan2`` — the matcher's
rotation histogram consumes degrees (``ORBmatcher.cpp:108-116``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pattern import EDGE_THRESHOLD, HALF_PATCH_SIZE, moment_kernels

__all__ = ["moment_maps", "angles_at"]


def moment_maps(padded: jnp.ndarray, pad: int = EDGE_THRESHOLD) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense disc moments for every interior pixel of a padded level image.

    Returns (m10, m01), each [H, W] aligned with level coordinates. The
    apron (>= HALF_PATCH_SIZE) supplies the reflected out-of-bounds pixels
    the reference reads through its hidden cv::Mat border.

    Layout note: a single-channel 31x31 spatial conv lowers onto the TPU
    with no MXU utilization (measured ~50 ms for all levels). Instead the
    31 row offsets become input CHANNELS — 31 shifted views of the image —
    and the 2D kernel becomes a (1, 31)-window conv with in_channels=31,
    out_channels=2 (m10, m01): a 961-MAC contraction per pixel that rides
    the matrix unit.
    """
    kx_np, ky_np = moment_kernels()
    r = HALF_PATCH_SIZE
    # crop the apron down to exactly r so a VALID conv lands on level coords
    crop = pad - r
    x = padded[crop: padded.shape[0] - crop, crop: padded.shape[1] - crop]
    h = x.shape[0] - 2 * r
    # [1, 31, H, W + 2r]: channel c = rows shifted by dy = c - r
    rows = jnp.stack(
        [x[c: c + h, :] for c in range(2 * r + 1)], axis=0
    )[None]
    # kernel [out=2, in=31, 1, 31]: out 0 -> kx rows, out 1 -> ky rows
    k = jnp.stack([kx_np, ky_np]).astype(padded.dtype)[:, :, None, :]
    out = jax.lax.conv_general_dilated(
        rows, jnp.asarray(k), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )  # [1, 2, H, W]
    return out[0, 0], out[0, 1]


def angles_at(m10: jnp.ndarray, m01: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Gather orientation (degrees, [0, 360)) at integer keypoint coords
    ``xy [N, 2]`` (level-local x, y)."""
    xi = xy[..., 0].astype(jnp.int32)
    yi = xy[..., 1].astype(jnp.int32)
    g10 = m10[yi, xi]
    g01 = m01[yi, xi]
    ang = jnp.degrees(jnp.arctan2(g01, g10))
    return jnp.where(ang < 0, ang + 360.0, ang)
