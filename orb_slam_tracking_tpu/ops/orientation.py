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
    """
    kx_np, ky_np = moment_kernels()
    kx = jnp.asarray(kx_np)
    ky = jnp.asarray(ky_np)
    r = HALF_PATCH_SIZE
    # crop the apron down to exactly r so a VALID conv lands on level coords
    crop = pad - r
    x = padded[crop : padded.shape[0] - crop, crop : padded.shape[1] - crop]
    x = x[None, None]
    k = jnp.stack([kx, ky])[:, None]  # [2, 1, 31, 31]
    out = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID")  # [1, 2, H, W]
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
