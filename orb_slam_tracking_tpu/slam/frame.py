"""Frame construction and area queries — the functional `Frame` API.

Parity surface for the reference's ``Frame`` class
(``SlamTypes/Frame.{hpp,cpp}``): construction runs extraction +
undistortion + id assignment (``Frame.cpp:40-82``); ``features_in_area``
replaces ``GetFeaturesInArea``'s 64x48 grid lookup (``Frame.cpp:163-206``)
with a dense mask over the fixed keypoint arrays — on TPU a masked
comparison over all keypoints is cheaper than indirection through grid
cells, and it is exactly what the matchers do internally.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import CameraConfig, OrbConfig
from ..geometry import camera
from ..ops.extractor import orb_extract
from ..types import Frame, Keypoints

__all__ = ["make_frame", "features_in_area"]


def make_frame(image: jnp.ndarray, frame_id, timestamp,
               orb_cfg: OrbConfig, cam: CameraConfig) -> Frame:
    """Extract keypoints, undistort, and package a Frame pytree."""
    kps = orb_extract(jnp.asarray(image, jnp.float32), orb_cfg)
    xy_un = camera.undistort_pixels(cam, kps.xy)
    return Frame(
        frame_id=jnp.asarray(frame_id, jnp.int32),
        timestamp=jnp.asarray(timestamp, jnp.float32),
        kps=kps,
        xy_un=xy_un,
        R_cw=jnp.eye(3),
        t_cw=jnp.zeros(3),
    )


@jax.jit
def features_in_area(kps: Keypoints, xy_un: jnp.ndarray, x, y, r,
                     min_level=-1, max_level=-1) -> jnp.ndarray:
    """Boolean mask of keypoints within the square window of radius ``r``
    around (x, y), optionally restricted to an octave range — the
    semantics of ``Frame::GetFeaturesInArea`` (negative level bounds mean
    unrestricted, matching the reference's defaults)."""
    dx = jnp.abs(xy_un[:, 0] - x)
    dy = jnp.abs(xy_un[:, 1] - y)
    m = kps.valid & (dx < r) & (dy < r)
    m = m & jnp.where(min_level >= 0, kps.octave >= min_level, True)
    m = m & jnp.where(max_level >= 0, kps.octave <= max_level, True)
    return m
