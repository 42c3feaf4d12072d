"""Harris corner response as a dense array program.

The reference declares a ``scoreType`` config axis (Harris=0 / FAST=1,
``Features/ORBextractor.hpp:57``, ``Config/Settings.hpp:77-90,124``) with
OpenCV-ORB semantics: keypoints are *detected* with FAST, then *ranked*
by the Harris corner measure when retaining the per-level best
(cv::ORB HarrisResponses: blockSize=7, k=0.04, central-difference
derivatives, response normalized by (4*blockSize*255)^-4).

This computes the same response for EVERY pixel of a level at once —
two shifted-difference derivative maps, three 7x7 box sums as separable
shifted adds (the same VPU-friendly decomposition as the blur/moment
stages), and the det - k*trace^2 combination — so ranking a level's FAST
corners by Harris costs a handful of fused elementwise passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pattern import EDGE_THRESHOLD

__all__ = ["harris_response", "HARRIS_BLOCK", "HARRIS_K"]

HARRIS_BLOCK = 7
HARRIS_K = 0.04


def _box_sum(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(2r+1)x(2r+1) box sum with zero padding, separable shifted adds."""
    h, w = x.shape
    xp = jnp.pad(x, ((r, r), (0, 0)))
    acc = xp[0:h]
    for k in range(1, 2 * r + 1):
        acc = acc + xp[k : k + h]
    accp = jnp.pad(acc, ((0, 0), (r, r)))
    out = accp[:, 0:w]
    for k in range(1, 2 * r + 1):
        out = out + accp[:, k : k + w]
    return out


def harris_response(padded: jnp.ndarray,
                    pad: int = EDGE_THRESHOLD) -> jnp.ndarray:
    """Harris response for every interior pixel of a padded level image.

    ``padded``: [H+2p, W+2p] float32 (>=1 px apron needed). Returns
    [H, W] float32 in roughly [-0.13, 0.13] at 8-bit image range (the
    OpenCV normalization), so ``response + 1`` is strictly positive.
    """
    h = padded.shape[0] - 2 * pad
    w = padded.shape[1] - 2 * pad

    def sl(dy, dx):
        return jax.lax.dynamic_slice(padded, (pad + dy, pad + dx), (h, w))

    ix = sl(0, 1) - sl(0, -1)
    iy = sl(1, 0) - sl(-1, 0)
    r = HARRIS_BLOCK // 2
    a = _box_sum(ix * ix, r)
    b = _box_sum(iy * iy, r)
    c = _box_sum(ix * iy, r)
    scale = 1.0 / (4.0 * HARRIS_BLOCK * 255.0)
    s4 = scale * scale * scale * scale
    return (a * b - c * c - HARRIS_K * (a + b) * (a + b)) * s4
