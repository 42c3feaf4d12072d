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

from .pattern import EDGE_THRESHOLD, HALF_PATCH_SIZE, moment_kernels, umax_table

__all__ = ["moment_maps", "angles_at"]


def moment_maps(padded: jnp.ndarray, pad: int = EDGE_THRESHOLD) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense disc moments for every interior pixel of a padded level image.

    Returns (m10, m01), each [H, W] aligned with level coordinates. The
    apron (>= HALF_PATCH_SIZE) supplies the reflected out-of-bounds pixels
    the reference reads through its hidden cv::Mat border.

    Algorithm: the naive disc kernel is 961 taps/pixel and lowers terribly
    as a single-channel conv. The disc is separable into incremental
    half-width sums — with ``u(dy) = umax[|dy|]`` the disc half-width per
    row offset,

        T_u(i, x) = sum_{|dx|<=u} dx * I(i, x+dx)   (x-weighted row sum)
        U_u(i, x) = sum_{|dx|<=u} I(i, x+dx)        (box row sum)
        m10(y, x) = sum_dy T_{u(|dy|)}(y+dy, x)
        m01(y, x) = sum_dy dy * U_{u(|dy|)}(y+dy, x)

    and T_u/U_u build incrementally over the ~10 distinct half-widths
    (T_u = T_u' + sum_{u'<dx<=u} dx*(I_{+dx} - I_{-dx}), similarly U), so
    the whole computation is ~95 shifted elementwise adds — pure VPU work
    that XLA fuses, with no conv lowering involved.
    """
    r = HALF_PATCH_SIZE
    umax = umax_table()
    crop = pad - r
    A = padded[crop: padded.shape[0] - crop, crop: padded.shape[1] - crop]
    h = A.shape[0] - 2 * r
    w = A.shape[1] - 2 * r

    def col(dx):
        # A column slice aligned to output x: I(i - r, x + dx)
        return A[:, r + dx: r + dx + w]

    distinct = sorted(set(int(u) for u in umax))
    T: dict = {}
    U: dict = {}
    t_acc = jnp.zeros_like(col(0))
    u_acc = col(0)
    prev = 0
    for u in distinct:
        for dx in range(prev + 1, u + 1):
            plus = col(dx)
            minus = col(-dx)
            t_acc = t_acc + dx * (plus - minus)
            u_acc = u_acc + plus + minus
        T[u] = t_acc
        U[u] = u_acc
        prev = u

    m10 = jnp.zeros((h, w), A.dtype)
    m01 = jnp.zeros((h, w), A.dtype)
    for dy in range(-r, r + 1):
        u = int(umax[abs(dy)])
        rowT = T[u][r + dy: r + dy + h, :]
        m10 = m10 + rowT
        if dy != 0:
            rowU = U[u][r + dy: r + dy + h, :]
            m01 = m01 + dy * rowU
    return m10, m01


def angles_at(m10: jnp.ndarray, m01: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Gather orientation (degrees, [0, 360)) at integer keypoint coords
    ``xy [N, 2]`` (level-local x, y)."""
    xi = xy[..., 0].astype(jnp.int32)
    yi = xy[..., 1].astype(jnp.int32)
    g10 = m10[yi, xi]
    g01 = m01[yi, xi]
    ang = jnp.degrees(jnp.arctan2(g01, g10))
    return jnp.where(ang < 0, ang + 360.0, ang)
