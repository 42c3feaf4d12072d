"""Projection-guided map-point -> keypoint matching (motion-model tracking).

TPU-native equivalent of ORB-SLAM's ``SearchByProjection`` — the matcher
the reference *declares* for its constant-velocity ``WORKING`` state
(``tracking.hpp:110-111`` mVelocity "used for TrackWithMotionModel";
``Settings.yaml:42-43`` UseMotionModel) but never implemented. Map points
are projected with the predicted pose; each valid projection searches
keypoints inside a radius window via the same MXU Hamming matmul as the
init matcher, keeping the best keypoint under TH_HIGH with mutual
resolution.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Matmul precision for the TRACKING hot path: DEFAULT (bf16), NOT
# pinned. Round 4 pinned these ops to HIGHEST (a 6-pass bf16 emulation
# of f32) citing the BA residual finding (optim/ba.py:_obs_residuals);
# round 5 reproduced the official-bench tracking regression on a quiet
# relay (151.11 fps vs r3's 253.41) and bisected it to exactly these
# pins: ORB_TRACKING_F32=0 measured 251.42 fps on the same relay
# session, a 1.66x step-time difference. The pin stays available for
# A/B (ORB_TRACKING_F32=1) but defaults OFF: unlike the BA residual
# path - where default precision measurably stalls convergence at a
# wrong optimum - the pose path never had a measured accuracy problem
# (the r3 clean-loop ATE 0.87 cm / device-loop 0.99 cm were achieved
# at default precision; +-0.5 px observation noise dominates any bf16
# rounding of the projection transform, and the LM reclassification
# absorbs the rest).
import os as _os
_HI = (jax.lax.Precision.HIGHEST
       if _os.environ.get("ORB_TRACKING_F32", "0") == "1"
       else jax.lax.Precision.DEFAULT)

from ..config import MatcherConfig
from .hamming import hamming_matrix

__all__ = ["ProjMatchResult", "search_by_projection"]


class ProjMatchResult(NamedTuple):
    kp_for_point: jnp.ndarray  # [P] int32 keypoint index or -1
    point_for_kp: jnp.ndarray  # [N] int32 map-point index or -1 (inverse)
    uv_proj: jnp.ndarray       # [P, 2] projected pixel of each map point
    n_matches: jnp.ndarray     # [] int32
    n_visible: jnp.ndarray     # [] int32 points projecting inside the image
    visible: jnp.ndarray       # [P] bool per-point frustum visibility
    #                            (feeds MapPoint mnVisible/mnFound tallies)


@partial(jax.jit, static_argnames=("cfg", "width", "height", "n_levels"))
def search_by_projection(
    map_pts: jnp.ndarray,
    map_desc: jnp.ndarray,
    map_valid: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    K: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_xy: jnp.ndarray,
    kp_valid: jnp.ndarray,
    radius: float,
    cfg: MatcherConfig,
    width: int,
    height: int,
    kp_octave: jnp.ndarray | None = None,
    scale_factor: float = 1.2,
    pt_normal: jnp.ndarray | None = None,
    pt_dmin: jnp.ndarray | None = None,
    pt_dmax: jnp.ndarray | None = None,
    n_levels: int = 8,
) -> ProjMatchResult:
    """Match map points to current-frame keypoints around their projections.

    map_pts: [P, 3] world points; R, t: predicted world-to-camera pose;
    kp_xy: [N, 2] undistorted keypoint pixels; radius: base search window
    in px — scaled by the keypoint's octave scale when ``kp_octave`` is
    given (ORB-SLAM's ``th * mvScaleFactors[octave]`` windowing).

    When per-point viewing statistics are given (``pt_normal`` [P,3] mean
    viewing direction, ``pt_dmin``/``pt_dmax`` [P] scale-invariance
    distance envelope — MapPoint mNormalVector/mfMinDistance/mfMaxDistance,
    maintained by ``slam.map.update_normal_and_depth``), the full
    ``Frame::isInFrustum`` gates apply per point:

    - distance inside [0.8 dmin, 1.2 dmax];
    - viewing ray within 60 deg of the normal (cos > 0.5);
    - octave predicted from distance (``MapPoint::PredictScale``:
      ceil(log(dmax/dist)/log(s))), keypoints restricted to
      [pred-1, pred+1] and the window scaled by s^pred.

    Points with ``dmax == 0`` (no viewing info yet) skip these gates, so
    freshly created points remain matchable.
    """
    P = map_pts.shape[0]
    N = kp_desc.shape[0]
    pc = jnp.matmul(map_pts, R.T, precision=_HI) + t
    z = pc[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K[0, 0] * pc[..., 0] * zi + K[0, 2]
    v = K[1, 1] * pc[..., 1] * zi + K[1, 2]
    uv = jnp.stack([u, v], axis=-1)

    in_front = z > 0.1
    in_image = (u >= 0) & (u < width) & (v >= 0) & (v < height)
    visible = map_valid & in_front & in_image

    octave_gate = None
    r_pt = None
    if pt_normal is not None:
        # camera centre in world coords; viewing ray per point
        C = -jnp.matmul(R.T, t, precision=_HI)
        view = map_pts - C[None, :]
        dist = jnp.linalg.norm(view, axis=-1)
        has = pt_dmax > 0
        dist_ok = (dist >= 0.8 * pt_dmin) & (dist <= 1.2 * pt_dmax)
        cos_view = jnp.sum(view * pt_normal, axis=-1) / jnp.maximum(
            dist, 1e-9
        )
        angle_ok = cos_view > 0.5
        visible = visible & (~has | (dist_ok & angle_ok))
        # predicted octave at this distance (PredictScale)
        ratio = jnp.maximum(pt_dmax, 1e-9) / jnp.maximum(dist, 1e-9)
        pred = jnp.ceil(
            jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(scale_factor)
        ).astype(jnp.int32)
        pred = jnp.clip(pred, 0, n_levels - 1)
        r_pt = jnp.where(
            has, radius * scale_factor ** pred.astype(jnp.float32), 0.0
        )
        if kp_octave is not None:
            ko = kp_octave.astype(jnp.int32)
            octave_gate = (
                ~has[:, None]
                | ((ko[None, :] >= pred[:, None] - 1)
                   & (ko[None, :] <= pred[:, None] + 1))
            )

    D = hamming_matrix(map_desc, kp_desc)  # [P, N]
    dx = jnp.abs(uv[:, 0:1] - kp_xy[None, :, 0])
    dy = jnp.abs(uv[:, 1:2] - kp_xy[None, :, 1])
    if kp_octave is not None:
        r_eff = radius * scale_factor ** kp_octave.astype(jnp.float32)  # [N]
        r_eff = r_eff[None, :]
    else:
        r_eff = radius
    if r_pt is not None:
        # distance-predicted window where viewing info exists, keypoint-
        # octave window otherwise
        r_eff = jnp.where((pt_dmax > 0)[:, None], r_pt[:, None],
                          jnp.broadcast_to(r_eff, (P, N)))
    eligible = (
        visible[:, None] & kp_valid[None, :] & (dx <= r_eff) & (dy <= r_eff)
    )
    if octave_gate is not None:
        eligible = eligible & octave_gate
    big = jnp.int32(1 << 20)
    Dm = jnp.where(eligible, D, big)

    best = jnp.min(Dm, axis=1)
    best_j = jnp.argmin(Dm, axis=1)
    accept = (best <= cfg.th_high) & visible

    # mutual: one map point per keypoint (closest wins, index tiebreak)
    sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
    rows = jnp.arange(P, dtype=jnp.int32)
    key = jnp.where(accept, best * jnp.int32(P) + rows, sentinel)
    min_key = jnp.full((N,), sentinel, dtype=jnp.int32).at[best_j].min(key)
    keep = accept & (key == min_key[best_j])

    kp_for_point = jnp.where(keep, best_j.astype(jnp.int32), -1)
    point_for_kp = jnp.full((N,), -1, dtype=jnp.int32)
    point_for_kp = point_for_kp.at[jnp.where(keep, best_j, N)].set(
        rows, mode="drop"
    )
    return ProjMatchResult(
        kp_for_point=kp_for_point,
        point_for_kp=point_for_kp,
        uv_proj=uv,
        n_matches=jnp.sum(keep.astype(jnp.int32)),
        n_visible=jnp.sum(visible.astype(jnp.int32)),
        visible=visible,
    )
