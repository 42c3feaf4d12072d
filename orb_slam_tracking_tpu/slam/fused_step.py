"""The WORKING-state tracking step as ONE jitted device program.

The host-orchestrated ``Tracker`` is correct but dispatch-bound through
a high-latency device link: per frame it issues many small device calls
(extract, two matches, two pose optimizations) with host branches in
between. This module fuses the steady-state path —

    extract -> project map under the predicted pose -> match ->
    pose-only LM -> tight re-match from the refined pose -> LM again

— into a single XLA program (the two-stage match-optimize structure of
``Tracker._track_working``, which itself completes the reference's
declared WORKING state: ``tracking.cpp:71-76``, ``tracking.hpp:110-111``
mVelocity / ``Settings.yaml:42-43`` UseMotionModel). The constant-
velocity prediction and the keyframe decision stay host-side (they
mutate host map state); everything per-frame-hot is device-side.

``parallel/multiseq.py`` wraps the same per-frame function under vmap +
shard_map for multi-sequence data parallelism.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CameraConfig, MatcherConfig, OrbConfig, TrackerConfig
from ..geometry import camera
from ..ops.extractor import orb_extract
from ..ops.proj_matcher import search_by_projection
from ..optim.pose_opt import optimize_pose
from ..types import Keypoints

__all__ = ["FusedStepResult", "make_tracking_step"]


class FusedStepResult(NamedTuple):
    R: jnp.ndarray            # [3, 3] optimized world-to-camera
    t: jnp.ndarray            # [3]
    n_inliers: jnp.ndarray    # [] int32
    n_matches1: jnp.ndarray   # [] stage-1 projection matches
    n_matches2: jnp.ndarray   # [] stage-2 (tight) matches
    n_kps: jnp.ndarray        # [] extracted keypoints
    kp_for_point: jnp.ndarray  # [P] final association (keyframe logic)
    inlier: jnp.ndarray       # [P] final pose-opt inlier mask
    visible: jnp.ndarray      # [P] frustum visibility (lifecycle tallies)
    kps: Keypoints            # the extracted keypoints (keyframe snapshot)
    xy_un: jnp.ndarray        # [N, 2] undistorted keypoint pixels


def make_tracking_step(
    cam_cfg: CameraConfig,
    orb_cfg: OrbConfig,
    matcher_cfg: MatcherConfig,
    tracker_cfg: TrackerConfig,
    radius_scale: float = 1.0,
    batched_solve: bool = False,
):
    """Build the jitted fused step.

    Returned signature:
      step(image [H,W], map_pts [P,3], map_desc [P,8], map_valid [P],
           map_normal [P,3], map_dmin [P], map_dmax [P],
           R_pred [3,3], t_pred [3], R0 [3,3], t0 [3], K [3,3])
      -> FusedStepResult
    ``R_pred/t_pred`` centre the stage-1 search window (constant-velocity
    prediction); ``R0/t0`` seed the optimizer (the last optimized pose —
    see the rationale in Tracker._track_working). ``radius_scale``
    widens the stage-1 window (the host's low-match retry builds a 2x
    variant). ``map_normal/map_dmin/map_dmax`` are the per-point viewing
    statistics driving the isInFrustum gates (zeros disable them
    per-point — see search_by_projection). Builders that vmap the
    returned step over a sequence batch must pass ``batched_solve=True``
    so the pose-LM 6x6 solve keeps the closed form under vmap.
    """
    radius = tracker_cfg.projection_radius * radius_scale
    tight = tracker_cfg.local_map_radius
    scale = orb_cfg.scale_factor
    width, height = cam_cfg.width, cam_cfg.height
    n_levels = orb_cfg.n_levels

    @jax.jit
    def step(image, map_pts, map_desc, map_valid,
             map_normal, map_dmin, map_dmax,
             R_pred, t_pred, R0, t0, K):
        kps = orb_extract(image, orb_cfg)
        xy_un = camera.undistort_pixels(cam_cfg, kps.xy)

        def match(R, t, rad):
            return search_by_projection(
                map_pts, map_desc, map_valid, R, t, K,
                kps.desc, xy_un, kps.valid, rad, matcher_cfg,
                width, height,
                kp_octave=kps.octave, scale_factor=scale,
                pt_normal=map_normal, pt_dmin=map_dmin, pt_dmax=map_dmax,
                n_levels=n_levels,
            )

        def optimize(R, t, pm):
            kp_idx = pm.kp_for_point
            matched = kp_idx >= 0
            safe = jnp.clip(kp_idx, 0)
            uv_obs = xy_un[safe]
            inv_s2 = 1.0 / scale ** (
                2.0 * kps.octave[safe].astype(jnp.float32)
            )
            return optimize_pose(
                R, t, map_pts, uv_obs, inv_s2, matched, K,
                rounds=tracker_cfg.pose_opt_rounds,
                iters_per_round=tracker_cfg.pose_opt_iters,
                batched_solve=batched_solve,
            )

        pm1 = match(R_pred, t_pred, radius)
        res1 = optimize(R0, t0, pm1)
        pm2 = match(res1.R, res1.t, tight)
        res2 = optimize(res1.R, res1.t, pm2)
        return FusedStepResult(
            R=res2.R,
            t=res2.t,
            n_inliers=res2.n_inliers,
            n_matches1=pm1.n_matches,
            n_matches2=pm2.n_matches,
            n_kps=kps.count(),
            kp_for_point=pm2.kp_for_point,
            inlier=res2.inlier,
            visible=pm2.visible,
            kps=kps,
            xy_un=xy_un,
        )

    return step
