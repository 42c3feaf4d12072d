"""Multi-sequence data-parallel tracking over a device mesh.

The reference is strictly single-sequence, single-process; the TPU-native
scaling model (SURVEY.md §2.3) is: many sequences tracked concurrently as
pure data parallelism — the per-frame compute (extraction, projection
matching, pose-only LM) is identical across sequences, so a batch of
sequences shards over the mesh's ``dp`` axis with zero collectives in the
steady state (collectives appear only in the distributed BA,
``ba_sharded.py``).

``make_multiseq_step`` builds one jitted SPMD program: [B, H, W] frames
and per-sequence map slices in, optimized per-sequence poses + match masks
out. B must be a multiple of the mesh size.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MatcherConfig, OrbConfig
from ..ops.extractor import orb_extract
from ..ops.proj_matcher import search_by_projection
from ..optim.pose_opt import optimize_pose

__all__ = [
    "MultiseqResult", "make_multiseq_step", "make_dp_mesh",
    "make_multiseq_sequence_runner",
]


def make_dp_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("dp",))


class MultiseqResult(NamedTuple):
    R: jnp.ndarray          # [B, 3, 3] optimized world-to-camera poses
    t: jnp.ndarray          # [B, 3]
    n_inliers: jnp.ndarray  # [B]
    n_matches: jnp.ndarray  # [B]
    n_kps: jnp.ndarray      # [B]


def make_multiseq_step(
    mesh: Mesh,
    orb_cfg: OrbConfig,
    matcher_cfg: MatcherConfig,
    width: int,
    height: int,
    radius: float = 15.0,
):
    """Build the jitted DP tracking step.

    Returned function signature:
      step(images [B,H,W], map_pts [B,P,3], map_desc [B,P,8],
           map_valid [B,P], R [B,3,3], t [B,3], K [3,3]) -> MultiseqResult
    with every [B, ...] argument sharded over the mesh ``dp`` axis.
    """

    def per_sequence(image, map_pts, map_desc, map_valid, R, t, K):
        kps = orb_extract(image, orb_cfg)
        pm = search_by_projection(
            map_pts, map_desc, map_valid, R, t, K,
            kps.desc, kps.xy, kps.valid, radius, matcher_cfg,
            width, height,
            kp_octave=kps.octave, scale_factor=orb_cfg.scale_factor,
        )
        kp_idx = pm.kp_for_point
        matched = kp_idx >= 0
        uv_obs = kps.xy[jnp.clip(kp_idx, 0)]
        inv_s2 = 1.0 / orb_cfg.scale_factor ** (
            2.0 * kps.octave[jnp.clip(kp_idx, 0)].astype(jnp.float32)
        )
        res = optimize_pose(R, t, map_pts, uv_obs, inv_s2, matched, K)
        return res.R, res.t, res.n_inliers, pm.n_matches, kps.count()

    batched = jax.vmap(per_sequence, in_axes=(0, 0, 0, 0, 0, 0, None))

    dp = P("dp")
    shardings = tuple(
        NamedSharding(mesh, s) for s in (dp, dp, dp, dp, dp, dp, P())
    )
    out_sharding = tuple(NamedSharding(mesh, dp) for _ in range(5))

    @partial(jax.jit, in_shardings=shardings, out_shardings=out_sharding)
    def step(images, map_pts, map_desc, map_valid, R, t, K):
        return batched(images, map_pts, map_desc, map_valid, R, t, K)

    def run(images, map_pts, map_desc, map_valid, R, t, K):
        out = step(images, map_pts, map_desc, map_valid, R, t, K)
        return MultiseqResult(*out)

    return run


def make_multiseq_sequence_runner(
    mesh: Mesh,
    cam_cfg,
    orb_cfg: OrbConfig,
    matcher_cfg: MatcherConfig,
    tracker_cfg,
):
    """WHOLE sequences device-side: one jitted SPMD program that scans a
    [B, T, H, W] frame batch, carrying per-sequence pose + constant-
    velocity state across frames and running the fused two-stage
    tracking step (slam/fused_step.py) per frame — zero host round trips
    inside a sequence. The map is fixed for the run (the data-parallel
    steady-state tracking slice; keyframe/map mutation is host-side
    bookkeeping in the single-sequence Tracker).

    Returned signature:
      run(images [B,T,H,W], map_pts [B,P,3], map_desc [B,P,8],
          map_valid [B,P], R0 [B,3,3], t0 [B,3], K [3,3])
      -> dict of per-frame trajectories: R [B,T,3,3], t [B,T,3],
         n_inliers [B,T], n_matches [B,T]
    """
    from ..slam.fused_step import make_tracking_step

    step = make_tracking_step(cam_cfg, orb_cfg, matcher_cfg, tracker_cfg)

    def per_sequence(images, map_pts, map_desc, map_valid, R0, t0, K):
        # no per-point viewing statistics in the frozen-map DP slice:
        # zeros disable the isInFrustum gates point-wise
        P_ = map_pts.shape[0]
        zn = jnp.zeros((P_, 3), jnp.float32)
        zd = jnp.zeros((P_,), jnp.float32)

        def body(carry, image):
            R, t, vel_R, vel_t, have_vel = carry
            R_pred = jnp.where(have_vel, vel_R @ R, R)
            t_pred = jnp.where(have_vel, vel_R @ t + vel_t, t)
            r = step(image, map_pts, map_desc, map_valid, zn, zd, zd,
                     R_pred, t_pred, R, t, K)
            new_vel_R = r.R @ R.T
            new_vel_t = r.t - new_vel_R @ t
            carry = (r.R, r.t, new_vel_R, new_vel_t,
                     jnp.ones((), bool))
            return carry, (r.R, r.t, r.n_inliers, r.n_matches2)

        init = (R0, t0, jnp.eye(3), jnp.zeros(3), jnp.zeros((), bool))
        _, (Rs, ts, n_inl, n_m) = jax.lax.scan(body, init, images)
        return Rs, ts, n_inl, n_m

    batched = jax.vmap(per_sequence, in_axes=(0, 0, 0, 0, 0, 0, None))

    dp = P("dp")
    shardings = tuple(
        NamedSharding(mesh, s) for s in (dp, dp, dp, dp, dp, dp, P())
    )
    out_sharding = tuple(NamedSharding(mesh, dp) for _ in range(4))

    @partial(jax.jit, in_shardings=shardings, out_shardings=out_sharding)
    def run_jit(images, map_pts, map_desc, map_valid, R0, t0, K):
        return batched(images, map_pts, map_desc, map_valid, R0, t0, K)

    def run(images, map_pts, map_desc, map_valid, R0, t0, K):
        Rs, ts, n_inl, n_m = run_jit(
            images, map_pts, map_desc, map_valid, R0, t0, K
        )
        return {"R": Rs, "t": ts, "n_inliers": n_inl, "n_matches": n_m}

    return run
