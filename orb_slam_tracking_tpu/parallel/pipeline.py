"""Pipeline-parallel tracking: extraction and pose tracking as pipelined
stages over a ``pp`` mesh axis.

SURVEY.md §2.3 marks pipeline parallelism as the optional strategy
"pyramid-extract -> match -> optimize as pipelined stages over a frame
stream".  This module is the TPU-native realization: the two halves of
the fused tracking step (``slam/fused_step.py``) are placed on two
devices of a ``Mesh`` axis and a frame stream flows through them
GPipe-style —

  step k:   stage 0 extracts frame k          (MXU: pyramid + FAST + BRIEF)
            stage 1 tracks   frame k-1        (projection match + pose LM)
            ppermute: keypoints  stage 0 -> stage 1

so in the steady state both chips are busy every step and the stream
throughput is ``1 / max(stage_time)`` instead of ``1 / sum``.  This is
the device analog of the reference design's intended extraction/tracking
thread split (the reference's ``tracking.hpp:58-65`` loop runs extraction
and pose update back-to-back on one core; ORB-SLAM proper overlaps them
with threads).  The sequential dependency of SLAM lives entirely in
stage 1 (the constant-velocity carry), which is why this 2-stage cut is
the natural one: extraction is stateless per frame and can run ahead.

Mechanics, in XLA terms:

- one ``shard_map`` program over ``Mesh((..., "pp"))`` with every operand
  replicated; ``lax.axis_index("pp")`` selects the stage's branch via
  ``lax.switch`` (a runtime conditional — each core executes ONLY its
  stage's computation each step);
- the in-flight keypoint buffer (a ``Keypoints`` pytree + undistorted
  pixels) advances one stage per scan step via ``lax.ppermute`` — the
  ICI hop replaces the reference's shared-memory frame queue;
- one ``lax.scan`` over T+1 steps (1-step fill bubble), static shapes
  throughout.

The map is held static during the stream (the steady-state regime of
``make_multiseq_sequence_runner``'s lean runner); keyframe work happens
between streams.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh

from ..config import CameraConfig, MatcherConfig, OrbConfig, TrackerConfig
from ..geometry import camera
from ..ops.extractor import orb_extract
from ..ops.proj_matcher import search_by_projection
from ..optim.pose_opt import optimize_pose
from ..types import Keypoints

__all__ = ["PipelineResult", "make_pp_mesh", "make_pipelined_tracker"]

N_STAGES = 2


class PipelineResult(NamedTuple):
    R: jnp.ndarray          # [T, 3, 3] optimized world-to-camera poses
    t: jnp.ndarray          # [T, 3]
    n_inliers: jnp.ndarray  # [T] int32
    n_matches: jnp.ndarray  # [T] int32 (stage-2 tight matches)
    n_kps: jnp.ndarray      # [T] int32 keypoints extracted for the frame


def make_pp_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < N_STAGES:
        raise ValueError(f"pipeline needs >= {N_STAGES} devices")
    return Mesh(np.asarray(devices[:N_STAGES]), ("pp",))


def _zero_kps(n: int) -> Keypoints:
    return Keypoints(
        xy=jnp.zeros((n, 2), jnp.float32),
        response=jnp.zeros((n,), jnp.float32),
        angle_deg=jnp.zeros((n,), jnp.float32),
        octave=jnp.zeros((n,), jnp.int32),
        size=jnp.zeros((n,), jnp.float32),
        desc=jnp.zeros((n, 8), jnp.uint32),
        valid=jnp.zeros((n,), bool),
    )


def make_pipelined_tracker(
    mesh: Mesh,
    cam_cfg: CameraConfig,
    orb_cfg: OrbConfig,
    matcher_cfg: MatcherConfig,
    tracker_cfg: TrackerConfig,
    axis: str = "pp",
):
    """Build the jitted 2-stage pipelined tracking stream.

    Returned signature:
      run(frames [T,H,W], map_pts [P,3], map_desc [P,8], map_valid [P],
          map_normal [P,3], map_dmin [P], map_dmax [P],
          R0 [3,3], t0 [3], K [3,3]) -> PipelineResult   (length T)

    Frame k's pose is produced one pipeline step after its extraction;
    the constant-velocity prediction/carry matches the host tracker's
    WORKING state (``Tracker._track_working`` / ``multiseq.py``).
    """
    if mesh.shape[axis] != N_STAGES:
        raise ValueError(
            f"mesh axis {axis!r} must have exactly {N_STAGES} stages "
            f"(extract | track), got {mesh.shape[axis]}")
    radius = tracker_cfg.projection_radius
    tight = tracker_cfg.local_map_radius
    scale = orb_cfg.scale_factor
    width, height = cam_cfg.width, cam_cfg.height
    n_levels = orb_cfg.n_levels
    n_kp = orb_cfg.max_keypoints

    def extract_stage(image):
        kps = orb_extract(image, orb_cfg)
        xy_un = camera.undistort_pixels(cam_cfg, kps.xy)
        return kps, xy_un

    def track_stage(buf, state, mp, md, mv, mn, dmin, dmax, K):
        kps, xy_un = buf
        R, t, vel_R, vel_t, have_vel = state
        R_pred = jnp.where(have_vel, vel_R @ R, R)
        t_pred = jnp.where(have_vel, vel_R @ t + vel_t, t)

        def match(Rm, tm, rad):
            return search_by_projection(
                mp, md, mv, Rm, tm, K,
                kps.desc, xy_un, kps.valid, rad, matcher_cfg,
                width, height,
                kp_octave=kps.octave, scale_factor=scale,
                pt_normal=mn, pt_dmin=dmin, pt_dmax=dmax,
                n_levels=n_levels,
            )

        def optimize(Ro, to, pm):
            kp_idx = pm.kp_for_point
            matched = kp_idx >= 0
            safe = jnp.clip(kp_idx, 0)
            inv_s2 = 1.0 / scale ** (
                2.0 * kps.octave[safe].astype(jnp.float32))
            return optimize_pose(
                Ro, to, mp, xy_un[safe], inv_s2, matched, K,
                rounds=tracker_cfg.pose_opt_rounds,
                iters_per_round=tracker_cfg.pose_opt_iters,
            )

        pm1 = match(R_pred, t_pred, radius)
        res1 = optimize(R, t, pm1)
        pm2 = match(res1.R, res1.t, tight)
        res2 = optimize(res1.R, res1.t, pm2)
        new_vel_R = res2.R @ R.T
        new_state = (res2.R, res2.t, new_vel_R, res2.t - new_vel_R @ t,
                     jnp.bool_(True))
        out = (res2.R, res2.t, res2.n_inliers, pm2.n_matches, kps.count())
        return new_state, out

    def body(frames, mp, md, mv, mn, dmin, dmax, R0, t0, K):
        stage = lax.axis_index(axis)
        T = frames.shape[0]
        dummy_buf = (_zero_kps(n_kp),
                     jnp.zeros((n_kp, 2), jnp.float32))
        # all-zero so the cross-stage psum below reduces to a broadcast of
        # stage 1's real rows (XLA CollectivePermute can't fan out 1->all)
        dummy_out = (jnp.zeros((3, 3)), jnp.zeros(3), jnp.int32(0),
                     jnp.int32(0), jnp.int32(0))
        state0 = (R0, t0, jnp.eye(3), jnp.zeros(3), jnp.bool_(False))

        def step(carry, k):
            buf, st = carry

            def s_extract(_):
                img = lax.dynamic_index_in_dim(
                    frames, jnp.minimum(k, T - 1), 0, keepdims=False)
                return extract_stage(img), st, dummy_out

            def s_track(_):
                new_st, out = track_stage(buf, st, mp, md, mv, mn,
                                          dmin, dmax, K)
                # k == 0 is the fill bubble: the buffer is the dummy, so
                # the computed update is garbage — keep the initial state
                live = k >= 1
                new_st = jax.tree.map(
                    lambda a, b: jnp.where(live, a, b), new_st, st)
                out = jax.tree.map(
                    lambda a, b: jnp.where(live, a, b), out, dummy_out)
                return dummy_buf, new_st, out

            new_buf, new_st, out = lax.switch(
                stage, [s_extract, s_track], None)
            # advance the in-flight keypoints one stage along the ring
            # (stage 1 -> 0 carries the dummy; stage 0 ignores its buffer)
            new_buf = lax.ppermute(
                new_buf, axis,
                [(i, (i + 1) % N_STAGES) for i in range(N_STAGES)])
            return (new_buf, new_st), out

        _, outs = lax.scan(step, (dummy_buf, state0),
                           jnp.arange(T + 1, dtype=jnp.int32))
        # only stage 1's rows 1..T are real; every other stage contributed
        # zeros, so a psum replicates them (out_spec P() then holds)
        outs = jax.tree.map(lambda a: a[1:], outs)
        outs = lax.psum(outs, axis)
        return PipelineResult(*outs)

    from jax.sharding import PartitionSpec as P
    n_in = 10
    run = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(),) * n_in,
        out_specs=P(),
        check_vma=False,
    ))
    return run
