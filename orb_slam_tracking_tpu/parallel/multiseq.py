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
    "make_multiseq_sequence_runner", "make_multiseq_init_runner",
    "make_multiseq_mapping_runner",
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
        # batched_solve: per_sequence runs under vmap, where the 6x6
        # damped solve must be told about the batch axis explicitly
        res = optimize_pose(R, t, map_pts, uv_obs, inv_s2, matched, K,
                            batched_solve=True)
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

    step = make_tracking_step(cam_cfg, orb_cfg, matcher_cfg, tracker_cfg,
                              batched_solve=True)

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


def make_multiseq_init_runner(
    mesh: Mesh,
    cam_cfg,
    orb_cfg: OrbConfig,
    matcher_cfg: MatcherConfig,
    tracker_cfg,
    init_cfg,
    point_capacity: int = 512,
):
    """Device-side BOOTSTRAP: sequences initialize themselves inside one
    jitted SPMD scan — no host round trips and no pre-built map.

    Per frame each sequence runs the reference's NOT_INITIALIZED /
    INITIALIZING / WORKING state machine (``tracking.hpp:58-65``,
    ``tracking.cpp:63-119``) entirely on device:

      state 0: >=100 keypoints seed the reference frame;
      state 1: ``search_for_initialization`` against the reference,
        re-seed on a match collapse (``tracking.cpp:103-110``), else
        batched H/F RANSAC (``initialize_two_view``) — on success the
        triangulated points are median-depth-normalized and scattered
        into the per-sequence map (CreateInitialMapMonocular's
        convention; the reference frame's camera becomes the world);
      state 2: the fused two-stage track step against the carried map.

    Under vmap the state branches lower to selects (every sequence pays
    matcher + RANSAC + track every frame), so this runner is meant for a
    BOUNDED init prefix of the stream: run it for the first T_init
    frames, then hand the returned maps/poses to the lean
    ``make_multiseq_sequence_runner`` for the steady state.

    Returned signature:
      run(images [B,T,H,W], K [3,3], keys [B,2] uint32)
      -> dict: initialized [B] bool, init_frame [B] int32 (-1 if never),
         map_pts [B,P,3], map_desc [B,P,8], map_valid [B,P],
         R [B,T,3,3], t [B,T,3] (identity until initialization; the
         world frame is the reference camera), state [B,T] int32,
         n_matches [B,T] int32.
    """
    from ..geometry.camera import undistort_pixels
    from ..geometry.twoview import initialize_two_view
    from ..ops.matcher import compact_matches, search_for_initialization

    Pc = point_capacity
    radius = tracker_cfg.projection_radius
    tight = tracker_cfg.local_map_radius
    scale = orb_cfg.scale_factor
    width, height = cam_cfg.width, cam_cfg.height
    n_levels = orb_cfg.n_levels

    def per_sequence(images, K, key):
        N = orb_cfg.max_keypoints

        def empty_snap():
            return dict(
                desc=jnp.zeros((N, 8), jnp.uint32),
                xy=jnp.zeros((N, 2), jnp.float32),
                octave=jnp.zeros((N,), jnp.int32),
                angle=jnp.zeros((N,), jnp.float32),
                valid=jnp.zeros((N,), bool),
            )

        def body(carry, image):
            (state, ref, mp, md, mv, R, t, vel_R, vel_t, have_vel,
             key, init_frame, frame_idx) = carry
            kps = orb_extract(image, orb_cfg)
            xy_un = undistort_pixels(cam_cfg, kps.xy)
            n_kps = jnp.sum(kps.valid.astype(jnp.int32))
            cur = dict(desc=kps.desc, xy=xy_un, octave=kps.octave,
                       angle=kps.angle_deg, valid=kps.valid)

            # ---- INITIALIZING attempt (meaningful when state == 1) ----
            res = search_for_initialization(
                ref["desc"], ref["xy"], ref["octave"], ref["angle"],
                ref["valid"],
                kps.desc, xy_un, kps.octave, kps.angle_deg, kps.valid,
                matcher_cfg,
            )
            nm = res.n_matches
            pairs, pv = compact_matches(res.matches12, Pc)
            key, sub = jax.random.split(key)
            tv = initialize_two_view(
                ref["xy"][pairs[:, 0]], xy_un[pairs[:, 1]], pv, K, sub,
                init_cfg,
            )
            tri = tv.tri_mask
            z = tv.points3d[:, 2]
            med = jnp.nanmedian(jnp.where(tri, z, jnp.nan))
            med = jnp.where(jnp.isfinite(med) & (med > 1e-6), med, 1.0)
            seed_pts = tv.points3d / med
            seed_desc = kps.desc[pairs[:, 1]]
            R_init = tv.R21
            t_init = tv.t21 / med

            # ---- WORKING step (meaningful when state == 2) ----
            zn = jnp.zeros((Pc, 3), jnp.float32)
            zd = jnp.zeros((Pc,), jnp.float32)
            R_pred = jnp.where(have_vel, vel_R @ R, R)
            t_pred = jnp.where(have_vel, vel_R @ t + vel_t, t)

            def match(Rm, tm, rad):
                return search_by_projection(
                    mp, md, mv, Rm, tm, K,
                    kps.desc, xy_un, kps.valid, rad, matcher_cfg,
                    width, height,
                    kp_octave=kps.octave, scale_factor=scale,
                    pt_normal=zn, pt_dmin=zd, pt_dmax=zd,
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
                    batched_solve=True,
                )

            pm1 = match(R_pred, t_pred, radius)
            res1 = optimize(R, t, pm1)
            pm2 = match(res1.R, res1.t, tight)
            res2 = optimize(res1.R, res1.t, pm2)

            # ---- state transitions (selects; exact reference policy) ----
            enough_kps = n_kps >= 100
            seeding = (state == 0) & enough_kps
            init_ok = (state == 1) & enough_kps \
                & (nm >= init_cfg.min_matches) & tv.success
            collapse = (state == 1) & enough_kps \
                & (nm < init_cfg.min_matches)
            # too few keypoints during INITIALIZING drops back to
            # NOT_INITIALIZED (tracking.cpp:63-70 / Tracker._try_initialize)
            drop = (state == 1) & ~enough_kps
            take_ref = seeding | collapse          # (re-)seed the reference
            working = state == 2

            new_state = jnp.where(
                init_ok | working, 2,
                jnp.where(take_ref, 1, jnp.where(drop, 0, state))
            ).astype(jnp.int32)
            new_ref = {k: jnp.where(take_ref, cur[k], ref[k]) for k in ref}
            mp = jnp.where(init_ok, seed_pts, mp)
            md = jnp.where(init_ok, seed_desc, md)
            mv = jnp.where(init_ok, tri, mv)
            R_new = jnp.where(working, res2.R, jnp.where(init_ok, R_init, R))
            t_new = jnp.where(working, res2.t, jnp.where(init_ok, t_init, t))
            new_vel_R = jnp.where(working, res2.R @ R.T, jnp.eye(3))
            new_vel_t = jnp.where(working, res2.t - (res2.R @ R.T) @ t,
                                  jnp.zeros(3))
            init_frame = jnp.where(init_ok, frame_idx, init_frame)
            carry = (new_state, new_ref, mp, md, mv, R_new, t_new,
                     new_vel_R, new_vel_t, working, key,
                     init_frame, frame_idx + 1)
            n_out = jnp.where(working, pm2.n_matches, nm).astype(jnp.int32)
            return carry, (R_new, t_new, new_state, n_out)

        init_carry = (
            jnp.zeros((), jnp.int32), empty_snap(),
            jnp.zeros((Pc, 3), jnp.float32), jnp.zeros((Pc, 8), jnp.uint32),
            jnp.zeros((Pc,), bool),
            jnp.eye(3), jnp.zeros(3), jnp.eye(3), jnp.zeros(3),
            jnp.zeros((), bool), key,
            jnp.full((), -1, jnp.int32), jnp.zeros((), jnp.int32),
        )
        carry, (Rs, ts, states, n_out) = jax.lax.scan(
            body, init_carry, images)
        (state, _, mp, md, mv, R, t, *_rest) = carry
        return (state == 2, carry[11], mp, md, mv, Rs, ts, states, n_out)

    batched = jax.vmap(per_sequence, in_axes=(0, None, 0))

    dp = P("dp")
    in_shardings = (NamedSharding(mesh, dp), NamedSharding(mesh, P()),
                    NamedSharding(mesh, dp))
    out_shardings = tuple(NamedSharding(mesh, dp) for _ in range(9))

    @partial(jax.jit, in_shardings=in_shardings, out_shardings=out_shardings)
    def run_jit(images, K, keys):
        return batched(images, K, keys)

    def run(images, K, keys):
        (ok, init_frame, mp, md, mv, Rs, ts, states, n_out) = run_jit(
            images, K, keys)
        return {
            "initialized": ok, "init_frame": init_frame,
            "map_pts": mp, "map_desc": md, "map_valid": mv,
            "R": Rs, "t": ts, "state": states, "n_matches": n_out,
        }

    return run


def make_multiseq_mapping_runner(
    mesh: Mesh,
    cam_cfg,
    orb_cfg: OrbConfig,
    matcher_cfg: MatcherConfig,
    tracker_cfg,
    tri_cap: int = 128,
    obs_cap: int = 512,
):
    """Data-parallel sequences with GROWING per-sequence maps: the full
    device-side local-mapping loop (``slam/device_mapping.py`` — fused
    tracking step + keyframe lifecycle incl. triangulation, fusion,
    culling and windowed BA) vmapped over the sequence axis and sharded
    over the mesh's ``dp`` axis. Each sequence carries its own
    fixed-capacity ``SlamMap``; there are no collectives (maps are
    independent), so scaling is embarrassing by construction.

    Note: under ``vmap`` the keyframe ``lax.cond`` lowers to a select —
    every sequence pays the insert branch every frame. That is the SPMD
    price for divergent control flow; the single-sequence loop pays it
    only on keyframe frames.

    Returned signature:
      run(images [B,T,H,W], m0: SlamMap with leading [B] on every leaf,
          R0 [B,3,3], t0 [B,3], K [3,3], frame_id0 [B], kf_count0 [B],
          kf_ref_inliers0 [B])
      -> (SlamMap [B, ...], DeviceLoopOutputs [B, T, ...])
    """
    from ..slam.device_mapping import make_device_sequence_loop

    run1 = make_device_sequence_loop(
        cam_cfg, orb_cfg, matcher_cfg, tracker_cfg,
        tri_cap=tri_cap, obs_cap=obs_cap, batched_solve=True,
    )
    batched = jax.vmap(run1, in_axes=(0, 0, 0, 0, None, 0, 0, 0))

    dp = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())

    @partial(
        jax.jit,
        in_shardings=(dp, dp, dp, dp, repl, dp, dp, dp),
        out_shardings=(dp, dp),
    )
    def run(images, m0, R0, t0, K, frame_id0, kf_count0, ref0):
        return batched(images, m0, R0, t0, K, frame_id0, kf_count0, ref0)

    return run
