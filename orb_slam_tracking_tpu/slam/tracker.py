"""Monocular tracking loop: the completed state machine.

The reference's ``Tracking`` class is declared but unfinished and unbuilt
(``tracking.{hpp,cpp}``; states ``tracking.hpp:58-65``; ``GrabImage``
``tracking.cpp:33-76`` has no WORKING path and falls off the end). This
module completes that declared intent TPU-natively:

- NO_IMAGES_YET / NOT_INITIALIZED -> first-frame seeding with the 2x
  feature extractor (``tracking.cpp:17-23``), >=100-keypoint gate
  (``tracking.cpp:80``);
- INITIALIZING -> init matcher + two-view bootstrap (>=100 matches,
  ``tracking.cpp:105``), map creation with median-depth scale
  normalization (ORB-SLAM's CreateInitialMapMonocular convention);
- WORKING -> constant-velocity prediction (``mVelocity``,
  ``tracking.hpp:110-111``), projection-guided matching, pose-only LM with
  staged outlier rejection, velocity update, keyframe insertion by the
  ``maxFrames`` policy (``Config/Settings.hpp:44-46``) with new-point
  triangulation against the previous keyframe;
- LOST -> windowed re-acquisition from the last known pose (BoW
  relocalization is a separate, later subsystem).

Control flow lives on the host (per-frame branch on a scalar status);
every numeric stage is a jitted fixed-shape kernel, so each branch
compiles exactly once. The sharded multi-sequence variant in
``parallel/multiseq.py`` reuses the same kernels under vmap.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SystemConfig
from ..geometry import camera, se3
from ..geometry.twoview import initialize_two_view
from ..ops import orb_extract
from ..ops.matcher import compact_matches, search_for_initialization
from ..ops.proj_matcher import search_by_projection
from ..optim.pose_opt import optimize_pose
from ..types import Keypoints
from .map import OBS_PER_KF, SlamMap, empty_map

__all__ = ["Tracker", "TrackState"]


class TrackState:
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    INITIALIZING = 2
    WORKING = 3
    LOST = 4

    NAMES = {0: "NO_IMAGES_YET", 1: "NOT_INITIALIZED", 2: "INITIALIZING",
             3: "WORKING", 4: "LOST"}


@partial(jax.jit, static_argnames=())
def _triangulate_world(R1, t1, R2, t2, K, x1, x2):
    """Triangulate matched undistorted pixels into world points given two
    world-to-camera poses."""
    from ..geometry.triangulate import triangulate_dlt

    P1 = (K @ jnp.concatenate([R1, t1[:, None]], axis=1))[None]
    P2 = (K @ jnp.concatenate([R2, t2[:, None]], axis=1))[None]
    return triangulate_dlt(P1, P2, x1[None], x2[None])[0]


def _reproj_chi2(R, t, K, pts, uv):
    pc = pts @ np.asarray(R).T + np.asarray(t)
    z = pc[:, 2]
    zi = np.where(np.abs(z) < 1e-9, 1e-9, z)
    u = np.asarray(K)[0, 0] * pc[:, 0] / zi + np.asarray(K)[0, 2]
    v = np.asarray(K)[1, 1] * pc[:, 1] / zi + np.asarray(K)[1, 2]
    err = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
    return err, z


@dataclasses.dataclass
class _FrameSnap:
    """Host-side snapshot of a frame used as a matching reference."""

    kps: Keypoints
    xy_un: jnp.ndarray
    frame_id: int
    matched_to_map: Optional[np.ndarray] = None  # [N] bool
    timestamp: float = 0.0                       # capture time of the frame


class Tracker:
    """Host-orchestrated monocular tracker over jitted kernels."""

    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.K = camera.intrinsics_matrix(cfg.camera)
        self.map = empty_map(cfg.tracker)
        self.state = TrackState.NO_IMAGES_YET
        self.frame_id = -1
        self.ref: Optional[_FrameSnap] = None       # init reference frame
        self.prev_kf: Optional[_FrameSnap] = None   # last keyframe snapshot
        self.R = np.eye(3, dtype=np.float32)        # world-to-camera
        self.t = np.zeros(3, dtype=np.float32)
        self.vel_R = np.eye(3, dtype=np.float32)    # T_cur o T_prev^-1
        self.vel_t = np.zeros(3, dtype=np.float32)
        self.have_velocity = False
        self.frames_since_kf = 0
        self.n_kf = 0
        self.obs_cursor = 0
        self.kf_ref_inliers = 0  # tracked-point count of the last keyframe
        self.trajectory: list = []                  # (frame_id, ts, R, t)
        self._key = jax.random.PRNGKey(0)
        self.vocab = None                           # trained at map init
        self.kf_db = None                           # BoW keyframe database

    # ------------------------------------------------------------------
    def track(self, image, timestamp: float) -> dict:
        """Process one grayscale frame; returns a per-frame metrics dict
        (the structured equivalent of the reference's cout diagnostics,
        SURVEY.md §5.5)."""
        self.frame_id += 1
        cfg = self.cfg
        init_phase = self.state in (
            TrackState.NO_IMAGES_YET, TrackState.NOT_INITIALIZED,
            TrackState.INITIALIZING,
        )
        ocfg = cfg.init_orb if init_phase else cfg.orb
        kps = orb_extract(jnp.asarray(image, jnp.float32), ocfg)
        xy_un = camera.undistort_pixels(cfg.camera, kps.xy)
        n_kps = int(kps.count())
        metrics = {
            "frame_id": self.frame_id, "state": TrackState.NAMES[self.state],
            "n_kps": n_kps,
        }

        if self.state in (TrackState.NO_IMAGES_YET, TrackState.NOT_INITIALIZED):
            self._deal_first_frame(kps, xy_un, n_kps, timestamp)
        elif self.state == TrackState.INITIALIZING:
            metrics.update(self._try_initialize(kps, xy_un, n_kps, timestamp))
        elif self.state == TrackState.WORKING:
            metrics.update(self._track_working(kps, xy_un, timestamp))
        elif self.state == TrackState.LOST:
            metrics.update(self._track_lost(kps, xy_un, timestamp))

        metrics["state_after"] = TrackState.NAMES[self.state]
        if self.state == TrackState.WORKING:
            self.trajectory.append(
                (self.frame_id, timestamp, self.R.copy(), self.t.copy())
            )
        return metrics

    # ------------------------------------------------------------------
    def _deal_first_frame(self, kps, xy_un, n_kps, timestamp):
        """``Tracking::DealFirstFrame`` (tracking.cpp:78-91): require >=100
        keypoints, snapshot the frame, move to INITIALIZING."""
        if n_kps < 100:
            self.state = TrackState.NOT_INITIALIZED
            return
        self.ref = _FrameSnap(kps=kps, xy_un=xy_un, frame_id=self.frame_id,
                              timestamp=timestamp)
        self.state = TrackState.INITIALIZING

    def _try_initialize(self, kps, xy_un, n_kps, timestamp) -> dict:
        """``Tracking::Initialize`` (tracking.cpp:93-119) completed with
        map creation."""
        cfg = self.cfg
        if n_kps < 100:
            self.state = TrackState.NOT_INITIALIZED
            self.ref = None
            return {"init": "too few keypoints"}
        ref = self.ref
        res = search_for_initialization(
            ref.kps.desc, ref.xy_un, ref.kps.octave, ref.kps.angle_deg,
            ref.kps.valid,
            kps.desc, xy_un, kps.octave, kps.angle_deg, kps.valid,
            cfg.matcher,
        )
        nm = int(res.n_matches)
        if nm < cfg.init.min_matches:
            # reference behavior: re-seed from this frame (tracking.cpp:63-70)
            self.ref = _FrameSnap(kps=kps, xy_un=xy_un, frame_id=self.frame_id,
                                  timestamp=timestamp)
            return {"init": f"too few matches ({nm})", "n_matches": nm}
        pairs, pv = compact_matches(res.matches12, cfg.matcher.max_matches)
        self._key, sub = jax.random.split(self._key)
        tv = initialize_two_view(
            ref.xy_un[pairs[:, 0]], xy_un[pairs[:, 1]], pv, self.K, sub,
            cfg.init,
        )
        out = {
            "n_matches": nm,
            "score_h": float(tv.score_h), "score_f": float(tv.score_f),
            "used_h": bool(tv.used_homography),
            "n_good": int(tv.n_good),
            "parallax_deg": float(tv.parallax_deg),
        }
        if not bool(tv.success):
            # keep the reference frame: later frames have a larger baseline
            # against it. Only a match-count collapse re-seeds (the ORB-SLAM
            # policy; the reference's own Initialize re-seeds only on the
            # <100-match gate, tracking.cpp:103-110).
            out["init"] = "reconstruction failed"
            return out
        self._create_initial_map(kps, xy_un, pairs, tv, timestamp)
        out["init"] = "success"
        out["n_map_points"] = int(self.map.n_points())
        return out

    def _create_initial_map(self, kps, xy_un, pairs, tv, timestamp):
        """Create the two first keyframes + map points, normalizing scale
        so the median depth in the first camera is 1 (ORB-SLAM's
        CreateInitialMapMonocular convention)."""
        tri = np.asarray(tv.tri_mask)
        pts = np.asarray(tv.points3d)[tri]
        med = float(np.median(pts[:, 2]))
        pts = pts / med
        R21 = np.asarray(tv.R21)
        t21 = np.asarray(tv.t21) / med

        p = np.asarray(pairs)[tri]           # [G, 2] (ref kp, cur kp)
        G = pts.shape[0]
        oct2 = np.asarray(kps.octave)[p[:, 1]]
        inv_s2 = (1.0 / self.cfg.orb.scale_factor ** (2 * oct2)).astype(np.float32)

        m = self.map
        slots = np.arange(G)
        m = m._replace(
            pts=m.pts.at[slots].set(jnp.asarray(pts)),
            desc=m.desc.at[slots].set(kps.desc[p[:, 1]]),
            pt_valid=m.pt_valid.at[slots].set(True),
            n_obs=m.n_obs.at[slots].set(2),
            kf_R=m.kf_R.at[0].set(jnp.eye(3)).at[1].set(jnp.asarray(R21)),
            kf_t=m.kf_t.at[0].set(jnp.zeros(3)).at[1].set(jnp.asarray(t21)),
            kf_valid=m.kf_valid.at[0].set(True).at[1].set(True),
            kf_frame_id=m.kf_frame_id.at[0].set(self.ref.frame_id).at[1].set(self.frame_id),
        )
        # observations for both keyframes
        uv0 = np.asarray(self.ref.xy_un)[p[:, 0]]
        uv1 = np.asarray(xy_un)[p[:, 1]]
        o0 = np.arange(G)
        o1 = np.arange(G, 2 * G)
        m = m._replace(
            obs_kf=m.obs_kf.at[o0].set(0).at[o1].set(1),
            obs_pt=m.obs_pt.at[o0].set(jnp.asarray(slots)).at[o1].set(jnp.asarray(slots)),
            obs_uv=m.obs_uv.at[o0].set(jnp.asarray(uv0)).at[o1].set(jnp.asarray(uv1)),
            obs_inv_sigma2=m.obs_inv_sigma2.at[o0].set(1.0).at[o1].set(jnp.asarray(inv_s2)),
            obs_valid=m.obs_valid.at[o0].set(True).at[o1].set(True),
        )
        self.map = m
        self.obs_cursor = 2 * G
        self.n_kf = 2
        self.R, self.t = R21, t21.astype(np.float32)
        self.have_velocity = False
        self.frames_since_kf = 0
        self.kf_ref_inliers = G
        matched = np.zeros(kps.valid.shape[0], bool)
        matched[p[:, 1]] = True
        self.prev_kf = _FrameSnap(
            kps=kps, xy_un=xy_un, frame_id=self.frame_id,
            matched_to_map=matched, timestamp=timestamp,
        )
        # retroactively append the reference keyframe's pose to the
        # trajectory, stamped with ITS capture time (not the current
        # frame's — that skews TUM-format ATE/RPE time alignment by the
        # init baseline duration)
        self.trajectory.append(
            (self.ref.frame_id, self.ref.timestamp,
             np.eye(3, dtype=np.float32), np.zeros(3, dtype=np.float32))
        )
        # full BA over the initial two-keyframe map (the ORB-SLAM
        # GlobalBundleAdjustment-after-init step)
        self._local_ba(1)
        # place-recognition vocabulary from the init descriptors (the
        # reference would load a pretrained DBoW2 vocabulary here)
        if self.cfg.tracker.use_bow:
            self._init_bow(kps)
            self._bow_add(0, self.ref.kps)
            self._bow_add(1, kps)
        self.state = TrackState.WORKING

    # ------------------------------------------------------------------
    def _track_working(self, kps, xy_un, timestamp) -> dict:
        cfg = self.cfg
        # constant-velocity prediction: T_pred = vel o T_cur
        if cfg.tracker.use_motion_model and self.have_velocity:
            R_pred = self.vel_R @ self.R
            t_pred = self.vel_R @ self.t + self.vel_t
        else:
            R_pred, t_pred = self.R, self.t

        out = {}
        radius = cfg.tracker.projection_radius
        for attempt, rad in enumerate((radius, radius * 2.0)):
            pm = search_by_projection(
                self.map.pts, self.map.desc, self.map.pt_valid,
                jnp.asarray(R_pred), jnp.asarray(t_pred), self.K,
                kps.desc, xy_un, kps.valid, rad, cfg.matcher,
                cfg.camera.width, cfg.camera.height,
                kp_octave=kps.octave, scale_factor=cfg.orb.scale_factor,
            )
            if int(pm.n_matches) >= 20 or attempt == 1:
                break
        n_matched = int(pm.n_matches)
        out["n_proj_matches"] = n_matched
        out["n_visible"] = int(pm.n_visible)
        if n_matched < cfg.tracker.min_tracked_inliers:
            self.state = TrackState.LOST
            out["lost"] = "too few projection matches"
            return out

        # Stage 1: optimize against the motion-model associations, then
        # Stage 2 (ORB-SLAM's TrackLocalMap): re-match from the optimized
        # pose and optimize again. The velocity prediction centres the
        # SEARCH window only; optimization starts from the last optimized
        # pose — initializing at the extrapolation walks along the flat
        # valley a noisy map leaves in the cost (validated on synthetic
        # ground truth: extrapolated inits drift, last-pose inits do not).
        R_cur, t_cur = jnp.asarray(self.R), jnp.asarray(self.t)
        res = None
        for stage in range(2):
            kp_idx = pm.kp_for_point  # [P]
            matched = kp_idx >= 0
            uv_obs = xy_un[jnp.clip(kp_idx, 0)]
            oct_m = kps.octave[jnp.clip(kp_idx, 0)]
            inv_s2 = (1.0 / cfg.orb.scale_factor ** (2.0 * oct_m.astype(jnp.float32)))
            res = optimize_pose(
                R_cur, t_cur,
                self.map.pts, uv_obs, inv_s2, matched, self.K,
                rounds=cfg.tracker.pose_opt_rounds,
                iters_per_round=cfg.tracker.pose_opt_iters,
            )
            R_cur, t_cur = res.R, res.t
            if stage == 0:
                pm = search_by_projection(
                    self.map.pts, self.map.desc, self.map.pt_valid,
                    R_cur, t_cur, self.K,
                    kps.desc, xy_un, kps.valid,
                    cfg.tracker.local_map_radius, cfg.matcher,
                    cfg.camera.width, cfg.camera.height,
                    kp_octave=kps.octave, scale_factor=cfg.orb.scale_factor,
                )
                out["n_proj_matches_2"] = int(pm.n_matches)
        n_inl = int(res.n_inliers)
        out["n_inliers"] = n_inl
        if n_inl < cfg.tracker.min_tracked_inliers:
            self.state = TrackState.LOST
            out["lost"] = "too few pose inliers"
            return out

        R_new = np.asarray(res.R)
        t_new = np.asarray(res.t)
        # velocity = T_cur o T_prev^-1
        self.vel_R = R_new @ self.R.T
        self.vel_t = t_new - self.vel_R @ self.t
        self.have_velocity = True
        self.R, self.t = R_new, t_new
        self.frames_since_kf += 1

        if self._need_keyframe(n_inl):
            kf_out = self._insert_keyframe(kps, xy_un, pm, res, timestamp)
            out.update(kf_out)
        return out

    def _need_keyframe(self, n_inliers: int) -> bool:
        """ORB-SLAM-style policy: a new keyframe when tracking weakens
        below 90% of the reference keyframe's support, or after maxFrames
        (``Config/Settings.hpp:44-46``)."""
        tcfg = self.cfg.tracker
        if self.frames_since_kf < tcfg.min_frames + 1:
            return False
        return (
            self.frames_since_kf >= tcfg.max_frames
            or n_inliers < 0.9 * self.kf_ref_inliers
            or n_inliers < tcfg.min_tracked_inliers * 5
        )

    def _insert_keyframe(self, kps, xy_un, pm, pose_res, timestamp=0.0) -> dict:
        """Insert the current frame as a keyframe: record observations of
        tracked map points, then triangulate new points against the
        previous keyframe (the tracking-side slice of ORB-SLAM's local
        mapping)."""
        cfg = self.cfg
        m = self.map
        if self.n_kf >= m.kf_capacity:
            return {"kf": "capacity full"}
        slot = self.n_kf

        kp_idx = np.asarray(pm.kp_for_point)
        inl = np.asarray(pose_res.inlier)
        tracked_pts = np.where(inl & (kp_idx >= 0))[0]
        uv_np = np.asarray(xy_un)
        oct_np = np.asarray(kps.octave)

        m = m._replace(
            kf_R=m.kf_R.at[slot].set(jnp.asarray(self.R)),
            kf_t=m.kf_t.at[slot].set(jnp.asarray(self.t)),
            kf_valid=m.kf_valid.at[slot].set(True),
            kf_frame_id=m.kf_frame_id.at[slot].set(self.frame_id),
        )
        # observations of tracked points
        n_add = len(tracked_pts)
        cap = m.obs_kf.shape[0]
        n_add = min(n_add, cap - self.obs_cursor)
        if n_add > 0:
            sel = tracked_pts[:n_add]
            rows = np.arange(self.obs_cursor, self.obs_cursor + n_add)
            inv_s2 = (1.0 / cfg.orb.scale_factor ** (2 * oct_np[kp_idx[sel]])).astype(np.float32)
            m = m._replace(
                obs_kf=m.obs_kf.at[rows].set(slot),
                obs_pt=m.obs_pt.at[rows].set(jnp.asarray(sel)),
                obs_uv=m.obs_uv.at[rows].set(jnp.asarray(uv_np[kp_idx[sel]])),
                obs_inv_sigma2=m.obs_inv_sigma2.at[rows].set(jnp.asarray(inv_s2)),
                obs_valid=m.obs_valid.at[rows].set(True),
                n_obs=m.n_obs.at[jnp.asarray(sel)].add(1),
            )
            self.obs_cursor += n_add

        self.map = m
        out = {"kf": f"inserted slot {slot}", "kf_obs": int(n_add)}

        # --- new map points vs previous keyframe ---
        new_n = self._create_new_points(kps, xy_un, pm, slot)
        out["kf_new_points"] = new_n

        # --- local bundle adjustment over the keyframe window ---
        # (without BA the init map's correlated depth noise makes the
        # best-fit pose drift as baselines grow; this is why full ORB-SLAM
        # runs local BA after every keyframe)
        ba_out = self._local_ba(slot)
        out.update(ba_out)

        matched = np.zeros(kps.valid.shape[0], bool)
        matched[kp_idx[tracked_pts]] = True
        self.prev_kf = _FrameSnap(
            kps=kps, xy_un=xy_un, frame_id=self.frame_id,
            matched_to_map=matched, timestamp=timestamp,
        )
        self._bow_add(slot, kps)
        self.n_kf += 1
        self.frames_since_kf = 0
        self.kf_ref_inliers = int(n_add) + out.get("kf_new_points", 0)
        return out

    def _create_new_points(self, kps, xy_un, pm, slot: int) -> int:
        """Triangulate unmatched keypoints against the previous keyframe."""
        cfg = self.cfg
        prev = self.prev_kf
        if prev is None:
            return 0
        m = self.map
        # exclude keypoints already associated to map points on either side
        cur_un = np.asarray(pm.point_for_kp) < 0
        prev_un = ~prev.matched_to_map if prev.matched_to_map is not None else None
        v1 = prev.kps.valid & jnp.asarray(prev_un if prev_un is not None else True)
        v2 = kps.valid & jnp.asarray(cur_un)
        res = search_for_initialization(
            prev.kps.desc, prev.xy_un, prev.kps.octave, prev.kps.angle_deg, v1,
            kps.desc, xy_un, kps.octave, kps.angle_deg, v2,
            cfg.matcher,
        )
        nm = int(res.n_matches)
        if nm == 0:
            return 0
        pairs, pv = compact_matches(res.matches12, cfg.matcher.max_matches)
        pnp = np.asarray(pairs)[np.asarray(pv)]
        # previous keyframe pose
        kf_slot_prev = self.n_kf - 1
        R1 = np.asarray(self.map.kf_R[kf_slot_prev])
        t1 = np.asarray(self.map.kf_t[kf_slot_prev])
        x1 = np.asarray(prev.xy_un)[pnp[:, 0]]
        x2 = np.asarray(xy_un)[pnp[:, 1]]
        pts = np.asarray(
            _triangulate_world(
                jnp.asarray(R1), jnp.asarray(t1),
                jnp.asarray(self.R), jnp.asarray(self.t), self.K,
                jnp.asarray(x1), jnp.asarray(x2),
            )
        )
        # vet: cheirality, reprojection, parallax
        err1, z1 = _reproj_chi2(R1, t1, self.K, pts, x1)
        err2, z2 = _reproj_chi2(self.R, self.t, self.K, pts, x2)
        o1 = -R1.T @ t1
        o2 = -self.R.T @ self.t
        r1 = pts - o1
        r2 = pts - o2
        cosp = np.sum(r1 * r2, -1) / np.maximum(
            np.linalg.norm(r1, axis=-1) * np.linalg.norm(r2, axis=-1), 1e-12
        )
        # parallax gate at cos < 0.9998 (~1.15 deg) like ORB-SLAM's
        # CreateNewMapPoints ray test — short-baseline triangulations have
        # depth noise that later reads as pose drift
        ok = (
            np.isfinite(pts).all(-1)
            & (z1 > 0.05) & (z2 > 0.05)
            & (err1 < 5.991) & (err2 < 5.991)
            & (cosp < 0.9998)
        )
        pts = pts[ok]
        sel = pnp[ok]
        if len(pts) == 0:
            return 0
        free = np.where(~np.asarray(m.pt_valid))[0]
        n_new = min(len(pts), len(free))
        # obs capacity: 2 per new point
        n_new = min(n_new, (m.obs_kf.shape[0] - self.obs_cursor) // 2)
        if n_new <= 0:
            return 0
        pts = pts[:n_new]
        sel = sel[:n_new]
        slots = free[:n_new]
        oct2 = np.asarray(kps.octave)[sel[:, 1]]
        m = m._replace(
            pts=m.pts.at[slots].set(jnp.asarray(pts.astype(np.float32))),
            desc=m.desc.at[slots].set(kps.desc[sel[:, 1]]),
            pt_valid=m.pt_valid.at[slots].set(True),
            n_obs=m.n_obs.at[slots].set(2),
        )
        rows1 = np.arange(self.obs_cursor, self.obs_cursor + n_new)
        rows2 = rows1 + n_new
        uv1 = np.asarray(prev.xy_un)[sel[:, 0]]
        uv2 = np.asarray(xy_un)[sel[:, 1]]
        inv_s2_2 = (1.0 / cfg.orb.scale_factor ** (2 * oct2)).astype(np.float32)
        m = m._replace(
            obs_kf=m.obs_kf.at[rows1].set(kf_slot_prev).at[rows2].set(slot),
            obs_pt=m.obs_pt.at[rows1].set(jnp.asarray(slots)).at[rows2].set(jnp.asarray(slots)),
            obs_uv=m.obs_uv.at[rows1].set(jnp.asarray(uv1)).at[rows2].set(jnp.asarray(uv2)),
            obs_inv_sigma2=m.obs_inv_sigma2.at[rows1].set(1.0).at[rows2].set(jnp.asarray(inv_s2_2)),
            obs_valid=m.obs_valid.at[rows1].set(True).at[rows2].set(True),
        )
        self.obs_cursor += 2 * n_new
        self.map = m
        return int(n_new)

    def _init_bow(self, kps):
        import numpy as _np

        from ..bow.database import empty_database
        from ..bow.vocabulary import build_vocabulary

        tcfg = self.cfg.tracker
        train = _np.asarray(kps.desc)[_np.asarray(kps.valid)]
        self.vocab = build_vocabulary(
            train, k=tcfg.bow_branching, depth=tcfg.bow_depth, seed=0
        )
        self.kf_db = empty_database(tcfg.max_keyframes, self.vocab.n_words)

    def _bow_add(self, slot: int, kps):
        from ..bow.database import add_keyframe
        from ..bow.vocabulary import transform

        if self.vocab is None:
            return
        _, bow = transform(self.vocab, kps.desc, kps.valid)
        self.kf_db = add_keyframe(self.kf_db, slot, bow)

    def _local_ba(self, newest_slot: int) -> dict:
        """Local BA: optimize the last ``ba_window`` keyframes and all map
        points; older keyframes participate as fixed anchors (the gauge),
        mirroring ORB-SLAM's LocalBundleAdjustment structure."""
        from ..optim.ba import bundle_adjust

        cfg = self.cfg
        m = self.map
        window = cfg.tracker.ba_window
        kf_idx = np.arange(m.kf_capacity)
        fixed = ~np.asarray(m.kf_valid) | (kf_idx < max(self.n_kf - window, 1))
        fixed[0] = True
        res = bundle_adjust(
            m.kf_R, m.kf_t, m.pts,
            m.obs_kf, m.obs_pt, m.obs_uv, m.obs_inv_sigma2, m.obs_valid,
            jnp.asarray(fixed), m.pt_valid, self.K,
            iterations=cfg.tracker.ba_iterations,
        )
        # prune observations reclassified as outliers
        self.map = m._replace(
            kf_R=res.kf_R, kf_t=res.kf_t, pts=res.pts,
            obs_valid=m.obs_valid & res.obs_inlier,
        )
        # adopt the refined pose of the newest keyframe as the current pose
        self.R = np.asarray(res.kf_R[newest_slot])
        self.t = np.asarray(res.kf_t[newest_slot])
        self.have_velocity = False  # velocity is stale after the jump
        return {
            "ba_cost0": float(res.cost0), "ba_cost": float(res.cost),
            "ba_inlier_obs": int(res.obs_inlier.sum()),
        }

    # ------------------------------------------------------------------
    def _track_lost(self, kps, xy_un, timestamp) -> dict:
        """Relocalization (the reference's LOST state has no recovery path,
        tracking.hpp:64; full ORB-SLAM relocalizes via its DBoW2 database):

        1. BoW place recognition proposes candidate keyframes;
        2. current features match the map points *without any spatial
           window* (SearchByBoW's role — a pose prior does not exist);
        3. RANSAC PnP from the 2D-3D matches;
        4. pose-only LM refinement and a tight local-map re-match.
        """
        from ..geometry.pnp import ransac_pnp
        from ..ops.matcher import match_descriptors

        cfg = self.cfg
        reloc_kf = -1
        if self.vocab is not None and self.n_kf > 0:
            from ..bow.database import query
            from ..bow.vocabulary import transform

            _, bow = transform(self.vocab, kps.desc, kps.valid)
            scores = np.asarray(query(self.kf_db, bow))
            reloc_kf = int(np.argmax(scores))

        # window-free 2D-3D matching: each map point finds its best frame
        # keypoint (this direction keeps the candidate pool small and the
        # ratio test meaningful — most keypoints have no map point)
        # loose gates — RANSAC absorbs the resulting outliers
        m12 = match_descriptors(
            self.map.desc, self.map.pt_valid, kps.desc, kps.valid,
            ratio=0.9, th=cfg.matcher.th_high,
        )
        mnp = np.asarray(m12)
        pt_sel = np.where(mnp >= 0)[0]
        if len(pt_sel) < 12:
            return {"reloc": "too few 2d-3d matches", "reloc_kf": reloc_kf,
                    "n_2d3d": len(pt_sel)}
        kp_sel = mnp[pt_sel]
        M = self.map.point_capacity
        pts_m = np.zeros((M, 3), np.float32)
        uv_m = np.zeros((M, 2), np.float32)
        valid_m = np.zeros(M, bool)
        n = len(kp_sel)
        pts_m[:n] = np.asarray(self.map.pts)[pt_sel]
        uv_m[:n] = np.asarray(xy_un)[kp_sel]
        valid_m[:n] = True
        self._key, sub = jax.random.split(self._key)
        # a large hypothesis batch is nearly free (all solve at once) and
        # buys robustness at the ~25% match purity loose gating produces
        pnp = ransac_pnp(
            jnp.asarray(pts_m), jnp.asarray(uv_m), jnp.asarray(valid_m),
            self.K, sub, iterations=4096,
        )
        if not bool(pnp.ok) or int(pnp.n_inliers) < 10:
            return {"reloc": "pnp failed", "reloc_kf": reloc_kf,
                    "n_2d3d": n, "pnp_inl": int(pnp.n_inliers)}

        # refine on the PnP inlier set, then tight re-match + final refine
        res = optimize_pose(
            pnp.R, pnp.t, jnp.asarray(pts_m), jnp.asarray(uv_m),
            jnp.ones(M), pnp.inliers, self.K,
        )
        pm = search_by_projection(
            self.map.pts, self.map.desc, self.map.pt_valid,
            res.R, res.t, self.K,
            kps.desc, xy_un, kps.valid,
            cfg.tracker.projection_radius, cfg.matcher,
            cfg.camera.width, cfg.camera.height,
            kp_octave=kps.octave, scale_factor=cfg.orb.scale_factor,
        )
        kp_idx = pm.kp_for_point
        matched = kp_idx >= 0
        uv_obs = xy_un[jnp.clip(kp_idx, 0)]
        oct_m = kps.octave[jnp.clip(kp_idx, 0)]
        inv_s2 = 1.0 / cfg.orb.scale_factor ** (2.0 * oct_m.astype(jnp.float32))
        res = optimize_pose(
            res.R, res.t, self.map.pts, uv_obs, inv_s2, matched, self.K,
        )
        if int(res.n_inliers) < cfg.tracker.min_tracked_inliers * 2:
            return {"reloc": "pose failed", "reloc_kf": reloc_kf,
                    "n_2d3d": n, "pnp_inl": int(pnp.n_inliers)}
        self.R = np.asarray(res.R)
        self.t = np.asarray(res.t)
        self.have_velocity = False
        self.frames_since_kf = 0
        self.state = TrackState.WORKING
        return {"reloc": "recovered", "reloc_kf": reloc_kf,
                "n_inliers": int(res.n_inliers)}
