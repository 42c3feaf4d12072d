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
from ..ops.matcher import (
    compact_matches,
    search_for_initialization,
    search_for_triangulation,
)
from ..ops.proj_matcher import search_by_projection
from ..optim.pose_opt import optimize_pose
from ..types import Keypoints
from .map import OBS_PER_KF, SlamMap, empty_map, free_slots

__all__ = ["Tracker", "TrackState"]

# float32 matmul precision on TPU (the default truncates to bfloat16
# - see optim/ba.py:_obs_residuals).
_HI = jax.lax.Precision.HIGHEST


class TrackState:
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    INITIALIZING = 2
    WORKING = 3
    LOST = 4

    NAMES = {0: "NO_IMAGES_YET", 1: "NOT_INITIALIZED", 2: "INITIALIZING",
             3: "WORKING", 4: "LOST"}


def _pow2_bucket(n: int, lo: int = 64) -> int:
    """Pad counts to a power-of-two bucket so the jitted map-update
    programs compile a bounded number of times (the keyframe-insert path
    previously issued eager scatters with data-dependent lengths — a
    fresh XLA compile per insert)."""
    c = lo
    while c < n:
        c *= 2
    return c


def _pad_to(a: np.ndarray, cap: int, fill=0) -> np.ndarray:
    out = np.full((cap,) + a.shape[1:], fill, a.dtype)
    out[: len(a)] = a
    return out


@jax.jit
def _scatter_obs(m: SlamMap, slot, rows, tgt, kp, uv, inv_s2, ok, add_stats):
    """Append observation rows (slot, tgt, kp, uv) where ``ok``; padding
    lanes carry out-of-range indices and are dropped by the scatter.
    ``add_stats`` (0/1) also bumps pt_found/pt_visible (fuse semantics).
    One compiled program per (capacity bucket); replaces per-insert eager
    scatter chains."""
    O = m.obs_kf.shape[0]
    P = m.pts.shape[0]
    N = m.kf_kp_pt.shape[1]
    r = jnp.where(ok, rows, O)
    t_ = jnp.where(ok, tgt, P)
    k_ = jnp.where(ok, kp, N)
    okf = ok.astype(m.n_obs.dtype)
    drop = dict(mode="drop")
    return m._replace(
        obs_kf=m.obs_kf.at[r].set(slot, **drop),
        obs_pt=m.obs_pt.at[r].set(tgt.astype(m.obs_pt.dtype), **drop),
        obs_kp=m.obs_kp.at[r].set(kp.astype(m.obs_kp.dtype), **drop),
        obs_uv=m.obs_uv.at[r].set(uv, **drop),
        obs_inv_sigma2=m.obs_inv_sigma2.at[r].set(inv_s2, **drop),
        obs_valid=m.obs_valid.at[r].set(True, **drop),
        n_obs=m.n_obs.at[t_].add(okf, **drop),
        kf_kp_pt=m.kf_kp_pt.at[slot, k_].set(
            tgt.astype(jnp.int32), **drop),
        pt_found=m.pt_found.at[t_].add(okf * add_stats, **drop),
        pt_visible=m.pt_visible.at[t_].add(okf * add_stats, **drop),
    )


@jax.jit
def _scatter_new_points(m: SlamMap, slot, nb, pslots, rows1, rows2,
                        kp1, kp2, pts, uv1, uv2, inv1, inv2, birth, ok):
    """Create new triangulated points (two observations each: neighbor
    keyframe ``nb`` keypoint kp1, current keyframe ``slot`` keypoint kp2)
    where ``ok``. Descriptors are gathered from the current keyframe's
    snapshot. Padding lanes drop out of every scatter."""
    O = m.obs_kf.shape[0]
    P = m.pts.shape[0]
    N = m.kf_kp_pt.shape[1]
    s_ = jnp.where(ok, pslots, P)
    r1 = jnp.where(ok, rows1, O)
    r2 = jnp.where(ok, rows2, O)
    k1 = jnp.where(ok, kp1, N)
    k2 = jnp.where(ok, kp2, N)
    desc = m.kf_kp_desc[slot][jnp.clip(kp2, 0, N - 1)]
    pv = pslots.astype(m.obs_pt.dtype)
    drop = dict(mode="drop")
    one = jnp.ones_like(pslots, m.n_obs.dtype)
    return m._replace(
        pts=m.pts.at[s_].set(pts, **drop),
        desc=m.desc.at[s_].set(desc, **drop),
        pt_valid=m.pt_valid.at[s_].set(True, **drop),
        n_obs=m.n_obs.at[s_].set(2 * one, **drop),
        pt_birth_kf=m.pt_birth_kf.at[s_].set(
            birth.astype(m.pt_birth_kf.dtype), **drop),
        pt_visible=m.pt_visible.at[s_].set(one, **drop),
        pt_found=m.pt_found.at[s_].set(one, **drop),
        obs_kf=m.obs_kf.at[r1].set(nb, **drop).at[r2].set(slot, **drop),
        obs_pt=m.obs_pt.at[r1].set(pv, **drop).at[r2].set(pv, **drop),
        obs_kp=m.obs_kp.at[r1].set(kp1.astype(m.obs_kp.dtype), **drop)
                        .at[r2].set(kp2.astype(m.obs_kp.dtype), **drop),
        obs_uv=m.obs_uv.at[r1].set(uv1, **drop).at[r2].set(uv2, **drop),
        obs_inv_sigma2=m.obs_inv_sigma2.at[r1].set(inv1, **drop)
                                       .at[r2].set(inv2, **drop),
        obs_valid=m.obs_valid.at[r1].set(True, **drop)
                             .at[r2].set(True, **drop),
        kf_kp_pt=m.kf_kp_pt
            .at[nb, k1].set(pslots.astype(jnp.int32), **drop)
            .at[slot, k2].set(pslots.astype(jnp.int32), **drop),
    )


@jax.jit
def _jit_write_kf(m: SlamMap, slot, desc, octave, angle, valid, xy_un,
                  kp_pt, R, t, frame_id):
    """Keyframe pose + keypoint snapshot in ONE program (the eager
    version issued ~10 separate device dispatches per insert)."""
    N = m.kp_capacity
    pad = N - valid.shape[0]
    return m._replace(
        kf_R=m.kf_R.at[slot].set(R),
        kf_t=m.kf_t.at[slot].set(t),
        kf_valid=m.kf_valid.at[slot].set(True),
        kf_frame_id=m.kf_frame_id.at[slot].set(frame_id),
        kf_kp_xy=m.kf_kp_xy.at[slot].set(
            jnp.pad(xy_un, ((0, pad), (0, 0)))),
        kf_kp_desc=m.kf_kp_desc.at[slot].set(
            jnp.pad(desc, ((0, pad), (0, 0)))),
        kf_kp_octave=m.kf_kp_octave.at[slot].set(jnp.pad(octave, (0, pad))),
        kf_kp_angle=m.kf_kp_angle.at[slot].set(jnp.pad(angle, (0, pad))),
        kf_kp_valid=m.kf_kp_valid.at[slot].set(jnp.pad(valid, (0, pad))),
        kf_kp_pt=m.kf_kp_pt.at[slot].set(
            jnp.pad(kp_pt, (0, pad), constant_values=-1)),
    )


@jax.jit
def _jit_remove_kf(m: SlamMap, slot):
    """Invalidate keyframe ``slot``: full-array masks, one program."""
    hit = m.obs_valid & (m.obs_kf == slot)
    dec = jnp.zeros_like(m.n_obs).at[m.obs_pt].add(
        hit.astype(m.n_obs.dtype))
    return m._replace(
        obs_valid=m.obs_valid & ~hit,
        n_obs=m.n_obs - dec,
        kf_valid=m.kf_valid.at[slot].set(False),
        kf_kp_pt=m.kf_kp_pt.at[slot].set(-1),
        kf_kp_valid=m.kf_kp_valid.at[slot].set(False),
    )


@partial(jax.jit, static_argnames=())
def _triangulate_world(R1, t1, R2, t2, K, x1, x2):
    """Triangulate matched undistorted pixels into world points given two
    world-to-camera poses."""
    from ..geometry.triangulate import triangulate_dlt

    P1 = jnp.matmul(K, jnp.concatenate([R1, t1[:, None]], axis=1), precision=_HI)[None]
    P2 = jnp.matmul(K, jnp.concatenate([R2, t2[:, None]], axis=1), precision=_HI)[None]
    return triangulate_dlt(P1, P2, x1[None], x2[None])[0]


@partial(jax.jit, static_argnames=("mcfg", "scale_factor"))
def _covis_match_triangulate(nb_desc, nb_xy, nb_oct, nb_ang, nb_valid,
                             cur_desc, cur_xy, cur_oct, cur_ang, cur_valid,
                             R_nb, t_nb, R_cur, t_cur, K,
                             mcfg, scale_factor: float):
    """CreateNewMapPoints' heavy work for ALL covisible neighbors in one
    program: epipolar-gated matching (SearchForTriangulation), DLT
    triangulation, and the cheirality / per-octave reprojection-chi2 /
    parallax vetting — vmapped over the neighbor axis, so a keyframe
    insert costs ONE device round trip for matching+triangulation
    instead of three per neighbor.

    Returns per-neighbor [B, N1]: matches (into the current keyframe's
    keypoints), world points, and the vet mask.
    """
    from ..geometry.fundamental import fundamental_from_poses
    from ..geometry.triangulate import triangulate_dlt

    def per(nbd, nbxy, nboct, nbang, nbv, Rn, tn):
        F21 = fundamental_from_poses(Rn, tn, R_cur, t_cur, K)
        res = search_for_triangulation(
            nbd, nbxy, nboct, nbang, nbv,
            cur_desc, cur_xy, cur_oct, cur_ang, cur_valid,
            F21, mcfg, scale_factor,
        )
        m12 = res.matches12                     # [N1]
        has = m12 >= 0
        i2 = jnp.clip(m12, 0)
        x2 = cur_xy[i2]
        P1 = jnp.matmul(K, jnp.concatenate([Rn, tn[:, None]], axis=1), precision=_HI)
        P2 = jnp.matmul(K, jnp.concatenate([R_cur, t_cur[:, None]], axis=1), precision=_HI)
        pts = triangulate_dlt(P1[None], P2[None], nbxy[None], x2[None])[0]

        def chi2(R, t, uv):
            pc = jnp.matmul(pts, R.T, precision=_HI) + t
            z = pc[:, 2]
            zi = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
            u = K[0, 0] * pc[:, 0] / zi + K[0, 2]
            v = K[1, 1] * pc[:, 1] / zi + K[1, 2]
            return (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2, z

        err1, z1 = chi2(Rn, tn, nbxy)
        err2, z2 = chi2(R_cur, t_cur, x2)
        s2_1 = scale_factor ** (2.0 * nboct.astype(jnp.float32))
        s2_2 = scale_factor ** (2.0 * cur_oct[i2].astype(jnp.float32))
        o1 = -jnp.matmul(Rn.T, tn, precision=_HI)
        o2 = -jnp.matmul(R_cur.T, t_cur, precision=_HI)
        r1 = pts - o1
        r2 = pts - o2
        cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(
            jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1),
            1e-12)
        ok = (has & jnp.isfinite(pts).all(-1)
              & (z1 > 0.05) & (z2 > 0.05)
              & (err1 < 5.991 * s2_1) & (err2 < 5.991 * s2_2)
              & (cosp < 0.9998))
        return m12, pts, ok

    return jax.vmap(per)(nb_desc, nb_xy, nb_oct, nb_ang, nb_valid,
                         R_nb, t_nb)


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
        # keypoint snapshots must hold the larger init-time extraction
        kp_cap = max(cfg.orb.max_keypoints, cfg.init_orb.max_keypoints)
        self.map = empty_map(cfg.tracker, kp_cap)
        self.state = TrackState.NO_IMAGES_YET
        self.frame_id = -1
        self.ref: Optional[_FrameSnap] = None       # init reference frame
        self.R = np.eye(3, dtype=np.float32)        # world-to-camera
        self.t = np.zeros(3, dtype=np.float32)
        self.vel_R = np.eye(3, dtype=np.float32)    # T_cur o T_prev^-1
        self.vel_t = np.zeros(3, dtype=np.float32)
        self.have_velocity = False
        self.frames_since_kf = 0
        self.n_kf = 0                 # count of live keyframes
        self.kf_insert_count = 0      # monotone insert counter (point ages)
        self.last_kf_slot = -1        # newest keyframe's slot (recycled ids)
        self.kf_ref_inliers = 0  # tracked-point count of the last keyframe
        self.trajectory: list = []                  # (frame_id, ts, R, t)
        self._key = jax.random.PRNGKey(0)
        self.vocab = None                           # trained at map init
        self.kf_db = None                           # BoW keyframe database
        self.loop_closer = None                     # created on first KF

    # ------------------------------------------------------------------
    def track(self, image, timestamp: float) -> dict:
        """Process one grayscale frame; returns a per-frame metrics dict
        (the structured equivalent of the reference's cout diagnostics,
        SURVEY.md §5.5)."""
        self.frame_id += 1
        cfg = self.cfg
        img = jnp.asarray(image, jnp.float32)
        metrics = {
            "frame_id": self.frame_id, "state": TrackState.NAMES[self.state],
        }

        if self.state == TrackState.WORKING:
            # extraction happens INSIDE the fused device step
            metrics.update(self._track_working(img, timestamp))
        else:
            init_phase = self.state in (
                TrackState.NO_IMAGES_YET, TrackState.NOT_INITIALIZED,
                TrackState.INITIALIZING,
            )
            ocfg = cfg.init_orb if init_phase else cfg.orb
            kps = orb_extract(img, ocfg)
            xy_un = camera.undistort_pixels(cfg.camera, kps.xy)
            n_kps = int(kps.count())
            metrics["n_kps"] = n_kps
            if self.state in (TrackState.NO_IMAGES_YET, TrackState.NOT_INITIALIZED):
                self._deal_first_frame(kps, xy_un, n_kps, timestamp)
            elif self.state == TrackState.INITIALIZING:
                metrics.update(self._try_initialize(kps, xy_un, n_kps, timestamp))
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
            pt_birth_kf=m.pt_birth_kf.at[slots].set(0),
            pt_visible=m.pt_visible.at[slots].set(1),
            pt_found=m.pt_found.at[slots].set(1),
        )
        # observations for both keyframes
        uv0 = np.asarray(self.ref.xy_un)[p[:, 0]]
        uv1 = np.asarray(xy_un)[p[:, 1]]
        o0 = np.arange(G)
        o1 = np.arange(G, 2 * G)
        m = m._replace(
            obs_kf=m.obs_kf.at[o0].set(0).at[o1].set(1),
            obs_pt=m.obs_pt.at[o0].set(jnp.asarray(slots)).at[o1].set(jnp.asarray(slots)),
            obs_kp=m.obs_kp.at[o0].set(jnp.asarray(p[:, 0]))
                           .at[o1].set(jnp.asarray(p[:, 1])),
            obs_uv=m.obs_uv.at[o0].set(jnp.asarray(uv0)).at[o1].set(jnp.asarray(uv1)),
            obs_inv_sigma2=m.obs_inv_sigma2.at[o0].set(1.0).at[o1].set(jnp.asarray(inv_s2)),
            obs_valid=m.obs_valid.at[o0].set(True).at[o1].set(True),
        )
        # keyframe keypoint snapshots (Frame::mvKeysUn/mvpMapPoints)
        kp_pt0 = np.full(self.ref.kps.valid.shape[0], -1, np.int32)
        kp_pt0[p[:, 0]] = slots
        kp_pt1 = np.full(kps.valid.shape[0], -1, np.int32)
        kp_pt1[p[:, 1]] = slots
        m = self._write_kf_snapshot(
            m, 0, self.ref.kps, self.ref.xy_un, kp_pt0,
            np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
            self.ref.frame_id)
        m = self._write_kf_snapshot(
            m, 1, kps, xy_un, kp_pt1, R21, t21.astype(np.float32),
            self.frame_id)
        self.map = m
        self.n_kf = 2
        self.kf_insert_count = 2
        self.last_kf_slot = 1
        self.R, self.t = R21, t21.astype(np.float32)
        self.have_velocity = False
        self.frames_since_kf = 0
        self.kf_ref_inliers = G
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
        self._refresh_viewing_stats()
        # place-recognition vocabulary from the init descriptors (the
        # reference would load a pretrained DBoW2 vocabulary here)
        if self.cfg.tracker.use_bow:
            self._init_bow(kps)
            self._bow_add(0, self.ref.kps)
            self._bow_add(1, kps)
        self.state = TrackState.WORKING

    # ------------------------------------------------------------------
    def _get_fused(self, wide: bool):
        """Lazily build the two fused-step variants (normal / 2x stage-1
        window for the low-match retry)."""
        from .fused_step import make_tracking_step

        attr = "_fused_wide" if wide else "_fused"
        fn = getattr(self, attr, None)
        if fn is None:
            cfg = self.cfg
            fn = make_tracking_step(
                cfg.camera, cfg.orb, cfg.matcher, cfg.tracker,
                radius_scale=2.0 if wide else 1.0,
            )
            setattr(self, attr, fn)
        return fn

    def _track_working(self, img, timestamp) -> dict:
        """One fused device program per frame: extract -> project-match ->
        two-stage pose LM (see slam/fused_step.py). Host keeps only the
        constant-velocity prediction, the low-match retry, and the
        keyframe decision."""
        cfg = self.cfg
        # constant-velocity prediction: T_pred = vel o T_cur
        if cfg.tracker.use_motion_model and self.have_velocity:
            R_pred = self.vel_R @ self.R
            t_pred = self.vel_R @ self.t + self.vel_t
        else:
            R_pred, t_pred = self.R, self.t

        out = {}
        m = self.map
        args = (
            m.pts, m.desc, m.pt_valid,
            m.pt_normal, m.pt_dmin, m.pt_dmax,
            jnp.asarray(R_pred), jnp.asarray(t_pred),
            jnp.asarray(self.R), jnp.asarray(self.t), self.K,
        )
        r = self._get_fused(False)(img, *args)
        if int(r.n_matches1) < 20:
            r = self._get_fused(True)(img, *args)
        kps, xy_un = r.kps, r.xy_un
        out["n_kps"] = int(r.n_kps)
        out["n_proj_matches"] = int(r.n_matches1)
        out["n_proj_matches_2"] = int(r.n_matches2)
        if int(r.n_matches1) < cfg.tracker.min_tracked_inliers:
            if self._track_reference_keyframe(kps, xy_un, out):
                return out
            self.state = TrackState.LOST
            out["lost"] = "too few projection matches"
            return out

        n_inl = int(r.n_inliers)
        out["n_inliers"] = n_inl
        # MapPoint mnVisible/mnFound tallies (found-ratio culling input)
        found = (r.kp_for_point >= 0) & m.pt_valid
        self.map = m._replace(
            pt_visible=m.pt_visible + (r.visible & m.pt_valid).astype(jnp.int32),
            pt_found=m.pt_found + found.astype(jnp.int32),
        )
        if n_inl < cfg.tracker.min_tracked_inliers:
            if self._track_reference_keyframe(kps, xy_un, out):
                return out
            self.state = TrackState.LOST
            out["lost"] = "too few pose inliers"
            return out

        R_new = np.asarray(r.R)
        t_new = np.asarray(r.t)
        # velocity = T_cur o T_prev^-1
        self.vel_R = R_new @ self.R.T
        self.vel_t = t_new - self.vel_R @ self.t
        self.have_velocity = True
        self.R, self.t = R_new, t_new
        self.frames_since_kf += 1

        if self._need_keyframe(n_inl):
            kf_out = self._insert_keyframe(kps, xy_un, r, timestamp)
            out.update(kf_out)
        return out

    def _track_reference_keyframe(self, kps, xy_un, out: dict) -> bool:
        """ORB-SLAM ``Tracking::TrackReferenceKeyFrame``: when motion-model
        projection matching fails (the reference declared this tier via
        ``UseMotionModel``/``mVelocity``, ``tracking.hpp:110-111`` — full
        ORB-SLAM falls back to BoW matching against the reference keyframe
        before declaring LOST). Matches the frame's descriptors against
        the newest keyframe's point-associated keypoints —
        vocabulary-node-restricted when a vocabulary exists (SearchByBoW,
        ratio 0.7) — then pose-only LM seeded from the LAST pose (no
        motion prediction, no PnP). On success updates the tracker in
        place and returns True; recovery happens in the SAME frame,
        whereas the LOST->relocalization path loses one.
        """
        if self.last_kf_slot < 0 or self.n_kf == 0:
            return False
        from ..ops.matcher import match_descriptors, match_descriptors_bow

        cfg = self.cfg
        m = self.map
        slot = self.last_kf_slot
        kf_pt = np.asarray(m.kf_kp_pt[slot])
        pt_valid = np.asarray(m.pt_valid)
        v_ref = (np.asarray(m.kf_kp_valid[slot]) & (kf_pt >= 0)
                 & pt_valid[np.clip(kf_pt, 0, m.point_capacity - 1)])
        if int(v_ref.sum()) < 15:
            return False
        if self.vocab is not None:
            from ..bow.vocabulary import direct_index_nodes, transform

            w1, _ = transform(self.vocab, m.kf_kp_desc[slot],
                              jnp.asarray(v_ref))
            w2, _ = transform(self.vocab, kps.desc, kps.valid)
            m12 = match_descriptors_bow(
                m.kf_kp_desc[slot], jnp.asarray(v_ref),
                direct_index_nodes(self.vocab, w1),
                kps.desc, kps.valid,
                direct_index_nodes(self.vocab, w2), ratio=0.7)
        else:
            m12 = match_descriptors(
                m.kf_kp_desc[slot], jnp.asarray(v_ref),
                kps.desc, kps.valid, ratio=0.7)
        mnp = np.asarray(m12)
        sel = np.where(mnp >= 0)[0]  # ref-KF keypoint rows with a match
        # ORB-SLAM requires >=15 BoW matches before attempting the pose
        if len(sel) < 15:
            return False

        # pose-only LM over the matched 2D-3D pairs (same fixed problem
        # shape as relocalization so the jit cache is shared)
        M = m.point_capacity
        pts_m = np.zeros((M, 3), np.float32)
        uv_m = np.zeros((M, 2), np.float32)
        w_m = np.ones(M, np.float32)
        valid_m = np.zeros(M, bool)
        n = len(sel)
        pt_idx = kf_pt[sel]
        pts_m[:n] = np.asarray(m.pts)[pt_idx]
        uv_m[:n] = np.asarray(xy_un)[mnp[sel]]
        oct_np = np.asarray(kps.octave)[mnp[sel]].astype(np.float32)
        w_m[:n] = 1.0 / cfg.orb.scale_factor ** (2.0 * oct_np)
        valid_m[:n] = True
        res = optimize_pose(
            jnp.asarray(self.R), jnp.asarray(self.t), jnp.asarray(pts_m),
            jnp.asarray(uv_m), jnp.asarray(w_m), jnp.asarray(valid_m),
            self.K,
        )
        n_inl = int(res.n_inliers)
        if n_inl < max(10, cfg.tracker.min_tracked_inliers // 2):
            return False

        out["ref_kf_track"] = {"kf": slot, "n_bow": n, "n_inliers": n_inl}
        out["n_inliers"] = n_inl
        R_new = np.asarray(res.R)
        t_new = np.asarray(res.t)
        self.vel_R = R_new @ self.R.T
        self.vel_t = t_new - self.vel_R @ self.t
        self.have_velocity = True
        self.R, self.t = R_new, t_new
        self.frames_since_kf += 1
        return True

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

    def _write_kf_snapshot(self, m: SlamMap, slot: int, kps, xy_un, kp_pt,
                           R, t, frame_id):
        """Store the keyframe's pose AND keypoint snapshot (the data
        ``Frame.hpp:79-93`` keeps per frame: mvKeysUn, mDescriptors,
        mvpMapPoints) in one jitted program. ``kp_pt``: [n] int32
        map-point slot per keypoint."""
        N = m.kp_capacity
        n = kps.valid.shape[0]
        if n > N:
            raise ValueError(f"keypoint capacity {n} exceeds snapshot {N}")
        return _jit_write_kf(m, slot, kps.desc, kps.octave, kps.angle_deg,
                             kps.valid, xy_un, jnp.asarray(kp_pt, jnp.int32),
                             jnp.asarray(R), jnp.asarray(t), frame_id)

    def _insert_keyframe(self, kps, xy_un, assoc, timestamp=0.0) -> dict:
        """Insert the current frame as a keyframe, then run the
        tracking-side slice of ORB-SLAM's local mapping: covisibility
        triangulation + fusion, map-point culling, keyframe culling,
        local BA. ``assoc`` carries the final point->keypoint association
        and the pose-opt inlier mask (a FusedStepResult)."""
        cfg = self.cfg
        m = self.map
        slot = self._alloc_kf_slot()

        kp_idx = np.asarray(assoc.kp_for_point)
        inl = np.asarray(assoc.inlier)
        tracked_pts = np.where(inl & (kp_idx >= 0))[0]
        uv_np = np.asarray(xy_un)
        oct_np = np.asarray(kps.octave)

        kp_pt = np.full(kps.valid.shape[0], -1, np.int32)
        kp_pt[kp_idx[tracked_pts]] = tracked_pts
        # pose + snapshot in one jitted program (_jit_write_kf)
        m = self._write_kf_snapshot(m, slot, kps, xy_un, kp_pt,
                                    self.R, self.t, self.frame_id)

        # observations of tracked points (recycled slots; one bucketed
        # jitted scatter instead of an eager per-insert chain)
        rows = free_slots(m.obs_valid, len(tracked_pts))
        n_add = len(rows)
        if n_add > 0:
            sel = tracked_pts[:n_add]
            inv_s2 = (1.0 / cfg.orb.scale_factor ** (2 * oct_np[kp_idx[sel]])).astype(np.float32)
            cap = _pow2_bucket(n_add)
            ok = np.arange(cap) < n_add
            m = _scatter_obs(
                m, slot,
                jnp.asarray(_pad_to(rows.astype(np.int32), cap)),
                jnp.asarray(_pad_to(sel.astype(np.int32), cap)),
                jnp.asarray(_pad_to(kp_idx[sel].astype(np.int32), cap)),
                jnp.asarray(_pad_to(uv_np[kp_idx[sel]].astype(np.float32), cap)),
                jnp.asarray(_pad_to(inv_s2, cap)),
                jnp.asarray(ok), 0,
            )

        self.map = m
        self.kf_insert_count += 1
        self.last_kf_slot = slot
        out = {"kf": f"inserted slot {slot}", "kf_obs": int(n_add)}

        # --- covisibility-graph triangulation + fuse ---
        new_n, fused_n = self._create_new_points_covis(slot)
        out["kf_new_points"] = new_n
        out["kf_fused"] = fused_n

        # --- lifecycle: point + keyframe culling ---
        out["culled_points"] = self._cull_points()
        out["culled_kfs"] = self._cull_keyframes()

        # --- local bundle adjustment over the keyframe window ---
        # (without BA the init map's correlated depth noise makes the
        # best-fit pose drift as baselines grow; this is why full ORB-SLAM
        # runs local BA after every keyframe)
        ba_out = self._local_ba(slot)
        out.update(ba_out)

        # refresh per-point viewing statistics (normals + scale-distance
        # envelope) now that BA moved points/keyframes — the batch analog
        # of MapPoint::UpdateNormalAndDepth after local mapping
        self._refresh_viewing_stats()

        self._bow_add(slot, kps)

        # --- loop closing (LoopClosing thread slice: BoW candidates ->
        # Sim(3) -> essential-graph correction; slam/loop_closing.py) ---
        if self.cfg.tracker.use_loop_closing and self.kf_db is not None:
            if self.loop_closer is None:
                from .loop_closing import LoopCloser

                self.loop_closer = LoopCloser(self.cfg, np.asarray(self.K),
                                              vocab=self.vocab)
            self.map, loop_info = self.loop_closer.on_keyframe(
                self.map, self.kf_db, slot)
            out.update(loop_info)
            if str(loop_info.get("loop", "")).startswith("closed"):
                # resync the live pose to the corrected keyframe and reset
                # the motion model (ORB-SLAM CorrectLoop does the same)
                self.R = np.asarray(self.map.kf_R[slot]).copy()
                self.t = np.asarray(self.map.kf_t[slot]).copy()
                self.vel_R = np.eye(3, dtype=np.float32)
                self.vel_t = np.zeros(3, dtype=np.float32)
                self._refresh_viewing_stats()

        self.n_kf = int(np.asarray(self.map.kf_valid).sum())
        self.frames_since_kf = 0
        self.kf_ref_inliers = int(n_add) + new_n
        return out

    def _refresh_viewing_stats(self):
        """Batch MapPoint::UpdateNormalAndDepth over the whole map (one
        jitted segment-sum program; see slam.map.update_normal_and_depth)."""
        from .map import update_normal_and_depth

        ocfg = self.cfg.orb
        self.map = update_normal_and_depth(
            self.map, ocfg.scale_factor, ocfg.n_levels
        )

    # -------------------- local-mapping slice --------------------
    def _alloc_kf_slot(self) -> int:
        """First free keyframe slot; when the map is at capacity, evict the
        most redundant keyframe (same score as KeyFrameCulling, without
        the 90% bar) so tracking never stalls at "capacity full"."""
        m = self.map
        kf_valid = np.asarray(m.kf_valid)
        free = np.where(~kf_valid)[0]
        if len(free):
            return int(free[0])
        scores = self._kf_redundancy()
        fids = np.asarray(m.kf_frame_id)
        protect = self._protected_kfs()
        scores = np.where(np.isin(np.arange(m.kf_capacity), list(protect)),
                          -np.inf, scores)
        # most redundant; ties broken toward the oldest
        best = np.lexsort((fids, -scores))[0]
        self._remove_keyframe(int(best))
        return int(best)

    def _protected_kfs(self) -> set:
        """Keyframes never culled/evicted: the oldest (the gauge anchor)
        and the two most recent (active triangulation partners)."""
        m = self.map
        kf_valid = np.asarray(m.kf_valid)
        fids = np.asarray(m.kf_frame_id)
        vs = np.where(kf_valid)[0]
        if len(vs) == 0:
            return set()
        by_recent = vs[np.argsort(-fids[vs])]
        prot = set(by_recent[:2].tolist())
        prot.add(int(vs[np.argmin(fids[vs])]))
        return prot

    def _kf_redundancy(self) -> np.ndarray:
        """Per-keyframe fraction of its observed points that are seen by
        >= 4 keyframes (ORB-SLAM KeyFrameCulling's redundancy measure,
        without the per-scale refinement)."""
        m = self.map
        Kc = m.kf_capacity
        obs_valid = np.asarray(m.obs_valid)
        obs_kf = np.asarray(m.obs_kf)
        obs_pt = np.asarray(m.obs_pt)
        n_obs = np.asarray(m.n_obs)
        red = np.asarray(obs_valid & (n_obs[obs_pt] >= 4), np.float64)
        tot = np.bincount(obs_kf, weights=obs_valid, minlength=Kc)
        hit = np.bincount(obs_kf, weights=red, minlength=Kc)
        return hit / np.maximum(tot, 1.0)

    def _remove_keyframe(self, slot: int) -> None:
        """Invalidate a keyframe: drop its observations, decrement its
        points' observation counts, clear its snapshot associations, and
        unindex it from the BoW database. One fixed-shape jitted program
        (full-array masks instead of data-dependent row scatters)."""
        self.map = _jit_remove_kf(self.map, slot)
        if self.kf_db is not None:
            from ..bow.database import remove_keyframe

            self.kf_db = remove_keyframe(self.kf_db, slot)

    def _cull_points(self) -> int:
        """ORB-SLAM MapPointCulling: drop points that failed to gather
        >= cull_min_obs keyframe observations within cull_age_kfs
        keyframes of creation, or whose tracking found/visible ratio
        collapsed. Freed slots are recycled by later creations."""
        cfg = self.cfg.tracker
        m = self.map
        valid = np.asarray(m.pt_valid)
        n_obs = np.asarray(m.n_obs)
        age = self.kf_insert_count - np.asarray(m.pt_birth_kf)
        vis = np.asarray(m.pt_visible)
        fnd = np.asarray(m.pt_found)
        bad = valid & (
            ((age >= cfg.cull_age_kfs) & (n_obs < cfg.cull_min_obs))
            | ((vis >= cfg.cull_min_visible)
               & (fnd < cfg.cull_found_ratio * vis))
        )
        n_bad = int(bad.sum())
        if n_bad == 0:
            return 0
        bad_mask = jnp.asarray(bad)
        obs_bad = bad_mask[m.obs_pt]
        snap_pt = m.kf_kp_pt
        snap_bad = bad_mask[jnp.clip(snap_pt, 0)] & (snap_pt >= 0)
        self.map = m._replace(
            pt_valid=m.pt_valid & ~bad_mask,
            obs_valid=m.obs_valid & ~obs_bad,
            kf_kp_pt=jnp.where(snap_bad, -1, snap_pt),
        )
        return n_bad

    def _cull_keyframes(self) -> int:
        """ORB-SLAM KeyFrameCulling: remove a keyframe when >= 90% of its
        points are redundantly observed (>= 4 keyframes). At most one per
        insert to bound churn."""
        cfg = self.cfg.tracker
        m = self.map
        kf_valid = np.asarray(m.kf_valid)
        counts = np.bincount(
            np.asarray(m.obs_kf), weights=np.asarray(m.obs_valid),
            minlength=m.kf_capacity,
        )
        red = self._kf_redundancy()
        protect = self._protected_kfs()
        cand = [
            k for k in np.where(kf_valid)[0]
            if k not in protect and counts[k] >= 10
            and red[k] >= cfg.kf_redundancy_frac
        ]
        if not cand:
            return 0
        victim = max(cand, key=lambda k: red[k])
        self._remove_keyframe(int(victim))
        return 1

    def _create_new_points_covis(self, slot: int):
        """ORB-SLAM CreateNewMapPoints: triangulate the current keyframe's
        unassociated keypoints against its best covisible keyframes
        (multi-scale, epipolar-gated), fusing candidates that duplicate an
        existing point's projection instead of creating them."""
        cfg = self.cfg
        tcfg = cfg.tracker
        m = self.map
        kf_kp_pt = np.asarray(m.kf_kp_pt)
        kf_valid = np.asarray(m.kf_valid)

        cur_assoc = kf_kp_pt[slot]
        pt_mask = np.zeros(m.point_capacity, bool)
        pt_mask[cur_assoc[cur_assoc >= 0]] = True
        shared = np.zeros(m.kf_capacity, np.int64)
        for k in np.where(kf_valid)[0]:
            if k == slot:
                continue
            assoc = kf_kp_pt[k]
            shared[k] = pt_mask[assoc[assoc >= 0]].sum()
        order = np.argsort(-shared)
        neighbors = [
            int(k) for k in order
            if kf_valid[k] and k != slot and shared[k] >= tcfg.covis_min_shared
        ][: tcfg.covis_keyframes]
        if not neighbors and shared.max() > 0:
            neighbors = [int(order[0])]

        R_cur = np.asarray(m.kf_R[slot])
        t_cur = np.asarray(m.kf_t[slot])
        K_np = np.asarray(self.K)
        if not neighbors:
            return 0, 0

        # ---- ONE device program for every neighbor: epipolar matching +
        # triangulation + vetting, vmapped over the neighbor axis ----
        kf_kp_pt_now = kf_kp_pt
        cur_free = kf_kp_pt_now[slot] < 0
        nbs = np.asarray(neighbors, np.int64)
        nb_free = kf_kp_pt_now[nbs] < 0                       # [B, N]
        nb_idx = jnp.asarray(nbs)
        m12_b, pts_b, ok_b = _covis_match_triangulate(
            m.kf_kp_desc[nb_idx], m.kf_kp_xy[nb_idx],
            m.kf_kp_octave[nb_idx], m.kf_kp_angle[nb_idx],
            m.kf_kp_valid[nb_idx] & jnp.asarray(nb_free),
            m.kf_kp_desc[slot], m.kf_kp_xy[slot], m.kf_kp_octave[slot],
            m.kf_kp_angle[slot],
            m.kf_kp_valid[slot] & jnp.asarray(cur_free),
            m.kf_R[nb_idx], m.kf_t[nb_idx],
            jnp.asarray(R_cur), jnp.asarray(t_cur), self.K,
            cfg.matcher, cfg.orb.scale_factor,
        )
        m12_b = np.asarray(m12_b)
        pts_b = np.asarray(pts_b)
        ok_b = np.asarray(ok_b)
        nb_xy_np = np.asarray(m.kf_kp_xy[nb_idx])
        nb_oct_np = np.asarray(m.kf_kp_octave[nb_idx])
        cur_xy_np = np.asarray(m.kf_kp_xy[slot])
        cur_oct_np = np.asarray(m.kf_kp_octave[slot])
        kp_desc_cur = np.asarray(m.kf_kp_desc[slot])
        fuse_r2 = tcfg.fuse_radius_px ** 2

        # host-side sequential consumption (the reference processes
        # neighbors in order: a current-keyframe keypoint consumed by an
        # earlier neighbor's creation/fusion is excluded for later ones)
        consumed = np.zeros(cur_xy_np.shape[0], bool)
        n_new_total = 0
        n_fused = 0
        for b, nb in enumerate(neighbors):
            m = self.map
            ok = ok_b[b] & ~consumed[np.clip(m12_b[b], 0, None)]
            i1 = np.where(ok)[0]
            if len(i1) == 0:
                continue
            i2 = m12_b[b][i1]
            # projections of existing points into the current frame, for
            # fuse — refreshed EVERY neighbor iteration so points created
            # against an earlier neighbor are visible to the duplicate
            # check for later neighbors
            pts_np = np.asarray(m.pts)
            pc = pts_np @ R_cur.T + t_cur
            zs = np.where(np.abs(pc[:, 2:]) < 1e-9, 1e-9, pc[:, 2:])
            proj = (pc[:, :2] / zs) @ K_np[:2, :2].T + K_np[:2, 2]
            proj_ok = np.asarray(m.pt_valid) & (pc[:, 2] > 0.05)
            map_desc_np = np.asarray(m.desc)
            created, fused = self._insert_triangulated(
                slot, nb, i1, i2, pts_b[b][i1],
                nb_oct_np[b][i1], cur_oct_np[i2],
                proj, proj_ok, map_desc_np, kp_desc_cur,
                cur_xy_np[i2], fuse_r2,
            )
            consumed[i2] = True
            n_new_total += created
            n_fused += fused
        return n_new_total, n_fused

    def _insert_triangulated(self, slot, nb, i1, i2, pts, oct1, oct2,
                             proj, proj_ok, map_desc_np, kp_desc_cur,
                             x2, fuse_r2):
        """Insert vetted triangulations, fusing with existing points whose
        projection coincides (ORB-SLAM's Fuse semantics at create time)."""
        cfg = self.cfg
        m = self.map
        n_cand = len(i1)
        if n_cand == 0:
            return 0, 0
        # duplicate detection against existing projected points — fully
        # vectorized over the (candidate, nearby-point) pairs: Hamming via
        # numpy's popcount instead of a per-element Python loop
        fuse_target = np.full(n_cand, -1, np.int64)
        if proj_ok.any():
            pidx = np.where(proj_ok)[0]
            d2 = (
                (proj[pidx, 0][None, :] - x2[:, 0][:, None]) ** 2
                + (proj[pidx, 1][None, :] - x2[:, 1][:, None]) ** 2
            )
            cc, pp = np.nonzero(d2 < fuse_r2)
            if len(cc):
                xor = kp_desc_cur[i2[cc]] ^ map_desc_np[pidx[pp]]
                hd = np.bitwise_count(xor).sum(axis=1).astype(np.int64)
                # per-candidate minimum: first row of each cc block after
                # an (cc, hd)-lexsort
                order = np.lexsort((hd, cc))
                first = np.ones(len(order), bool)
                first[1:] = cc[order][1:] != cc[order][:-1]
                win = order[first]
                ok_w = hd[win] <= cfg.matcher.th_low
                fuse_target[cc[win][ok_w]] = pidx[pp[win][ok_w]]

        fused_idx = np.where(fuse_target >= 0)[0]
        new_idx = np.where(fuse_target < 0)[0]
        obs_valid_np = np.array(m.obs_valid)  # writable host copy

        # fused candidates: associate the current keypoint to the existing
        # point (one extra observation for this keyframe)
        n_fused = 0
        if len(fused_idx):
            rows = free_slots(obs_valid_np, len(fused_idx))
            take = fused_idx[: len(rows)]
            tgt = fuse_target[take]
            inv_s2 = (1.0 / cfg.orb.scale_factor ** (2 * oct2[take])).astype(np.float32)
            n_fused = len(take)
            cap = _pow2_bucket(n_fused)
            ok = np.arange(cap) < n_fused
            m = _scatter_obs(
                m, slot,
                jnp.asarray(_pad_to(rows.astype(np.int32), cap)),
                jnp.asarray(_pad_to(tgt.astype(np.int32), cap)),
                jnp.asarray(_pad_to(i2[take].astype(np.int32), cap)),
                jnp.asarray(_pad_to(x2[take].astype(np.float32), cap)),
                jnp.asarray(_pad_to(inv_s2, cap)),
                jnp.asarray(ok), 1,
            )
            obs_valid_np[rows] = True

        # genuinely new points
        free_pts = free_slots(m.pt_valid, len(new_idx))
        n_new = len(free_pts)
        rows = free_slots(obs_valid_np, 2 * n_new)
        n_new = min(n_new, len(rows) // 2)
        if n_new > 0:
            take = new_idx[:n_new]
            slots = free_pts[:n_new]
            rows1 = rows[:n_new]
            rows2 = rows[n_new: 2 * n_new]
            uv1 = np.asarray(m.kf_kp_xy[nb])[i1[take]]
            uv2 = x2[take]
            inv1 = (1.0 / cfg.orb.scale_factor ** (2 * oct1[take])).astype(np.float32)
            inv2 = (1.0 / cfg.orb.scale_factor ** (2 * oct2[take])).astype(np.float32)
            cap = _pow2_bucket(n_new)
            ok = np.arange(cap) < n_new
            birth = np.full(cap, self.kf_insert_count, np.int32)
            m = _scatter_new_points(
                m, slot, nb,
                jnp.asarray(_pad_to(slots.astype(np.int32), cap)),
                jnp.asarray(_pad_to(rows1.astype(np.int32), cap)),
                jnp.asarray(_pad_to(rows2.astype(np.int32), cap)),
                jnp.asarray(_pad_to(i1[take].astype(np.int32), cap)),
                jnp.asarray(_pad_to(i2[take].astype(np.int32), cap)),
                jnp.asarray(_pad_to(pts[take].astype(np.float32), cap)),
                jnp.asarray(_pad_to(uv1.astype(np.float32), cap)),
                jnp.asarray(_pad_to(uv2.astype(np.float32), cap)),
                jnp.asarray(_pad_to(inv1, cap)),
                jnp.asarray(_pad_to(inv2, cap)),
                jnp.asarray(birth),
                jnp.asarray(ok),
            )
        self.map = m
        return int(n_new), int(n_fused)

    def _init_bow(self, kps):
        import numpy as _np

        from ..bow.database import empty_database
        from ..bow.vocabulary import build_vocabulary, load_vocabulary

        tcfg = self.cfg.tracker
        path = tcfg.vocab_path
        if path == "bundled":
            # default: the corpus-trained artifact shipped with the package
            # (the reference's workflow ships a pretrained ORBvoc the same
            # way); fall back to one-frame training if it is absent
            import os as _os

            data_dir = _os.path.join(
                _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                "data")
            # prefer the 100k-word corpus artifact (it wins the held-out
            # recall study, BASELINE.md round 4: recall@tau 0.625 vs
            # 0.417), fall back to the 10k one, then to one-frame training
            path = None
            for name in ("orbvoc_synth_k10_L5.npz",
                         "orbvoc_synth_k10_L4.npz"):
                cand = _os.path.join(data_dir, name)
                if _os.path.exists(cand):
                    path = cand
                    break
        if path is not None:
            # Pretrained-artifact path (the reference's workflow: ORBvoc
            # loaded at System construction, TemplatedVocabulary.h:229-265).
            self.vocab = load_vocabulary(path)
        else:
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
        # free = the `window` most recent keyframes by frame id (slots are
        # recycled, so slot order is not time order); the oldest keyframe
        # is always fixed as the gauge anchor
        kf_valid = np.asarray(m.kf_valid)
        fids = np.asarray(m.kf_frame_id)
        fixed = ~kf_valid
        vs = np.where(kf_valid)[0]
        if len(vs):
            by_recent = vs[np.argsort(-fids[vs])]
            recent = set(by_recent[:window].tolist())
            for k in vs:
                if int(k) not in recent:
                    fixed[k] = True
            fixed[vs[np.argmin(fids[vs])]] = True
        res = bundle_adjust(
            m.kf_R, m.kf_t, m.pts,
            m.obs_kf, m.obs_pt, m.obs_uv, m.obs_inv_sigma2, m.obs_valid,
            jnp.asarray(fixed), m.pt_valid, self.K,
            iterations=cfg.tracker.ba_iterations,
            max_free_cams=window,
            early_stop_rel=cfg.tracker.ba_early_stop_rel,
            segment_mode=cfg.tracker.ba_segment_mode,
        )
        # adopt poses/points and prune observations reclassified as
        # outliers (Frame.hpp:91-93's lifecycle; slam.map.apply_ba_result)
        from .map import apply_ba_result

        self.map = apply_ba_result(m, res)
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
        # BoW place recognition proposes candidate keyframes; the 2D-3D
        # search is RESTRICTED to the points those keyframes observe
        # (``TemplatedDatabase.h:35``'s query→candidates purpose — at real
        # map sizes the map-wide search both costs and mismatches more).
        cand_points = self.map.pt_valid
        if self.vocab is not None and self.n_kf > 0:
            from ..bow.database import query
            from ..bow.vocabulary import transform

            _, bow = transform(self.vocab, kps.desc, kps.valid)
            scores = np.asarray(query(self.kf_db, bow))
            reloc_kf = int(np.argmax(scores))
            k = min(cfg.tracker.reloc_bow_candidates, int(np.isfinite(scores).sum()))
            if k > 0:
                cands = np.argsort(-scores)[:k]
                cands = cands[np.isfinite(scores[cands])]
                assoc = np.asarray(self.map.kf_kp_pt)[cands]
                allowed = np.zeros(self.map.point_capacity, bool)
                allowed[assoc[assoc >= 0]] = True
                cand_points = self.map.pt_valid & jnp.asarray(allowed)

        # window-free 2D-3D matching: each candidate map point finds its
        # best frame keypoint (this direction keeps the candidate pool
        # small and the ratio test meaningful — most keypoints have no map
        # point); loose gates — RANSAC absorbs the resulting outliers
        m12 = match_descriptors(
            self.map.desc, cand_points, kps.desc, kps.valid,
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
            pt_normal=self.map.pt_normal, pt_dmin=self.map.pt_dmin,
            pt_dmax=self.map.pt_dmax, n_levels=cfg.orb.n_levels,
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
