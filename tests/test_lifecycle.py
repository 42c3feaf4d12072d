"""Map lifecycle: slot recycling, culling, fusion, covisibility
triangulation, and resume-then-relocalize.

Round-1's map ratcheted to fixed capacity and stalled ("capacity full");
these tests pin the ORB-SLAM lifecycle semantics (MapPointCulling,
KeyFrameCulling, CreateNewMapPoints against covisible keyframes, Fuse)
that keep a long run inside its static capacities."""

import numpy as np
import pytest

from orb_slam_tracking_tpu.config import (
    CameraConfig,
    OrbConfig,
    SystemConfig,
    TrackerConfig,
)
from orb_slam_tracking_tpu.slam import Tracker, TrackState
from orb_slam_tracking_tpu.slam.checkpoint import load_tracker, save_tracker
from orb_slam_tracking_tpu.utils.synthetic import (
    CornerField,
    make_trajectory,
    render_frame,
)

CAM = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0, width=640, height=480)


def _small_cfg(**kw):
    tk = dict(max_map_points=1024, max_keyframes=8, ba_window=6,
              max_frames=4, use_bow=False)
    tk.update(kw)
    return SystemConfig(
        camera=CAM, orb=OrbConfig(n_features=1000),
        tracker=TrackerConfig(**tk),
    )


def test_long_run_stays_within_capacity(rng):
    """With only 8 keyframe slots and aggressive keyframe insertion, a
    40-frame run must keep inserting keyframes (recycling slots via
    culling/eviction) instead of stalling at capacity."""
    cfg = _small_cfg()
    field = CornerField(rng, n=900)
    poses = make_trajectory(40, "strafe")
    tr = Tracker(cfg)
    kf_events = []
    for i, (R, t) in enumerate(poses):
        m = tr.track(render_frame(field, CAM, R, t), i / 30.0)
        if "kf" in m:
            kf_events.append(m["kf"])
    assert tr.state == TrackState.WORKING
    assert not any("capacity" in e or "no slot" in e for e in kf_events)
    # more keyframes were inserted over the run than there are slots
    assert tr.kf_insert_count > cfg.tracker.max_keyframes
    # live count stays within capacity; slots were recycled
    assert tr.n_kf <= cfg.tracker.max_keyframes
    # point count bounded (culling prevents a pure ratchet)
    assert int(tr.map.n_points()) <= cfg.tracker.max_map_points
    # observation list did not exhaust
    assert int(np.asarray(tr.map.obs_valid).sum()) < tr.map.obs_valid.shape[0]


def test_culled_points_free_slots_and_consistency(rng):
    cfg = _small_cfg()
    field = CornerField(rng, n=900)
    poses = make_trajectory(30, "strafe")
    tr = Tracker(cfg)
    culled = 0
    for i, (R, t) in enumerate(poses):
        m = tr.track(render_frame(field, CAM, R, t), i / 30.0)
        culled += m.get("culled_points", 0)
    # consistency: every valid observation points at a valid point and a
    # valid keyframe; every snapshot association points at a valid point
    mp = tr.map
    ov = np.asarray(mp.obs_valid)
    assert np.asarray(mp.pt_valid)[np.asarray(mp.obs_pt)[ov]].all()
    assert np.asarray(mp.kf_valid)[np.asarray(mp.obs_kf)[ov]].all()
    snap = np.asarray(mp.kf_kp_pt)
    assoc = snap[snap >= 0]
    assert np.asarray(mp.pt_valid)[assoc].all()
    # n_obs matches the observation list for valid points
    counts = np.bincount(
        np.asarray(mp.obs_pt)[ov], minlength=mp.point_capacity
    )
    valid = np.asarray(mp.pt_valid)
    np.testing.assert_array_equal(
        counts[valid], np.asarray(mp.n_obs)[valid]
    )


def test_covisibility_triangulation_multi_scale(rng):
    """New points triangulate against covisible keyframes at ALL octaves
    (the round-1 path reused the octave-0-only init matcher)."""
    cfg = _small_cfg(max_map_points=2048, max_keyframes=16, max_frames=3)
    field = CornerField(rng, n=900)
    poses = make_trajectory(26, "strafe")
    tr = Tracker(cfg)
    new_pts = 0
    for i, (R, t) in enumerate(poses):
        m = tr.track(render_frame(field, CAM, R, t), i / 30.0)
        new_pts += m.get("kf_new_points", 0)
    assert new_pts > 30
    # some observations carry non-unit information => octave > 0 keypoints
    mp = tr.map
    ov = np.asarray(mp.obs_valid)
    assert (np.asarray(mp.obs_inv_sigma2)[ov] < 0.99).any()


def test_resume_then_relocalize(rng, tmp_path):
    """Checkpoint a BoW-enabled tracker, resume it in a fresh process
    stand-in, force LOST, verify recovery (vocab + database round-trip +
    BoW-candidate-restricted matching)."""
    cfg = _small_cfg(max_map_points=2048, max_keyframes=16, use_bow=True,
                     max_frames=18)
    field = CornerField(rng, n=900)
    poses = make_trajectory(26, "strafe")
    frames = [render_frame(field, CAM, R, t) for R, t in poses]
    tr = Tracker(cfg)
    for i in range(16):
        tr.track(frames[i], i / 30.0)
    assert tr.state == TrackState.WORKING
    assert tr.vocab is not None
    path = str(tmp_path / "ckpt.npz")
    save_tracker(tr, path)

    tr2 = Tracker(cfg)
    load_tracker(tr2, path)
    assert tr2.vocab is not None and tr2.kf_db is not None
    # force LOST on the resumed tracker, then recover on real frames
    blank = np.zeros_like(frames[0])
    for i in range(3):
        tr2.track(blank, (16 + i) / 30.0)
    assert tr2.state == TrackState.LOST
    recovered = False
    for i in range(19, 26):
        m = tr2.track(frames[min(i, 25)], i / 30.0)
        if tr2.state == TrackState.WORKING:
            recovered = True
            break
    assert recovered, m
    # the BoW index proposed a real keyframe (not the -1 fallback)
    assert m.get("reloc_kf", -1) >= 0
