"""Device-side local mapping: the whole keyframe slice (snapshot,
observations, covisibility triangulation, fusion, culling, local BA)
inside ONE jitted scan (slam/device_mapping.py).

Bootstraps with the host Tracker (two-view init + first keyframes), then
hands the live map to the device loop for the rest of the sequence and
checks the estimated trajectory against ground truth plus map-growth
invariants — proving the on-chip lifecycle does the same job the
host-orchestrated one does.
"""

import jax.numpy as jnp
import numpy as np

from orb_slam_tracking_tpu.config import (
    CameraConfig,
    OrbConfig,
    SystemConfig,
    TrackerConfig,
)
from orb_slam_tracking_tpu.slam import Tracker, TrackState
from orb_slam_tracking_tpu.slam.device_mapping import (
    make_device_sequence_loop,
)
from orb_slam_tracking_tpu.utils.synthetic import (
    CornerField,
    make_trajectory,
    render_frame,
)

CAM = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                   width=640, height=480)


def test_device_loop_tracks_and_grows_map(rng):
    cfg = SystemConfig(
        camera=CAM,
        orb=OrbConfig(n_features=1000),
        tracker=TrackerConfig(
            max_map_points=1024, max_keyframes=12, ba_window=4,
            ba_iterations=4, max_frames=5, use_loop_closing=False,
            use_bow=False,
        ),
    )
    field = CornerField(rng, n=900)
    n_frames = 36
    poses = make_trajectory(n_frames, "strafe")
    frames = [render_frame(field, CAM, R, t) for R, t in poses]

    # host bootstrap: init + settle until WORKING with a live map
    tr = Tracker(cfg)
    i = 0
    while i < n_frames and tr.state != TrackState.WORKING:
        tr.track(frames[i], i / 30.0)
        i += 1
    assert tr.state == TrackState.WORKING, "bootstrap failed"
    boot_end = i
    n_kf0 = int(np.asarray(tr.map.kf_valid).sum())
    n_obs0 = int(np.asarray(tr.map.obs_valid).sum())

    run = make_device_sequence_loop(
        cfg.camera, cfg.orb, cfg.matcher, cfg.tracker,
        tri_cap=64, obs_cap=256,
    )
    images = jnp.asarray(
        np.stack(frames[boot_end:]).astype(np.float32))
    m_final, outs = run(
        images, tr.map, jnp.asarray(tr.R), jnp.asarray(tr.t), tr.K,
        jnp.int32(tr.frame_id + 1), jnp.int32(tr.kf_insert_count),
        jnp.int32(max(tr.kf_ref_inliers, 1)),
    )

    lost = np.asarray(outs.lost)
    assert not lost.any(), f"device loop lost frames: {np.where(lost)[0]}"

    # keyframes inserted and the map grew on device
    ins = np.asarray(outs.inserted_kf)
    assert ins.sum() >= 2, f"no keyframes inserted on device: {ins}"
    assert int(np.asarray(m_final.kf_valid).sum()) > n_kf0
    assert int(np.asarray(m_final.obs_valid).sum()) > n_obs0

    # pose accuracy vs ground truth: rotation error bounded and not
    # ratcheting across the device-tracked span
    Rs = np.asarray(outs.R)
    rot_errs = []
    for k in range(len(Rs)):
        Rg, _ = poses[boot_end + k]
        rot_errs.append(float(np.degrees(np.arccos(np.clip(
            (np.trace(Rs[k].T @ Rg) - 1) / 2, -1, 1)))))
    assert max(rot_errs) - min(rot_errs) < 2.0, rot_errs

    # monocular-scale-consistent translation: direction of the camera
    # centre displacement matches GT
    ts = np.asarray(outs.t)
    c_est = -np.einsum("kij,kj->ki", Rs.transpose(0, 2, 1), ts)
    c_gt = np.stack([-poses[boot_end + k][0].T @ poses[boot_end + k][1]
                     for k in range(len(Rs))])
    d_est = c_est[-1] - c_est[0]
    d_gt = c_gt[-1] - c_gt[0]
    cos = float(d_est @ d_gt / (np.linalg.norm(d_est)
                                * np.linalg.norm(d_gt) + 1e-12))
    assert cos > 0.98, cos


def test_device_loop_is_jit_pure(rng):
    """Two runs from the same inputs produce identical outputs (the loop
    is one pure program: no hidden host state)."""
    cfg = SystemConfig(
        camera=CAM,
        orb=OrbConfig(n_features=1000),
        tracker=TrackerConfig(
            max_map_points=1024, max_keyframes=12, ba_window=4,
            ba_iterations=2, max_frames=5, use_loop_closing=False,
            use_bow=False,
        ),
    )
    field = CornerField(rng, n=900)
    poses = make_trajectory(20, "strafe")
    frames = [render_frame(field, CAM, R, t) for R, t in poses]
    tr = Tracker(cfg)
    i = 0
    while i < 20 and tr.state != TrackState.WORKING:
        tr.track(frames[i], i / 30.0)
        i += 1
    assert tr.state == TrackState.WORKING
    run = make_device_sequence_loop(
        cfg.camera, cfg.orb, cfg.matcher, cfg.tracker,
        tri_cap=64, obs_cap=256,
    )
    images = jnp.asarray(np.stack(frames[i:]).astype(np.float32))
    args = (images, tr.map, jnp.asarray(tr.R), jnp.asarray(tr.t), tr.K,
            jnp.int32(tr.frame_id + 1), jnp.int32(tr.kf_insert_count),
            jnp.int32(max(tr.kf_ref_inliers, 1)))
    m1, o1 = run(*args)
    m2, o2 = run(*args)
    np.testing.assert_array_equal(np.asarray(o1.R), np.asarray(o2.R))
    np.testing.assert_array_equal(np.asarray(m1.pts), np.asarray(m2.pts))
    np.testing.assert_array_equal(
        np.asarray(m1.obs_valid), np.asarray(m2.obs_valid))


def test_device_loop_recovers_from_blackout(rng):
    """The LOST-recovery tier (wide-radius re-match + widened-basin pose
    LM under lax.cond): a mid-sequence sensor blackout (blank frames)
    loses tracking; once frames return the loop must re-acquire INSIDE
    the scan and finish with bounded rotation error. With the tier
    disabled the same sequence must do no better — proving the tier is
    what recovers."""
    tcfg = dict(
        max_map_points=1024, max_keyframes=12, ba_window=4,
        ba_iterations=4, max_frames=5, use_loop_closing=False,
        use_bow=False,
    )
    cfg = SystemConfig(
        camera=CAM, orb=OrbConfig(n_features=1000),
        tracker=TrackerConfig(**tcfg),
    )
    field = CornerField(rng, n=900)
    n_frames = 40
    poses = make_trajectory(n_frames, "strafe")
    frames = [render_frame(field, CAM, R, t) for R, t in poses]

    tr = Tracker(cfg)
    i = 0
    while i < n_frames and tr.state != TrackState.WORKING:
        tr.track(frames[i], i / 30.0)
        i += 1
    assert tr.state == TrackState.WORKING, "bootstrap failed"
    boot_end = i

    # blackout: 6 frames of zeros while the camera keeps moving
    imgs = np.stack(frames[boot_end:]).astype(np.float32)
    b0 = 6
    imgs[b0:b0 + 6] = 0.0

    args_tail = (jnp.asarray(tr.R), jnp.asarray(tr.t), tr.K,
                 jnp.int32(tr.frame_id + 1), jnp.int32(tr.kf_insert_count),
                 jnp.int32(max(tr.kf_ref_inliers, 1)))

    run = make_device_sequence_loop(
        cfg.camera, cfg.orb, cfg.matcher, cfg.tracker,
        tri_cap=64, obs_cap=256,
    )
    _, outs = run(jnp.asarray(imgs), tr.map, *args_tail)
    lost = np.asarray(outs.lost)
    assert lost[b0:b0 + 6].all(), f"blackout frames not lost: {lost}"
    # re-acquires and stays locked after the blackout
    assert not lost[b0 + 7:].any(), f"no recovery after blackout: {lost}"

    # the recovered pose must land back in the CLEAN run's accuracy
    # envelope. (Absolute error is dominated by the tiny-config
    # bootstrap's gauge offset — the clean run itself ends ~2.2 deg from
    # GT — so the meaningful bound is relative to the same sequence
    # without the blackout, same compiled program.)
    _, outs_clean = run(jnp.asarray(np.stack(frames[boot_end:])
                                    .astype(np.float32)),
                        tr.map, *args_tail)
    assert not np.asarray(outs_clean.lost).any()

    def end_rot_err(o):
        Rl = np.asarray(o.R)[-1]
        Rg, _ = poses[boot_end + len(np.asarray(o.R)) - 1]
        return float(np.degrees(np.arccos(np.clip(
            (np.trace(Rl.T @ Rg) - 1) / 2, -1, 1))))

    err, err_clean = end_rot_err(outs), end_rot_err(outs_clean)
    assert err < err_clean + 0.5, (
        f"end rotation error {err} deg vs clean {err_clean} deg")

    # ablation: recovery disabled -> strictly more lost frames after the
    # blackout (the narrow-radius step alone cannot re-acquire)
    cfg_off = SystemConfig(
        camera=CAM, orb=OrbConfig(n_features=1000),
        tracker=TrackerConfig(lost_recovery_radius_scale=0.0, **tcfg),
    )
    run_off = make_device_sequence_loop(
        cfg_off.camera, cfg_off.orb, cfg_off.matcher, cfg_off.tracker,
        tri_cap=64, obs_cap=256,
    )
    _, outs_off = run_off(jnp.asarray(imgs), tr.map, *args_tail)
    lost_off = np.asarray(outs_off.lost)
    assert lost_off[b0 + 7:].sum() >= lost[b0 + 7:].sum()
