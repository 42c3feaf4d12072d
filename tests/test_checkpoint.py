import numpy as np

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


def test_checkpoint_roundtrip_and_resume(rng, tmp_path):
    cfg = SystemConfig(
        camera=CAM, orb=OrbConfig(n_features=1000),
        tracker=TrackerConfig(max_map_points=2048, max_keyframes=16,
                              ba_window=8, use_bow=False),
    )
    field = CornerField(rng, n=900)
    poses = make_trajectory(28, "strafe")
    frames = [render_frame(field, CAM, R, t) for R, t in poses]
    tr = Tracker(cfg)
    for i in range(18):
        tr.track(frames[i], i / 30.0)
    assert tr.state == TrackState.WORKING
    path = str(tmp_path / "ckpt.npz")
    save_tracker(tr, path)

    tr2 = Tracker(cfg)
    load_tracker(tr2, path)
    assert tr2.state == TrackState.WORKING
    assert tr2.n_kf == tr.n_kf
    assert int(tr2.map.n_points()) == int(tr.map.n_points())
    np.testing.assert_array_equal(tr2.R, tr.R)
    np.testing.assert_array_equal(np.asarray(tr2.map.pts), np.asarray(tr.map.pts))
    assert len(tr2.trajectory) == len(tr.trajectory)

    # the resumed tracker keeps tracking the remaining frames
    ok = 0
    for i in range(18, 28):
        tr2.track(frames[i], i / 30.0)
        if tr2.state == TrackState.WORKING:
            ok += 1
    assert ok >= 7


def test_profiling_utils(tmp_path):
    from orb_slam_tracking_tpu.utils.profiling import MetricsLog, Stopwatch

    sw = Stopwatch()
    with sw.section("a"):
        pass
    with sw.section("a"):
        pass
    rep = sw.report()
    assert rep["a"]["count"] == 2
    log = MetricsLog()
    log.append({"n_kps": 100, "state": "WORKING"})
    log.append({"n_kps": 200, "state": "WORKING"})
    p = tmp_path / "m.jsonl"
    log.dump_jsonl(str(p))
    assert len(p.read_text().splitlines()) == 2
    assert log.summary()["n_kps"]["mean"] == 150
