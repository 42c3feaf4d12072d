"""End-to-end TUM-benchmark harness test: synthesize a TUM-layout
sequence directory (PNG frames + rgb.txt + groundtruth.txt with exact
poses), run the tracker THROUGH the dataset loaders, export the
trajectory in TUM format, and compute ATE/RPE exactly as
``examples/eval_tum.py`` does on real fr1 data.

This proves the whole real-data path (io/tum.py index + groundtruth
parsing, PNG decode, timestamp association, Sim(3)-aligned ATE, RPE) —
the only missing piece for the fr1 accuracy target is the dataset
itself, absent from this image (zero egress).
"""

import os

import numpy as np
import pytest

from orb_slam_tracking_tpu.config import (
    CameraConfig,
    OrbConfig,
    SystemConfig,
    TrackerConfig,
)
from orb_slam_tracking_tpu.io import load_gray
from orb_slam_tracking_tpu.io.tum import (
    _rotation_to_quat,
    associate,
    read_groundtruth,
    read_image_index,
    trajectory_to_tum,
    write_trajectory_tum,
)
from orb_slam_tracking_tpu.slam.tracker import Tracker, TrackState
from orb_slam_tracking_tpu.utils.metrics import rpe_stats, umeyama_alignment
from orb_slam_tracking_tpu.utils.synthetic import (
    CornerField,
    make_trajectory,
    render_frame,
)


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory):
    """A synthetic sequence in the exact TUM RGB-D on-disk layout."""
    from PIL import Image

    root = tmp_path_factory.mktemp("tum_seq")
    os.makedirs(root / "rgb")
    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                       width=640, height=480)
    rng = np.random.default_rng(7)
    field = CornerField(rng, n=600)
    poses = make_trajectory(16, "strafe")
    rgb_rows = ["# color images", "# timestamp filename"]
    gt_rows = ["# ground truth trajectory", "# t tx ty tz qx qy qz qw"]
    for i, (R, t) in enumerate(poses):
        ts = 1305031102.0 + i / 30.0
        img = render_frame(field, cam, R, t)
        arr = np.clip(np.rint(img), 0, 255).astype(np.uint8)
        name = f"rgb/{ts:.6f}.png"
        Image.fromarray(arr, mode="L").save(root / name)
        rgb_rows.append(f"{ts:.6f} {name}")
        # groundtruth in TUM camera-to-world convention
        R_wc = R.T
        centre = -R_wc @ t
        q = _rotation_to_quat(R_wc)
        gt_rows.append(
            f"{ts:.6f} {centre[0]:.6f} {centre[1]:.6f} {centre[2]:.6f} "
            f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}")
    (root / "rgb.txt").write_text("\n".join(rgb_rows) + "\n")
    (root / "groundtruth.txt").write_text("\n".join(gt_rows) + "\n")
    return str(root), cam, poses


def test_tum_harness_end_to_end(tum_dir):
    seq_dir, cam, poses = tum_dir
    frames = read_image_index(seq_dir)
    assert len(frames) == 16
    gt = read_groundtruth(seq_dir)
    assert gt.shape == (16, 8)

    cfg = SystemConfig(
        camera=cam,
        orb=OrbConfig(n_features=1000),
        tracker=TrackerConfig(max_map_points=4096, max_keyframes=16,
                              ba_window=8, use_bow=False),
    )
    tracker = Tracker(cfg)
    for ts, path in frames:
        img = load_gray(path)
        assert img.shape == (480, 640)
        tracker.track(img, ts)
    assert tracker.state == TrackState.WORKING
    assert len(tracker.trajectory) >= 14

    # trajectory export round-trips through the TUM text format
    est_path = os.path.join(seq_dir, "est.txt")
    write_trajectory_tum(tracker.trajectory, est_path)
    reread = read_groundtruth(seq_dir, name="est.txt")
    assert reread.shape[0] == len(tracker.trajectory)
    np.testing.assert_allclose(
        reread[:, 0], [ts for _, ts, _, _ in tracker.trajectory], atol=1e-5)

    # the eval pipeline: associate -> Sim(3) ATE -> RPE
    est_ts = np.array([ts for _, ts, _, _ in tracker.trajectory])
    pairs = associate(est_ts, gt[:, 0])
    assert len(pairs) >= 14
    est_centres = np.stack([
        -(tracker.trajectory[i][2].T @ tracker.trajectory[i][3])
        for i, _ in pairs])
    gt_centres = np.stack([gt[j, 1:4] for _, j in pairs])
    R_a, t_a, s_a = umeyama_alignment(est_centres, gt_centres)
    aligned = (s_a * (R_a @ est_centres.T)).T + t_a
    ate = float(np.sqrt(np.mean(np.sum((aligned - gt_centres) ** 2, -1))))
    # synthetic strafe covers ~1.2 m; demand centimetre-level accuracy
    assert ate < 0.05, f"ATE {ate * 100:.2f} cm"

    est_Rt = [(tracker.trajectory[i][2], tracker.trajectory[i][3])
              for i, _ in pairs]
    gt_Rt = [(R, t) for (R, t) in poses]
    gt_Rt = [gt_Rt[j] for _, j in pairs]
    rpe_t, rpe_r = rpe_stats(est_Rt, gt_Rt, delta=5, scale=s_a)
    assert rpe_t < 0.08, rpe_t
    assert rpe_r < 2.0, rpe_r


def test_rpe_exact_on_identical_trajectories():
    poses = make_trajectory(10, "strafe")
    t_err, r_err = rpe_stats(poses, poses, delta=3)
    # arccos near 1 is ill-conditioned: float32-eps trace error already
    # yields ~0.03 deg, so only the translation residual is exactly zero
    assert t_err == 0.0 and r_err < 0.05


def test_trajectory_to_tum_convention():
    """A pose whose camera sits at (1,2,3) must export that centre."""
    R = np.eye(3)
    centre = np.array([1.0, 2.0, 3.0])
    t = -R @ centre
    rows = trajectory_to_tum([(0, 0.0, R, t)])
    vals = [float(v) for v in rows[0].split()]
    np.testing.assert_allclose(vals[1:4], centre, atol=1e-6)
    np.testing.assert_allclose(vals[4:8], [0, 0, 0, 1], atol=1e-6)
