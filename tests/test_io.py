import os

import numpy as np
import pytest

from orb_slam_tracking_tpu.io import load_gray, to_gray
from orb_slam_tracking_tpu.io.native_loader import (
    FrameLoader,
    decode_gray,
    native_available,
)
from orb_slam_tracking_tpu.io.tum import (
    FR1_CAMERA,
    associate,
    read_groundtruth,
    read_image_index,
    trajectory_to_tum,
    write_trajectory_tum,
)

REF_IMG = "/root/reference/demo/initImages/frame_01425127694_0544666611.png"


def test_to_gray_bt601():
    img = np.zeros((2, 2, 3), np.uint8)
    img[..., 0] = 100  # R
    g = to_gray(img, rgb=True)
    np.testing.assert_allclose(g, 29.9, atol=0.01)


@pytest.mark.skipif(not os.path.exists(REF_IMG), reason="no reference data")
def test_native_decode_matches_pil():
    if not native_available():
        pytest.skip("native loader not built (make -C native)")
    a = decode_gray(REF_IMG)
    b = load_gray(REF_IMG)
    assert a.shape == b.shape
    assert np.abs(a - b).max() < 1e-3


@pytest.mark.skipif(not os.path.exists(REF_IMG), reason="no reference data")
def test_native_pipeline_order_and_fallback():
    paths = [REF_IMG] * 5
    frames = list(FrameLoader(paths, n_threads=3, ring_capacity=2))
    assert len(frames) == 5
    for f in frames:
        assert f.shape == frames[0].shape


def test_tum_roundtrip(tmp_path):
    # synthetic trajectory -> write -> parse as groundtruth
    traj = []
    for i in range(5):
        th = 0.1 * i
        R = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]],
            np.float32,
        )
        t = np.array([0.1 * i, 0.0, 0.2 * i], np.float32)
        traj.append((i, i / 30.0, R, t))
    p = tmp_path / "traj.txt"
    write_trajectory_tum(traj, str(p))
    gt = read_groundtruth(str(tmp_path), "traj.txt")
    assert gt.shape == (5, 8)
    # camera centre roundtrip
    for i, (_, ts, R, t) in enumerate(traj):
        centre = -R.T @ t
        np.testing.assert_allclose(gt[i, 1:4], centre, atol=1e-5)
    # quaternions normalized
    np.testing.assert_allclose(np.linalg.norm(gt[:, 4:8], axis=1), 1.0, atol=1e-6)


def test_tum_index_and_associate(tmp_path):
    (tmp_path / "rgb.txt").write_text(
        "# comment\n1.00 rgb/1.png\n1.05 rgb/2.png\n1.10 rgb/3.png\n"
    )
    idx = read_image_index(str(tmp_path))
    assert len(idx) == 3
    assert idx[0][0] == 1.0 and idx[0][1].endswith("rgb/1.png")
    pairs = associate(np.array([1.0, 1.06, 2.0]), np.array([1.01, 1.049, 1.11]))
    assert (0, 0) in pairs
    assert all(i != 2 for i, _ in pairs)  # 2.0 has no close gt


def test_fr1_camera_constants():
    assert FR1_CAMERA.fx == 517.3 and FR1_CAMERA.has_distortion
