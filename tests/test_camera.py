import jax.numpy as jnp
import numpy as np

from orb_slam_tracking_tpu.config import CameraConfig
from orb_slam_tracking_tpu.geometry import camera

# The reference's bundled calibration (Settings.yaml:6-14).
CAM = CameraConfig(
    fx=609.2855, fy=609.3422, cx=351.4274, cy=237.7324,
    k1=-0.3492, k2=0.1363, p1=0.0, p2=0.0, width=752, height=480,
)


def test_undistort_roundtrip(rng):
    xy = (rng.standard_normal((256, 2)) * 0.3).astype(np.float32)
    xyd = camera.distort_normalized(CAM, jnp.asarray(xy))
    back = np.asarray(camera.undistort_normalized(CAM, xyd))
    np.testing.assert_allclose(back, xy, atol=1e-4)


def test_undistort_pixels_identity_without_distortion():
    cam = CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
    uv = jnp.array([[10.0, 20.0], [300.0, 200.0]])
    out = camera.undistort_pixels(cam, uv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(uv))


def test_project_center():
    pts = jnp.array([[0.0, 0.0, 2.0]])
    uv, z = camera.project(CAM, pts)
    np.testing.assert_allclose(np.asarray(uv), [[CAM.cx, CAM.cy]], atol=1e-4)
    assert float(z[0]) == 2.0


def test_project_unproject_consistency(rng):
    # random points in front of the camera
    pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(1.0, 5.0, 64)
    uv, z = camera.project(CAM, jnp.asarray(pts), distort=True)
    uvn = camera.undistort_pixels(CAM, uv)
    # undistorted pixels should equal the pinhole projection
    uv_pin, _ = camera.project(CAM, jnp.asarray(pts), distort=False)
    np.testing.assert_allclose(np.asarray(uvn), np.asarray(uv_pin), atol=0.05)


def test_undistorted_bounds_widen_with_barrel_distortion():
    # k1 < 0 (barrel): undistorted bounds extend beyond the sensor.
    bounds = camera.compute_undistorted_bounds(CAM)
    min_x, max_x, min_y, max_y = bounds
    assert min_x < 0 and max_x > CAM.width
    assert min_y < 0 and max_y > CAM.height


def test_config_yaml_loader(tmp_path):
    from orb_slam_tracking_tpu.config import load_system_config

    cfg_text = """%YAML:1.0
Camera.fx: 609.2855
Camera.fy: 609.3422
Camera.cx: 351.4274
Camera.cy: 237.7324
Camera.k1: -0.3492
Camera.k2: 0.1363
Camera.p1: 0.0
Camera.p2: 0.0
Camera.fps: 30.0
Camera.RGB: 1
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.fastTh: 20
ORBextractor.nScoreType: 1
UseMotionModel: 1
"""
    p = tmp_path / "settings.yaml"
    p.write_text(cfg_text)
    cfg = load_system_config(str(p))
    assert cfg.camera.fx == 609.2855
    assert cfg.orb.n_features == 1000
    # fastTh alias maps onto ini_th_fast (avoids the reference's silent-zero
    # key mismatch, SURVEY.md §5.6)
    assert cfg.orb.ini_th_fast == 20
    assert cfg.orb.min_th_fast == 7
    assert cfg.tracker.use_motion_model
    assert cfg.init_orb.n_features == 2000


def test_features_per_level_budget():
    from orb_slam_tracking_tpu.config import OrbConfig

    orb = OrbConfig(n_features=1000, scale_factor=1.2, n_levels=8)
    budget = orb.features_per_level()
    assert len(budget) == 8
    assert sum(budget) == 1000
    # geometric decay: each level smaller than the previous (except remainder)
    assert all(budget[i] >= budget[i + 1] for i in range(6))
