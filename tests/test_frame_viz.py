import numpy as np
import pytest

from orb_slam_tracking_tpu.config import CameraConfig, OrbConfig
from orb_slam_tracking_tpu.optim.lm import (
    cauchy_weight,
    huber_weight,
    pseudo_huber_weight,
    tukey_weight,
)
from orb_slam_tracking_tpu.slam.frame import features_in_area, make_frame
from orb_slam_tracking_tpu.utils.viz import draw_keypoints, draw_matches

CAM = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0)


def test_make_frame_and_area_query(rng):
    img = (rng.random((480, 640)) * 255).astype(np.float32)
    f = make_frame(img, 3, 0.1, OrbConfig(n_features=500), CAM)
    assert int(f.frame_id) == 3
    n = int(f.kps.count())
    assert n > 100
    # window around a known keypoint contains it; octave filter works
    v = np.asarray(f.kps.valid)
    i = int(np.where(v)[0][0])
    x, y = np.asarray(f.xy_un)[i]
    m = np.asarray(features_in_area(f.kps, f.xy_un, x, y, 5.0))
    assert m[i]
    m0 = np.asarray(features_in_area(f.kps, f.xy_un, x, y, 1e6, 1, -1))
    assert not m0[np.asarray(f.kps.octave) == 0].any()


def test_robust_kernel_weights():
    import jax.numpy as jnp

    chi2 = jnp.asarray([0.0, 1.0, 4.0, 100.0])
    d2 = 4.0
    for wfn in (huber_weight, tukey_weight, cauchy_weight, pseudo_huber_weight):
        w = np.asarray(wfn(chi2, d2))
        assert w[0] >= w[1] >= w[2] >= w[3] >= 0  # monotone down-weighting
        assert w[0] <= 1.0 + 1e-6
    # huber: exactly 1 inside the threshold
    np.testing.assert_allclose(np.asarray(huber_weight(chi2, d2))[:3], 1.0)
    # tukey: zero beyond the threshold
    assert float(tukey_weight(jnp.asarray(100.0), d2)) == 0.0


def test_viz_outputs(rng, tmp_path):
    g1 = (rng.random((120, 160)) * 255).astype(np.float32)
    g2 = (rng.random((120, 160)) * 255).astype(np.float32)
    xy = rng.uniform(10, 100, (20, 2)).astype(np.float32)
    valid = np.ones(20, bool)
    img = draw_keypoints(g1, xy, valid, path=str(tmp_path / "kp.png"))
    assert (tmp_path / "kp.png").exists()
    m = np.full(20, -1, np.int32)
    m[:10] = np.arange(10)
    img2 = draw_matches(g1, xy, g2, xy, m, path=str(tmp_path / "m.png"))
    assert img2.size == (320, 120)
