"""The two remaining C4 parity axes: the scoreType config
(``ORBextractor.hpp:57``, ``Settings.hpp:77-90,124`` — Harris=0/FAST=1)
and the detection-mask argument of the extractor functor
(``ORBextractor.hpp:83-85``)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_tracking_tpu.config import CameraConfig, OrbConfig
from orb_slam_tracking_tpu.ops.extractor import orb_extract
from orb_slam_tracking_tpu.utils.synthetic import (
    CornerField,
    make_trajectory,
    render_frame,
)


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(3)
    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                       width=640, height=480)
    field = CornerField(rng, n=500)
    R, t = make_trajectory(4, "strafe")[1]
    return jnp.asarray(render_frame(field, cam, R, t))


def _cfg(**kw):
    return OrbConfig(n_features=500, **kw)


def test_harris_ranks_fast_corners(frame):
    """Harris mode detects with FAST (same support) but ranks differently:
    responses are Harris values in the OpenCV normalization range, counts
    stay at budget, and the selected set differs from FAST ranking."""
    k_fast = orb_extract(frame, _cfg(score_type="fast"))
    k_har = orb_extract(frame, _cfg(score_type="harris"))
    nf = int(np.asarray(k_fast.valid).sum())
    nh = int(np.asarray(k_har.valid).sum())
    assert nh >= 0.9 * nf  # same detection support, full budget reachable
    r = np.asarray(k_har.response)[np.asarray(k_har.valid)]
    assert np.all(np.abs(r) < 0.5)       # OpenCV-normalized Harris range
    assert np.all(r > -1.0)
    # ranking genuinely differs: the keypoint sets are not identical
    sf = {tuple(v) for v in np.round(
        np.asarray(k_fast.xy)[np.asarray(k_fast.valid)], 1)}
    sh = {tuple(v) for v in np.round(
        np.asarray(k_har.xy)[np.asarray(k_har.valid)], 1)}
    assert sf != sh
    # but they overlap heavily (same corners, different per-cell winners)
    assert len(sf & sh) > 0.3 * len(sf)


def test_harris_atlas_matches_per_level(frame):
    """The atlas path stays bit-identical under Harris ranking."""
    ka = orb_extract(frame, _cfg(score_type="harris", use_atlas=True))
    kp = orb_extract(frame, _cfg(score_type="harris", use_atlas=False))
    va, vp = np.asarray(ka.valid), np.asarray(kp.valid)
    np.testing.assert_array_equal(va, vp)
    np.testing.assert_allclose(
        np.asarray(ka.xy)[va], np.asarray(kp.xy)[vp], atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(ka.desc)[va], np.asarray(kp.desc)[vp])


@pytest.mark.parametrize("use_atlas", [True, False])
def test_detection_mask(frame, use_atlas):
    """A mask zeroing the left half confines keypoints to the right half
    (level-0 coordinates; nearest-downsampled per level like the
    reference's per-level pyramid of the mask would be)."""
    H, W = frame.shape
    mask = np.zeros((H, W), np.float32)
    mask[:, W // 2:] = 1.0
    cfg = _cfg(use_atlas=use_atlas)
    kps = orb_extract(frame, cfg, jnp.asarray(mask))
    v = np.asarray(kps.valid)
    assert v.sum() > 50  # the right half still yields plenty
    xs = np.asarray(kps.xy)[v, 0]
    # slack: one coarsest-level pixel of nearest-resize boundary rounding
    slack = cfg.scale_factor ** (cfg.n_levels - 1)
    assert xs.min() >= W // 2 - slack
    # and the unmasked run still covers the left half
    k_all = orb_extract(frame, cfg)
    xs_all = np.asarray(k_all.xy)[np.asarray(k_all.valid), 0]
    assert xs_all.min() < W // 2 - 50


def test_yaml_score_type_enum(tmp_path):
    """Settings.hpp:77,124 enum: scoreType 0 = Harris, 1 = FAST."""
    from orb_slam_tracking_tpu.config import load_system_config

    base = ("%YAML:1.0\nCamera.fx: 450.0\nCamera.fy: 450.0\n"
            "Camera.cx: 320.0\nCamera.cy: 240.0\n")
    p = tmp_path / "s.yaml"
    p.write_text(base + "ORBextractor.scoreType: 0\n")
    assert load_system_config(str(p)).orb.score_type == "harris"
    p.write_text(base + "ORBextractor.nScoreType: 1\n")
    assert load_system_config(str(p)).orb.score_type == "fast"

    with pytest.raises(ValueError):
        dataclasses.replace(OrbConfig(), score_type="bogus")