import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_tracking_tpu.config import OrbConfig
from orb_slam_tracking_tpu.ops import orb_extract
from orb_slam_tracking_tpu.ops.brief import pack_bits
from orb_slam_tracking_tpu.ops.fast import detect_level, fast_score
from orb_slam_tracking_tpu.ops.pattern import (
    EDGE_THRESHOLD,
    brief_pattern,
    umax_table,
)
from orb_slam_tracking_tpu.ops.pyramid import build_pyramid, reflect_pad
from orb_slam_tracking_tpu.ops.select import select_level


def test_umax_matches_opencv_table():
    # The radius-15 disc bounds OpenCV's ORB uses (same construction).
    expected = [15, 15, 15, 15, 14, 14, 14, 13, 13, 12, 11, 10, 9, 8, 6, 3]
    np.testing.assert_array_equal(umax_table(), expected)


def test_brief_pattern_shape_and_range():
    pat = brief_pattern()
    assert pat.shape == (256, 4)
    assert pat.min() >= -13 and pat.max() <= 12


def test_pack_bits_roundtrip(rng):
    bits = (rng.random((5, 256)) < 0.5).astype(np.uint32)
    packed = np.asarray(pack_bits(jnp.asarray(bits)))
    assert packed.shape == (5, 8) and packed.dtype == np.uint32
    unpacked = np.unpackbits(
        packed.view(np.uint8), axis=1, bitorder="little"
    )
    np.testing.assert_array_equal(unpacked, bits)


def test_fast_detects_square_corners():
    # A bright square on dark background: the 4 corners are FAST corners,
    # edges and flat regions are not.
    img = np.zeros((64, 64), dtype=np.float32)
    img[24:40, 24:40] = 200.0
    padded = reflect_pad(jnp.asarray(img), EDGE_THRESHOLD)
    score = np.asarray(fast_score(padded))
    # corner pixels (inside the square, adjacent to two edges)
    assert score[24, 24] > 20 and score[39, 39] > 20
    # edge midpoint: not a corner for FAST-9 (arc of 8 only)
    assert score[24, 32] <= 20
    # flat interior
    assert score[32, 32] <= 0
    # NMS + selection finds spread maxima near all 4 corners (exact ties in
    # this saturated synthetic image may shift maxima by a pixel or two)
    det = detect_level(padded, 20, 7, 35)
    xy, resp, valid = select_level(det, 8, 12)
    got = np.asarray(xy)[np.asarray(valid)]
    corners = np.array([(24, 24), (39, 24), (24, 39), (39, 39)], dtype=np.float32)
    d = np.linalg.norm(got[:, None, :] - corners[None], axis=-1).min(axis=0)
    assert (d <= 3.0).all()


def test_fast_dual_threshold_fallback():
    # weak corner (contrast ~10): rejected at ini_th=20 but kept via the
    # min_th=7 cell fallback when its cell has no strong corner.
    img = np.full((64, 64), 100.0, dtype=np.float32)
    img[24:40, 24:40] = 112.0
    padded = reflect_pad(jnp.asarray(img), EDGE_THRESHOLD)
    det_hi_only = detect_level(padded, 20, 19, 35)
    det_fallback = detect_level(padded, 20, 7, 35)
    assert np.asarray(det_hi_only).max() == 0.0
    assert np.asarray(det_fallback)[24, 24] > 7


def test_pyramid_shapes():
    cfg = OrbConfig(n_features=100)
    img = jnp.zeros((480, 752))
    levels = build_pyramid(img, cfg)
    assert len(levels) == 8
    shapes = cfg.level_shapes(480, 752)
    for lvl, (h, w) in zip(levels, shapes):
        assert lvl.shape == (h + 2 * EDGE_THRESHOLD, w + 2 * EDGE_THRESHOLD)
    # top level ~ scale 1.2^7
    assert shapes[-1] == (int(round(480 / 1.2**7)), int(round(752 / 1.2**7)))


def test_orientation_follows_gradient():
    from orb_slam_tracking_tpu.ops.orientation import angles_at, moment_maps

    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    xy = jnp.asarray([[32.0, 32.0]])
    # intensity increasing with +x => centroid along +x => angle ~ 0
    m10, m01 = moment_maps(reflect_pad(jnp.asarray(xx), EDGE_THRESHOLD))
    a = float(angles_at(m10, m01, xy)[0])
    assert a < 1 or a > 359
    # intensity increasing with +y => angle ~ 90
    m10, m01 = moment_maps(reflect_pad(jnp.asarray(yy), EDGE_THRESHOLD))
    a = float(angles_at(m10, m01, xy)[0])
    assert abs(a - 90.0) < 1


def test_extract_on_reference_image(init_images):
    cfg = OrbConfig(n_features=1000)
    kps = orb_extract(jnp.asarray(init_images[0]), cfg)
    v = np.asarray(kps.valid)
    # the reference demands >= 100 keypoints to accept a frame
    # (tracking.cpp:80); a textured indoor image should nearly fill budget
    assert v.sum() > 900
    # budgets respected per level
    budgets = cfg.features_per_level()
    octaves = np.asarray(kps.octave)[v]
    for lvl, b in enumerate(budgets):
        assert (octaves == lvl).sum() <= b
    # all valid keypoints inside the eligible region
    xy = np.asarray(kps.xy)[v]
    assert xy.min() >= 15.9
    # descriptors: non-degenerate, unique
    d = np.asarray(kps.desc)[v]
    assert len(np.unique(d, axis=0)) > 0.95 * v.sum()
    bits = np.unpackbits(d.view(np.uint8), axis=1)
    assert 0.3 < bits.mean() < 0.7


def test_descriptor_rotation_covariance(rng):
    """Rotating an image 90 deg rotates IC angles by 90 and leaves the
    descriptor (sampled in the keypoint frame) nearly unchanged."""
    from orb_slam_tracking_tpu.ops.brief import descriptors_at
    from orb_slam_tracking_tpu.ops.orientation import angles_at, moment_maps
    from orb_slam_tracking_tpu.ops.pyramid import gaussian_blur

    # smooth random texture so nearest-neighbour rounding noise is small
    base = rng.random((96, 96)).astype(np.float32) * 255
    img = np.asarray(gaussian_blur(jnp.asarray(base), 7, 2.0))

    # np.rot90: out[i, j] = in[j, N-1-i], so in-image point (x, y) lands at
    # out-image point (y, N-1-x) and IC angles shift by -90 deg.
    rot = np.rot90(img).copy()
    cx, cy = 40.0, 30.0
    c0 = np.array([[cx, cy]], dtype=np.float32)
    c1 = np.array([[cy, 95.0 - cx]], dtype=np.float32)
    p0 = reflect_pad(jnp.asarray(img), EDGE_THRESHOLD)
    p1 = reflect_pad(jnp.asarray(rot), EDGE_THRESHOLD)
    m10, m01 = moment_maps(p0)
    a0 = angles_at(m10, m01, jnp.asarray(c0))
    m10r, m01r = moment_maps(p1)
    a1 = angles_at(m10r, m01r, jnp.asarray(c1))
    diff = (float(a1[0]) - float(a0[0]) + 90.0) % 360.0
    assert min(diff, 360 - diff) < 2.0

    b0 = gaussian_blur(p0)
    b1 = gaussian_blur(p1)
    d0 = np.asarray(descriptors_at(b0, jnp.asarray(c0), a0))
    d1 = np.asarray(descriptors_at(b1, jnp.asarray(c1), a1))
    ham = np.unpackbits((d0 ^ d1).view(np.uint8)).sum()
    assert ham < 20  # exact 90 deg rotation: near-identical descriptor
