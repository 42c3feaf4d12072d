"""isInFrustum gates in the projection matcher + viewing-statistics
maintenance (MapPoint mNormalVector/mfMinDistance/mfMaxDistance,
UpdateNormalAndDepth, PredictScale — ORB-SLAM semantics the reference's
vendored stack implies; Frame.hpp:91-93 declares the per-frame map-point
association these gates serve)."""

import jax.numpy as jnp
import numpy as np

from orb_slam_tracking_tpu.config import MatcherConfig, TrackerConfig
from orb_slam_tracking_tpu.ops.proj_matcher import search_by_projection

K = np.array([[450.0, 0, 320], [0, 450, 240], [0, 0, 1]], np.float32)


def _scene(rng, P=64, N=32):
    pts = rng.uniform(-2, 2, (P, 3)).astype(np.float32)
    pts[:, 2] += 6
    desc = rng.integers(0, 2**32, (P, 8), dtype=np.uint32)
    uv = (pts[:, :2] / pts[:, 2:]) * [450, 450] + [320, 240]
    kp_xy = (uv[:N] + rng.normal(0, 1, (N, 2))).astype(np.float32)
    return pts, desc, kp_xy


def _match(pts, desc, kp_xy, kp_oct=None, **kw):
    P, N = len(pts), len(kp_xy)
    if kp_oct is None:
        kp_oct = np.zeros(N, np.int32)
    return search_by_projection(
        jnp.asarray(pts), jnp.asarray(desc), jnp.ones(P, bool),
        jnp.eye(3), jnp.zeros(3), jnp.asarray(K),
        jnp.asarray(desc[:N]), jnp.asarray(kp_xy), jnp.ones(N, bool),
        10.0, MatcherConfig(), 640, 480,
        kp_octave=jnp.asarray(kp_oct), **kw,
    )


def test_zero_dmax_disables_gates(rng):
    """Points without viewing info (dmax == 0) must match exactly as if
    no statistics were passed — fresh points stay matchable."""
    pts, desc, kp_xy = _scene(rng)
    r0 = _match(pts, desc, kp_xy)
    zn = jnp.zeros((len(pts), 3), jnp.float32)
    zd = jnp.zeros((len(pts),), jnp.float32)
    r1 = _match(pts, desc, kp_xy, pt_normal=zn, pt_dmin=zd, pt_dmax=zd)
    np.testing.assert_array_equal(
        np.asarray(r0.kp_for_point), np.asarray(r1.kp_for_point))


def test_viewing_angle_gate(rng):
    """cos(view, normal) > 0.5: aligned normals keep matches; opposed
    normals reject every point (back-facing)."""
    pts, desc, kp_xy = _scene(rng)
    dist = np.linalg.norm(pts, axis=1)
    normal = (pts / dist[:, None]).astype(np.float32)
    # octave-0 observation at the current distance: dmax = dist
    dmax = dist.astype(np.float32)
    dmin = (dist / 1.2**7).astype(np.float32)
    r_ok = _match(pts, desc, kp_xy, pt_normal=jnp.asarray(normal),
                  pt_dmin=jnp.asarray(dmin), pt_dmax=jnp.asarray(dmax))
    assert int(r_ok.n_matches) > 10
    r_bad = _match(pts, desc, kp_xy, pt_normal=jnp.asarray(-normal),
                   pt_dmin=jnp.asarray(dmin), pt_dmax=jnp.asarray(dmax))
    assert int(r_bad.n_matches) == 0


def test_distance_envelope_gate(rng):
    """Points whose scale-invariance envelope excludes the current
    distance are invisible (dist must be in [0.8 dmin, 1.2 dmax])."""
    pts, desc, kp_xy = _scene(rng)
    dist = np.linalg.norm(pts, axis=1)
    normal = (pts / dist[:, None]).astype(np.float32)
    far = (dist * 4).astype(np.float32)
    r = _match(pts, desc, kp_xy, pt_normal=jnp.asarray(normal),
               pt_dmin=jnp.asarray(far), pt_dmax=jnp.asarray(far * 2))
    assert int(r.n_matches) == 0


def test_predicted_octave_gate(rng):
    """PredictScale: dmax = dist * s^4 predicts octave 4, so octave-0
    keypoints are outside [3, 5] and rejected; octave-4 keypoints pass."""
    pts, desc, kp_xy = _scene(rng)
    dist = np.linalg.norm(pts, axis=1)
    normal = (pts / dist[:, None]).astype(np.float32)
    dmax = (dist * 1.2**4).astype(np.float32)
    dmin = (dmax / 1.2**7).astype(np.float32)
    stats = dict(pt_normal=jnp.asarray(normal), pt_dmin=jnp.asarray(dmin),
                 pt_dmax=jnp.asarray(dmax))
    r0 = _match(pts, desc, kp_xy, kp_oct=np.zeros(len(kp_xy), np.int32),
                **stats)
    assert int(r0.n_matches) == 0
    r4 = _match(pts, desc, kp_xy, kp_oct=np.full(len(kp_xy), 4, np.int32),
                **stats)
    assert int(r4.n_matches) > 10


def test_update_normal_and_depth(rng):
    """The batch UpdateNormalAndDepth: normals average the observing
    keyframes' viewing directions; the envelope follows the observation
    octave; unobserved points keep dmax == 0."""
    from orb_slam_tracking_tpu.slam.map import (
        empty_map,
        update_normal_and_depth,
    )

    cfg = TrackerConfig(max_map_points=16, max_keyframes=4)
    m = empty_map(cfg, kp_capacity=8)
    # two keyframes looking at point 0 from +/- x offsets at z=0
    pt = jnp.asarray([0.0, 0.0, 5.0])
    m = m._replace(
        pts=m.pts.at[0].set(pt),
        pt_valid=m.pt_valid.at[0].set(True),
        kf_valid=m.kf_valid.at[:2].set(True),
        # identity rotations, centres at (+/-1, 0, 0): t = -R C = -C
        kf_t=m.kf_t.at[0].set(jnp.asarray([-1.0, 0, 0]))
                    .at[1].set(jnp.asarray([1.0, 0, 0])),
        obs_kf=m.obs_kf.at[0].set(0).at[1].set(1),
        obs_pt=m.obs_pt.at[0].set(0).at[1].set(0),
        obs_kp=m.obs_kp.at[0].set(0).at[1].set(1),
        obs_valid=m.obs_valid.at[:2].set(True),
        kf_kp_octave=m.kf_kp_octave.at[0, 0].set(0).at[1, 1].set(2),
    )
    m2 = update_normal_and_depth(m, 1.2, 8)
    n = np.asarray(m2.pt_normal[0])
    # mean of the two viewing dirs is symmetric: x cancels, points along
    # the bisector toward the point
    assert abs(n[0]) < 1e-6
    assert n[2] > 0.99
    d = float(np.linalg.norm(np.asarray(pt) - np.asarray([1.0, 0, 0])))
    np.testing.assert_allclose(float(m2.pt_dmax[0]), d * 1.2**2, rtol=1e-5)
    np.testing.assert_allclose(
        float(m2.pt_dmin[0]), d * 1.2**2 / 1.2**7, rtol=1e-5)
    # untouched points: no viewing info
    assert float(m2.pt_dmax[1]) == 0.0
