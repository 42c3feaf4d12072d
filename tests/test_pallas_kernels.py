"""Pallas kernels validated in interpret mode against the XLA paths
(FAST/Hamming bit-exact; the brief sampler is exact to the bf16 hi/lo
split residual ~1e-3 absolute on [0,255] pixels; real-TPU execution is
exercised by the benchmark)."""

import jax.numpy as jnp
import numpy as np

from orb_slam_tracking_tpu.ops.fast import fast_score
from orb_slam_tracking_tpu.ops.hamming import hamming_matrix
from orb_slam_tracking_tpu.ops.pallas_kernels import (
    brief_sample_pallas,
    fast_score_pallas,
    hamming_matrix_pallas,
)
from orb_slam_tracking_tpu.ops.pattern import EDGE_THRESHOLD
from orb_slam_tracking_tpu.ops.pyramid import reflect_pad


def test_brief_sampler_matches_gather(rng):
    img = jnp.asarray((rng.random((518, 678)) * 255).astype(np.float32))
    n = 100
    cy = rng.integers(35, 480, n)
    cx = rng.integers(35, 640, n)
    sy = (cy[:, None] + rng.integers(-19, 20, (n, 512))).astype(np.int32)
    sx = (cx[:, None] + rng.integers(-19, 20, (n, 512))).astype(np.int32)
    ref = np.asarray(img).reshape(-1)[sy * 678 + sx]
    got = np.asarray(
        brief_sample_pallas(img, jnp.asarray(sy), jnp.asarray(sx), interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_brief_sampler_integer_path_exact(rng):
    """The integer fast path (single-pass bf16) must be EXACT on
    integer-valued images in [0, 255] — the production input after the
    rint'ed blur (descriptors_at)."""
    img = jnp.asarray(
        np.floor(rng.random((518, 678)) * 256).astype(np.float32))
    n = 100  # not a multiple of the int group (32): exercises padding
    cy = rng.integers(35, 480, n)
    cx = rng.integers(35, 640, n)
    sy = (cy[:, None] + rng.integers(-19, 20, (n, 512))).astype(np.int32)
    sx = (cx[:, None] + rng.integers(-19, 20, (n, 512))).astype(np.int32)
    ref = np.asarray(img).reshape(-1)[sy * 678 + sx]
    got = np.asarray(
        brief_sample_pallas(img, jnp.asarray(sy), jnp.asarray(sx),
                            interpret=True, integer_values=True)
    )
    np.testing.assert_array_equal(got, ref)


def test_hamming_pallas_matches_mxu(rng):
    d1 = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2**32, (128, 8), dtype=np.uint32))
    ref = np.asarray(hamming_matrix(d1, d2))
    got = np.asarray(hamming_matrix_pallas(d1, d2, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_fast_pallas_matches_xla(rng):
    img = (rng.random((100, 150)) * 255).astype(np.float32)
    # sprinkle some strong corners
    img[20:28, 30:38] = 250.0
    img[60:70, 90:100] = 5.0
    padded = reflect_pad(jnp.asarray(img), EDGE_THRESHOLD)
    ref = np.asarray(fast_score(padded, EDGE_THRESHOLD))
    got = np.asarray(fast_score_pallas(padded, EDGE_THRESHOLD, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_fast_pallas_reference_image(init_images):
    img = jnp.asarray(init_images[0])
    padded = reflect_pad(img, EDGE_THRESHOLD)
    ref = np.asarray(fast_score(padded, EDGE_THRESHOLD))
    got = np.asarray(fast_score_pallas(padded, EDGE_THRESHOLD, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_moments_pallas_matches_dense(rng):
    """Per-keypoint IC disc moments (round 5) vs the dense canvas maps:
    the same reference disc (IC_Angle, ORBextractor.cpp:103-159), summed
    in a different order — equal to f32 reduction tolerance."""
    from orb_slam_tracking_tpu.ops.orientation import moment_maps
    from orb_slam_tracking_tpu.ops.pallas_kernels import moments_at_pallas

    canvas = jnp.asarray((rng.random((200, 384)) * 255).astype(np.float32))
    m10, m01 = moment_maps(canvas, EDGE_THRESHOLD)
    h, w = m10.shape
    ys = rng.integers(0, h, 96).astype(np.int32)
    xs = rng.integers(0, w, 96).astype(np.int32)
    p10, p01 = moments_at_pallas(
        canvas, jnp.asarray(ys + EDGE_THRESHOLD),
        jnp.asarray(xs + EDGE_THRESHOLD), interpret=True)
    scale = np.abs(np.asarray(m10)[ys, xs]).max() + 1.0
    np.testing.assert_allclose(
        np.asarray(p10), np.asarray(m10)[ys, xs], atol=1e-5 * scale)
    np.testing.assert_allclose(
        np.asarray(p01), np.asarray(m01)[ys, xs], atol=1e-5 * scale)


def test_moments_pallas_nongroup_multiple(rng):
    """N not a multiple of the kernel group: padded tail sliced off."""
    from orb_slam_tracking_tpu.ops.orientation import moment_maps
    from orb_slam_tracking_tpu.ops.pallas_kernels import moments_at_pallas

    canvas = jnp.asarray((rng.random((120, 256)) * 255).astype(np.float32))
    m10, m01 = moment_maps(canvas, EDGE_THRESHOLD)
    h, w = m10.shape
    ys = rng.integers(0, h, 37).astype(np.int32)
    xs = rng.integers(0, w, 37).astype(np.int32)
    p10, p01 = moments_at_pallas(
        canvas, jnp.asarray(ys + EDGE_THRESHOLD),
        jnp.asarray(xs + EDGE_THRESHOLD), interpret=True)
    assert p10.shape == (37,) and p01.shape == (37,)
    scale = np.abs(np.asarray(m10)[ys, xs]).max() + 1.0
    np.testing.assert_allclose(
        np.asarray(p10), np.asarray(m10)[ys, xs], atol=1e-5 * scale)
