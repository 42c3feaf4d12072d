import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_tracking_tpu.ops.pyramid import _resize_matrix


def test_resize_matrix_equals_jax_resize(rng):
    """The TPU matmul-resize path must be numerically identical to
    jax.image.resize 'linear' (the matrices are built by resizing the
    identity, so this checks the composition)."""
    v = rng.random((480, 640)).astype(np.float32)
    for out_shape in [(400, 533), (333, 444), (97, 129)]:
        mh = _resize_matrix(480, out_shape[0])
        mw = _resize_matrix(640, out_shape[1])
        got = mh @ v @ mw.T
        ref = np.asarray(jax.image.resize(jnp.asarray(v), out_shape, method="linear"))
        np.testing.assert_allclose(got, ref, atol=1e-4)  # f32 weight rounding
    # rows of an interpolation matrix sum to 1 (partition of unity)
    np.testing.assert_allclose(_resize_matrix(480, 400).sum(1), 1.0, atol=1e-5)
