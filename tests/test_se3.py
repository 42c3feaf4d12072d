import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_tracking_tpu.geometry import se3


def random_rotations(rng, n):
    """Random rotations via QR of gaussians (det fixed to +1)."""
    A = rng.standard_normal((n, 3, 3))
    Q, _ = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q[:, :, 0] *= det[:, None]
    return Q.astype(np.float32)


def test_exp_log_roundtrip_small_and_large(rng):
    omega = rng.standard_normal((64, 3)).astype(np.float32)
    scales = np.concatenate(
        [np.full(16, 1e-6), np.full(16, 0.1), np.full(16, 1.0), np.full(16, 2.5)]
    ).astype(np.float32)
    omega = omega / np.linalg.norm(omega, axis=-1, keepdims=True) * scales[:, None]
    R = se3.so3_exp(jnp.asarray(omega))
    back = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(back, omega, atol=2e-4)


def test_so3_log_random_rotations(rng):
    R = random_rotations(rng, 32)
    w = se3.so3_log(jnp.asarray(R))
    R2 = np.asarray(se3.so3_exp(w))
    np.testing.assert_allclose(R2, R, atol=5e-4)


def test_se3_exp_log_roundtrip(rng):
    xi = (rng.standard_normal((32, 6)) * 0.8).astype(np.float32)
    R, t = se3.se3_exp(jnp.asarray(xi))
    back = np.asarray(se3.se3_log(R, t))
    np.testing.assert_allclose(back, xi, atol=1e-3)


def test_compose_inverse(rng):
    xi = (rng.standard_normal((8, 6)) * 0.5).astype(np.float32)
    R, t = se3.se3_exp(jnp.asarray(xi))
    Ri, ti = se3.inverse(R, t)
    Rc, tc = se3.compose(R, t, Ri, ti)
    np.testing.assert_allclose(
        np.asarray(Rc), np.broadcast_to(np.eye(3), Rc.shape), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)


def test_transform_points_matches_manual(rng):
    xi = (rng.standard_normal(6) * 0.5).astype(np.float32)
    R, t = se3.se3_exp(jnp.asarray(xi))
    pts = rng.standard_normal((10, 3)).astype(np.float32)
    out = np.asarray(se3.transform_points(R, t, jnp.asarray(pts)))
    expect = pts @ np.asarray(R).T + np.asarray(t)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_jit_and_vmap():
    xi = jnp.ones((4, 6)) * 0.1
    f = jax.jit(se3.se3_exp)
    R, t = f(xi)
    assert R.shape == (4, 3, 3) and t.shape == (4, 3)


def test_rotation_matrices_orthonormal(rng):
    omega = rng.standard_normal((16, 3)).astype(np.float32)
    R = np.asarray(se3.so3_exp(jnp.asarray(omega)))
    np.testing.assert_allclose(
        R @ np.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), R.shape), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
