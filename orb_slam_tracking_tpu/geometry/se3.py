"""SE(3) / SO(3) utilities on raw arrays (batched, jit-friendly).

TPU-native replacement for the reference's Eigen pose types
(``SlamTypes/BasicTypes.hpp:9-11``: ``PoseT = Eigen::Affine3d``) and g2o's
``SE3Quat`` exp/log maps (``Thirdparty/g2o/g2o/types/se3quat.h:178-223``).
Poses are represented as ``(R, t)`` pairs — ``R: [..., 3, 3]``,
``t: [..., 3]`` — and tangent vectors as ``[..., 6]`` ordered ``(omega, v)``
(rotation first, matching g2o's convention).

Everything is pure jax.numpy; all functions broadcast over leading axes so
they can be vmapped/sharded freely.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# All matmuls here are tiny (3x3) but feed long chains of pose
# composition and optimizer updates. On TPU the DEFAULT matmul precision
# truncates operands to bfloat16 (~0.4% relative error), which puts a
# ~0.2 deg error on every rotation composition and a ~1 px floor under
# reprojection residuals — measured round 4: bundle adjustment on chip
# converged to 4.4x the g2o cost until these were pinned. Full float32
# on 3x3 ops costs nothing; the MXU is not the bottleneck for them.
_HI = lax.Precision.HIGHEST

__all__ = [
    "hat",
    "so3_exp",
    "so3_log",
    "se3_exp",
    "se3_log",
    "compose",
    "inverse",
    "transform_points",
    "identity_pose",
]

_EPS = 1e-8


def hat(omega):
    """Skew-symmetric matrix of ``omega: [..., 3]`` -> ``[..., 3, 3]``."""
    wx, wy, wz = omega[..., 0], omega[..., 1], omega[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def _sinc_terms(theta2):
    """Taylor-guarded (sin t / t, (1-cos t)/t^2, (t - sin t)/t^3)."""
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta + _EPS))
    return a, b, c


def so3_exp(omega):
    """Rodrigues: ``omega [..., 3]`` -> rotation matrix ``[..., 3, 3]``."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    a, b, _ = _sinc_terms(theta2)
    K = hat(omega)
    K2 = jnp.matmul(K, K, precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def rotation_to_quaternion(R):
    """Rotation matrix ``[..., 3, 3]`` -> unit quaternion ``[..., 4]``
    (w, x, y, z), w >= 0.

    Shepperd's method, fully vectorized: all four candidate extractions are
    computed and the best-conditioned one (largest pivot) selected with
    ``where`` — branch-free, robust for every angle including theta = pi.
    """
    R00, R11, R22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    t_w = 1.0 + R00 + R11 + R22  # 4 w^2
    t_x = 1.0 + R00 - R11 - R22  # 4 x^2
    t_y = 1.0 - R00 + R11 - R22  # 4 y^2
    t_z = 1.0 - R00 - R11 + R22  # 4 z^2
    # candidate from w-pivot
    sw = jnp.sqrt(jnp.maximum(t_w, _EPS))
    qw_w = 0.5 * sw
    inv_w = 0.5 / sw
    q_w = jnp.stack(
        [qw_w,
         (R[..., 2, 1] - R[..., 1, 2]) * inv_w,
         (R[..., 0, 2] - R[..., 2, 0]) * inv_w,
         (R[..., 1, 0] - R[..., 0, 1]) * inv_w],
        axis=-1,
    )
    sx = jnp.sqrt(jnp.maximum(t_x, _EPS))
    inv_x = 0.5 / sx
    q_x = jnp.stack(
        [(R[..., 2, 1] - R[..., 1, 2]) * inv_x,
         0.5 * sx,
         (R[..., 0, 1] + R[..., 1, 0]) * inv_x,
         (R[..., 0, 2] + R[..., 2, 0]) * inv_x],
        axis=-1,
    )
    sy = jnp.sqrt(jnp.maximum(t_y, _EPS))
    inv_y = 0.5 / sy
    q_y = jnp.stack(
        [(R[..., 0, 2] - R[..., 2, 0]) * inv_y,
         (R[..., 0, 1] + R[..., 1, 0]) * inv_y,
         0.5 * sy,
         (R[..., 1, 2] + R[..., 2, 1]) * inv_y],
        axis=-1,
    )
    sz = jnp.sqrt(jnp.maximum(t_z, _EPS))
    inv_z = 0.5 / sz
    q_z = jnp.stack(
        [(R[..., 1, 0] - R[..., 0, 1]) * inv_z,
         (R[..., 0, 2] + R[..., 2, 0]) * inv_z,
         (R[..., 1, 2] + R[..., 2, 1]) * inv_z,
         0.5 * sz],
        axis=-1,
    )
    pivots = jnp.stack([t_w, t_x, t_y, t_z], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # [..., 4cand, 4]
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    # canonical hemisphere w >= 0
    return jnp.where(q[..., :1] < 0, -q, q)


def quaternion_to_axis_angle(q):
    """Unit quaternion (w, x, y, z) -> axis-angle ``[..., 3]``."""
    qw = jnp.abs(q[..., 0])
    qv = jnp.where(q[..., :1] < 0, -q[..., 1:], q[..., 1:])
    # guarded norm: sqrt at 0 has a NaN derivative, which would poison
    # jacfwd through so3_log/sim3_log at IDENTITY rotations — exactly the
    # zero-residual edges a pose graph linearizes at. Double-where keeps
    # both value and tangent finite (small-branch scale is the Taylor
    # limit of 2*asin(x)/x = 2 + x^2/3 in x^2 = |qv|^2).
    sq = jnp.sum(qv * qv, axis=-1)
    small = sq < 1e-12
    sin_half = jnp.sqrt(jnp.where(small, 1.0, sq))
    theta = 2.0 * jnp.arctan2(sin_half, qw)
    scale = jnp.where(small, 2.0 + sq / 3.0, theta / (sin_half + _EPS))
    return scale[..., None] * qv


def so3_log(R):
    """Rotation matrix ``[..., 3, 3]`` -> axis-angle ``[..., 3]``.

    Goes through the quaternion (Shepperd extraction) so every angle,
    including theta ≈ pi, is well-conditioned in float32 — the same route
    g2o's SE3Quat takes (``se3quat.h:178-223`` stores rotation as
    quaternion and logs via axis-angle).
    """
    return quaternion_to_axis_angle(rotation_to_quaternion(R))


def _left_jacobian(omega):
    """SO(3) left Jacobian V such that se3_exp translation = V @ v."""
    theta2 = jnp.sum(omega * omega, axis=-1)
    _, b, c = _sinc_terms(theta2)
    K = hat(omega)
    K2 = jnp.matmul(K, K, precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * K2


def _left_jacobian_inv(omega):
    theta2 = jnp.sum(omega * omega, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    half = theta * 0.5
    small = theta2 < 1e-8
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / (jnp.sin(half) + _EPS)) / (theta2 + _EPS),
    )
    K = hat(omega)
    K2 = jnp.matmul(K, K, precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), K.shape)
    return eye - 0.5 * K + cot_term[..., None, None] * K2


def se3_exp(xi):
    """Tangent ``[..., 6] (omega, v)`` -> pose ``(R [...,3,3], t [...,3])``."""
    omega, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(omega)
    V = _left_jacobian(omega)
    t = jnp.einsum("...ij,...j->...i", V, v, precision=_HI)
    return R, t


def se3_log(R, t):
    """Pose -> tangent ``[..., 6] (omega, v)``."""
    omega = so3_log(R)
    Vinv = _left_jacobian_inv(omega)
    v = jnp.einsum("...ij,...j->...i", Vinv, t, precision=_HI)
    return jnp.concatenate([omega, v], axis=-1)


def compose(Ra, ta, Rb, tb):
    """(Ra, ta) ∘ (Rb, tb): first apply b, then a."""
    R = jnp.matmul(Ra, Rb, precision=_HI)
    t = jnp.einsum("...ij,...j->...i", Ra, tb, precision=_HI) + ta
    return R, t


def inverse(R, t):
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -jnp.einsum("...ij,...j->...i", Rinv, t, precision=_HI)
    return Rinv, tinv


def transform_points(R, t, pts):
    """Apply pose to points ``[..., N, 3]`` (R,t broadcast over N)."""
    return jnp.einsum("...ij,...nj->...ni", R, pts, precision=_HI) + t[..., None, :]


def identity_pose(dtype=jnp.float32):
    return jnp.eye(3, dtype=dtype), jnp.zeros((3,), dtype=dtype)
