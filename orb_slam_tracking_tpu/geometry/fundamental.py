"""Batched fundamental-matrix estimation and essential decomposition.

TPU-native replacement for the reference's F path: the 8-point algorithm
(``Initializer::ComputeF21`` spec; live code calls ``cv::findFundamentalMat``,
``Initialization/Initializer.cpp:150-167``) and
``cv::decomposeEssentialMat`` (``:457``). All hypotheses solve as one
batched eigh; the rank-2 constraint is enforced with a batched 3x3 SVD.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax as _lax

# float32 matmul precision on TPU for geometry solves (the default
# truncates to bfloat16 - see optim/ba.py:_obs_residuals).
_HI = _lax.Precision.HIGHEST

from .homography import normalize_points

__all__ = ["solve_f_8point", "decompose_essential", "fundamental_from_poses"]

_EPS = 1e-12


def solve_f_8point(x1: jnp.ndarray, x2: jnp.ndarray, w=None) -> jnp.ndarray:
    """Batched normalized 8-point fundamental matrix F21 (x2^T F x1 = 0).

    x1, x2: [..., N, 2] with N >= 8. Optional weights ``w [..., N]`` zero
    out rows (inlier refit). Returns [..., 3, 3], rank-2 enforced.
    """
    x1n, T1 = normalize_points(x1, w)
    x2n, T2 = normalize_points(x2, w)
    u, v = x1n[..., 0], x1n[..., 1]
    up, vp = x2n[..., 0], x2n[..., 1]
    one = jnp.ones_like(u)
    A = jnp.stack(
        [up * u, up * v, up, vp * u, vp * v, vp, u, v, one], axis=-1
    )  # [..., N, 9]
    if w is not None:
        A = A * w[..., None]
    AtA = jnp.einsum("...ij,...ik->...jk", A, A, precision=_HI)
    _, vecs = jnp.linalg.eigh(AtA)
    f = vecs[..., :, 0]
    Fn = f.reshape(f.shape[:-1] + (3, 3))
    # enforce rank 2: zero the smallest singular value
    U, S, Vt = jnp.linalg.svd(Fn)
    S2 = S.at[..., 2].set(0.0)
    Fn = jnp.matmul(U, S2[..., :, None] * Vt, precision=_HI)
    return jnp.matmul(jnp.matmul(jnp.swapaxes(T2, -1, -2), Fn, precision=_HI), T1, precision=_HI)


def decompose_essential(F: jnp.ndarray, K: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """E = K^T F K -> the 4 (R, t) candidates.

    Returns (R [4, 3, 3], t [4, 3] unit-norm): {R1, R2} x {t, -t}, det(R)
    corrected to +1 (``cv::decomposeEssentialMat`` semantics).
    """
    E = jnp.matmul(jnp.matmul(K.T, F, precision=_HI), K, precision=_HI)
    U, _, Vt = jnp.linalg.svd(E)
    # proper rotations: flip sign if det negative
    U = jnp.where(jnp.linalg.det(U) < 0, -U, U)
    Vt = jnp.where(jnp.linalg.det(Vt) < 0, -Vt, Vt)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = jnp.matmul(jnp.matmul(U, W, precision=_HI), Vt, precision=_HI)
    R2 = jnp.matmul(jnp.matmul(U, W.T, precision=_HI), Vt, precision=_HI)
    t = U[:, 2]
    t = t / (jnp.linalg.norm(t) + _EPS)
    R = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return R, ts


def fundamental_from_poses(R1, t1, R2, t2, K):
    """F21 from two world-to-camera poses: maps view-1 pixels to view-2
    epipolar lines, ``F21 = K^-T [t21]_x R21 K^-1`` with the relative pose
    ``T21 = T2 o T1^-1`` (ORB-SLAM's ComputeF12 transposed convention;
    used by the triangulation matcher's epipolar gate)."""
    R21 = jnp.matmul(R2, R1.T, precision=_HI)
    t21 = t2 - jnp.matmul(R21, t1, precision=_HI)
    tx = jnp.array([
        [0.0, -t21[2], t21[1]],
        [t21[2], 0.0, -t21[0]],
        [-t21[1], t21[0], 0.0],
    ])
    Kinv = jnp.linalg.inv(K)
    return jnp.matmul(jnp.matmul(jnp.matmul(Kinv.T, tx, precision=_HI), R21, precision=_HI), Kinv, precision=_HI)
