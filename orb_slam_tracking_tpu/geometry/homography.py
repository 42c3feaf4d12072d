"""Batched homography estimation and decomposition.

TPU-native replacement for the reference's homography path: the hand-rolled
normalized DLT (``Initializer::ComputeH21`` spec, the live code delegates to
``cv::findHomography``, ``Initialization/Initializer.cpp:127-148``) and
``cv::decomposeHomographyMat`` (``:478``). Estimation is a batched
8-point DLT solved via eigh of A^T A (hypotheses stacked on a leading axis
— the RANSAC loop becomes one tensor program). Decomposition follows
Faugeras & Lustman's 8-solution method — the construction original
ORB-SLAM's ``ReconstructH`` uses — so every candidate (R, t, n) is produced
with static shape [8, ...].
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax as _lax

# float32 matmul precision on TPU for geometry solves (the default
# truncates to bfloat16 - see optim/ba.py:_obs_residuals).
_HI = _lax.Precision.HIGHEST

__all__ = ["normalize_points", "solve_h_dlt", "decompose_homography"]

_EPS = 1e-12


def normalize_points(x: jnp.ndarray, w=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Similarity-normalize point sets for DLT conditioning.

    x: [..., N, 2]. Returns (xn [..., N, 2], T [..., 3, 3]) with
    xn = T @ x in homogeneous coords. Mean-absolute-deviation scaling, the
    same scheme as ORB-SLAM's ``Normalize``. Optional per-point weights
    ``w [..., N]`` restrict the statistics to a subset (used for
    inlier refits).
    """
    if w is None:
        mean = jnp.mean(x, axis=-2, keepdims=True)
        d = x - mean
        dev = jnp.mean(jnp.abs(d), axis=-2, keepdims=True) + _EPS
    else:
        wk = w[..., None]
        tot = jnp.maximum(jnp.sum(wk, axis=-2, keepdims=True), _EPS)
        mean = jnp.sum(x * wk, axis=-2, keepdims=True) / tot
        d = x - mean
        dev = jnp.sum(jnp.abs(d) * wk, axis=-2, keepdims=True) / tot + _EPS
    s = 1.0 / dev
    xn = d * s
    sx = s[..., 0, 0]
    sy = s[..., 0, 1]
    mx = mean[..., 0, 0]
    my = mean[..., 0, 1]
    zero = jnp.zeros_like(sx)
    one = jnp.ones_like(sx)
    T = jnp.stack(
        [
            jnp.stack([sx, zero, -mx * sx], axis=-1),
            jnp.stack([zero, sy, -my * sy], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    return xn, T


def solve_h_dlt(x1: jnp.ndarray, x2: jnp.ndarray, w=None) -> jnp.ndarray:
    """Batched homography H21 (maps view-1 points to view-2).

    x1, x2: [..., N, 2] correspondences (N >= 4; the pipeline uses 8-point
    sets like the reference's RANSAC sets, ``Initializer.cpp:41-66``).
    Optional weights ``w [..., N]`` zero out rows (inlier refit).
    Returns [..., 3, 3] (up to scale/sign).
    """
    x1n, T1 = normalize_points(x1, w)
    x2n, T2 = normalize_points(x2, w)
    u, v = x1n[..., 0], x1n[..., 1]
    up, vp = x2n[..., 0], x2n[..., 1]
    zero = jnp.zeros_like(u)
    one = jnp.ones_like(u)
    # standard 2-rows-per-point DLT system
    r1 = jnp.stack([zero, zero, zero, -u, -v, -one, vp * u, vp * v, vp], axis=-1)
    r2 = jnp.stack([u, v, one, zero, zero, zero, -up * u, -up * v, -up], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [..., 2N, 9]
    if w is not None:
        ww = jnp.concatenate([w, w], axis=-1)[..., None]
        A = A * ww
    AtA = jnp.einsum("...ij,...ik->...jk", A, A, precision=_HI)
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., :, 0]
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    # denormalize: H = T2^-1 Hn T1
    T2inv = jnp.linalg.inv(T2)
    return jnp.matmul(jnp.matmul(T2inv, Hn, precision=_HI), T1, precision=_HI)


def decompose_homography(H: jnp.ndarray, K: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Faugeras 8-solution decomposition of a calibrated homography.

    H: [3, 3] (view1 -> view2 pixel homography), K: [3, 3].
    Returns (R [8, 3, 3], t [8, 3] unit-norm, valid [8] bool). Solutions
    where d1 ~ d2 or d2 ~ d3 (pure-rotation degenerate cases) are flagged
    invalid rather than producing NaNs.
    """
    Kinv = jnp.linalg.inv(K)
    A = jnp.matmul(jnp.matmul(Kinv, H, precision=_HI), K, precision=_HI)
    U, S, Vt = jnp.linalg.svd(A)
    d1, d2, d3 = S[0], S[1], S[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    V = Vt.T

    denom = jnp.maximum(d1 * d1 - d3 * d3, _EPS)
    x1 = jnp.sqrt(jnp.maximum(d1 * d1 - d2 * d2, 0.0) / denom)
    x3 = jnp.sqrt(jnp.maximum(d2 * d2 - d3 * d3, 0.0) / denom)
    e1 = jnp.array([1.0, 1.0, -1.0, -1.0])
    e3 = jnp.array([1.0, -1.0, 1.0, -1.0])

    def build(case_pos: bool):
        if case_pos:
            sin_t = (d1 - d3) * x1 * x3 / jnp.maximum(d2, _EPS)
            cos_t = (d1 * x3 * x3 + d3 * x1 * x1) / jnp.maximum(d2, _EPS)
            st = e1 * e3 * sin_t  # [4]
            ct = jnp.broadcast_to(cos_t, (4,))
            zero = jnp.zeros(4)
            one = jnp.ones(4)
            Rp = jnp.stack(
                [
                    jnp.stack([ct, zero, -st], axis=-1),
                    jnp.stack([zero, one, zero], axis=-1),
                    jnp.stack([st, zero, ct], axis=-1),
                ],
                axis=-2,
            )  # [4, 3, 3]
            tp = (d1 - d3) * jnp.stack([e1 * x1, zero, -e3 * x3], axis=-1)  # [4, 3]
        else:
            sin_p = (d1 + d3) * x1 * x3 / jnp.maximum(d2, _EPS)
            cos_p = (d3 * x1 * x1 - d1 * x3 * x3) / jnp.maximum(d2, _EPS)
            sp = e1 * e3 * sin_p
            cp = jnp.broadcast_to(cos_p, (4,))
            zero = jnp.zeros(4)
            mone = -jnp.ones(4)
            Rp = jnp.stack(
                [
                    jnp.stack([cp, zero, sp], axis=-1),
                    jnp.stack([zero, mone, zero], axis=-1),
                    jnp.stack([sp, zero, -cp], axis=-1),
                ],
                axis=-2,
            )
            tp = (d1 + d3) * jnp.stack([e1 * x1, zero, e3 * x3], axis=-1)
        R = s * jnp.matmul(jnp.matmul(U[None], Rp, precision=_HI), Vt[None], precision=_HI)
        t = jnp.einsum("ij,nj->ni", U, tp, precision=_HI)
        t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + _EPS)
        return R, t

    Rpos, tpos = build(True)
    Rneg, tneg = build(False)
    R = jnp.concatenate([Rpos, Rneg])  # [8, 3, 3]
    t = jnp.concatenate([tpos, tneg])  # [8, 3]
    # degenerate when singular values coincide (pure rotation / planar edge)
    ok = (d1 / jnp.maximum(d2, _EPS) > 1.0001) | (d2 / jnp.maximum(d3, _EPS) > 1.0001)
    valid = jnp.broadcast_to(ok, (8,))
    return R, t, valid
