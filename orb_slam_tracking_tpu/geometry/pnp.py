"""Batched RANSAC PnP: camera pose from 2D-3D correspondences.

The relocalization back-end (full ORB-SLAM pairs ``SearchByBoW`` feature
matching with a PnP solver + RANSAC before pose refinement; the reference
only vendors the machinery, SURVEY.md §0). TPU-native design: all RANSAC
hypotheses solve in one batch — a 6-point DLT for the 3x4 projection
matrix via eigh of A^T A (the same pattern as the H/F solvers in
homography.py/fundamental.py), pose extracted by orthonormalizing the
rotation block with SVD, all hypotheses scored against all matches in one
einsum, winner refined by the caller (optim.pose_opt).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .sampling import sample_distinct

__all__ = ["PnPResult", "ransac_pnp"]


class PnPResult(NamedTuple):
    R: jnp.ndarray          # [3, 3] world-to-camera
    t: jnp.ndarray          # [3]
    inliers: jnp.ndarray    # [M] bool
    n_inliers: jnp.ndarray  # [] int32
    ok: jnp.ndarray         # [] bool (best hypothesis was well-posed)


def _solve_pnp_dlt(X, x, w=None):
    """Batched DLT for P [.., 3, 4] from [.., N>=6, 3] world points and
    [.., N, 2] normalized image coords (K pre-applied). Optional row
    weights ``w [.., N]`` (inlier refits)."""
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)  # [.., N, 4]
    zeros = jnp.zeros_like(Xh)
    u = x[..., 0:1]
    v = x[..., 1:2]
    r1 = jnp.concatenate([Xh, zeros, -u * Xh], axis=-1)  # [.., N, 12]
    r2 = jnp.concatenate([zeros, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [.., 2N, 12]
    if w is not None:
        ww = jnp.concatenate([w, w], axis=-1)[..., None]
        A = A * ww
    AtA = jnp.einsum("...ij,...ik->...jk", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[..., :, 0]
    P = p.reshape(p.shape[:-1] + (3, 4))
    return P


def _pose_from_P(P):
    """Extract (R, t) from P ~ s*[R|t] with arbitrary DLT sign s: flip by
    det so the rotation block has positive determinant, then take the
    closest rotation and the consistent translation scale."""
    M = P[..., :3]
    sgn = jnp.where(jnp.linalg.det(M) < 0, -1.0, 1.0)
    M = M * sgn[..., None, None]
    U, S, Vt = jnp.linalg.svd(M)
    R = U @ Vt  # det(+M) > 0 => det(R) = +1
    scale = jnp.mean(S, axis=-1)
    t = sgn[..., None] * P[..., 3] / jnp.where(scale < 1e-12, 1e-12, scale)[..., None]
    return R, t


@partial(jax.jit, static_argnames=("iterations",))
def ransac_pnp(
    pts: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    key: jnp.ndarray,
    iterations: int = 256,
    chi2_th: float = 5.991,
) -> PnPResult:
    """RANSAC pose from [M, 3] world points / [M, 2] pixel observations.

    The matches should be compacted to the front (valid rows first) so the
    uniform sample indices land on valid rows.
    """
    M = pts.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # normalized image coords (better DLT conditioning than raw pixels)
    xn = (uv[:, 0] - K[0, 2]) / K[0, 0]
    yn = (uv[:, 1] - K[1, 2]) / K[1, 1]
    x = jnp.stack([xn, yn], axis=-1)

    # distinct 6-point sets (duplicates make the DLT system rank-deficient)
    idx = sample_distinct(key, n_valid, iterations, 6)
    P = _solve_pnp_dlt(pts[idx], x[idx])           # [S, 3, 4]
    R, t = _pose_from_P(P)                          # [S, 3, 3], [S, 3]

    f2 = (K[0, 0] * K[1, 1])

    def classify(Rh, th_, tol_chi2):
        pc = jnp.einsum("...ij,mj->...mi", Rh, pts) + th_[..., None, :]
        z = pc[..., 2]
        zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        proj = pc[..., :2] * zi[..., None]
        err = jnp.sum((proj - x) ** 2, axis=-1)
        return (err * f2 < tol_chi2) & (z > 0) & valid

    # minimal 6-point DLT poses are noisy: score hypotheses with a WIDE
    # tolerance first, then locally optimize the TOP-k consensus sets in
    # one batch (batched weighted DLT refits with a tightening tolerance
    # schedule — LO-RANSAC) and keep whichever refined pose wins the real
    # chi2 gate.
    wide = 40.0 ** 2  # px^2
    topk = 32
    inl_wide = classify(R, t, wide)                 # [S, M]
    scores = jnp.sum(inl_wide.astype(jnp.int32), axis=-1)
    _, top = jax.lax.top_k(scores, topk)
    w = inl_wide[top].astype(jnp.float32)           # [k, M]
    pts_b = jnp.broadcast_to(pts[None], (topk,) + pts.shape)
    x_b = jnp.broadcast_to(x[None], (topk,) + x.shape)
    Rb = R[top]
    tb = t[top]
    # IMPORTANT: the schedule stops at a moderate tolerance — the weighted
    # DLT minimizes ALGEBRAIC error and diverges if its consensus set is
    # pruned too aggressively; the caller's geometric LM (optim.pose_opt)
    # does the final tightening.
    for tol in (wide / 4.0, chi2_th * 16.0, chi2_th * 4.0):
        Pb = _solve_pnp_dlt(pts_b, x_b, w)          # [k, 3, 4]
        Rb, tb = _pose_from_P(Pb)
        inl = classify(Rb, tb, tol)                 # [k, M]
        w = inl.astype(jnp.float32)
    n_per = jnp.sum(inl.astype(jnp.int32), axis=-1)
    b = jnp.argmax(n_per)
    return PnPResult(
        R=Rb[b],
        t=tb[b],
        inliers=inl[b],
        n_inliers=n_per[b],
        ok=n_per[b] >= 6,
    )
