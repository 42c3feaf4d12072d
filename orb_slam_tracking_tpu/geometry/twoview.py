"""Two-view monocular initialization: batched H/F RANSAC, model selection,
pose recovery, triangulation, and point vetting — one jitted program.

TPU-native replacement for ``Initializer::Initialize``
(``Initialization/Initializer.cpp:19-125``) and its helpers. The
reference's two host threads (H-RANSAC ∥ F-RANSAC, ``:78-85``) become two
batched hypothesis sweeps inside the same XLA program; its per-candidate
``CheckRT`` loop (``:569-713``) becomes one [candidates, matches]
triangulation + masking pass. Scoring replicates the hand-rolled chi-square
scheme (symmetric transfer for H with th=5.991, ``CheckHomography``
``:268-353``; epipolar for F with th=3.841 / score-th 5.991,
``CheckFundamental`` ``:355-438``) and the model-selection ratio
RH = SH/(SH+SF) (``:89-117``).

The reference's inlier-compaction indexing bug in ``CheckRT``
(``:607-693``, outputs written to wrong slots) is NOT replicated: all
per-match arrays here stay aligned with the match axis.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import InitConfig
from .fundamental import decompose_essential, solve_f_8point
from .homography import decompose_homography, solve_h_dlt
from .sampling import sample_distinct
from .triangulate import triangulate_dlt

# float32 matmul precision for small geometry ops on TPU (the
# default truncates to bfloat16 — see optim/ba.py:_obs_residuals).
_HI = jax.lax.Precision.HIGHEST

__all__ = ["TwoViewResult", "initialize_two_view", "score_homography", "score_fundamental"]

_COS_PARALLAX_MAX = 0.99998  # Initializer.cpp:664-670


class TwoViewResult(NamedTuple):
    success: jnp.ndarray        # [] bool
    R21: jnp.ndarray            # [3, 3] frame1 -> frame2 rotation
    t21: jnp.ndarray            # [3] unit-scale translation
    points3d: jnp.ndarray       # [M, 3] in frame-1 camera coords
    tri_mask: jnp.ndarray       # [M] bool triangulated-and-vetted
    used_homography: jnp.ndarray  # [] bool
    score_h: jnp.ndarray        # [] float
    score_f: jnp.ndarray        # [] float
    n_inliers: jnp.ndarray      # [] int32 inliers of the selected model
    n_good: jnp.ndarray         # [] int32 vetted triangulations
    parallax_deg: jnp.ndarray   # [] float


def _to_h(x):
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def score_homography(H21, x1, x2, valid, sigma):
    """Symmetric-transfer chi2 score (``CheckHomography``). H21 may be
    batched [..., 3, 3]; x1/x2 are [M, 2]. Returns (score [...], inlier
    mask [..., M])."""
    th = 5.991
    inv_sigma2 = 1.0 / (sigma * sigma)
    H12 = jnp.linalg.inv(H21)
    p1 = _to_h(x1)
    p2 = _to_h(x2)
    # view2 <- view1
    q2 = jnp.einsum("...ij,mj->...mi", H21, p1, precision=_HI)
    q2 = q2[..., :2] / jnp.where(jnp.abs(q2[..., 2:]) < 1e-12, 1e-12, q2[..., 2:])
    chi2_2 = jnp.sum((x2 - q2) ** 2, axis=-1) * inv_sigma2
    # view1 <- view2
    q1 = jnp.einsum("...ij,mj->...mi", H12, p2, precision=_HI)
    q1 = q1[..., :2] / jnp.where(jnp.abs(q1[..., 2:]) < 1e-12, 1e-12, q1[..., 2:])
    chi2_1 = jnp.sum((x1 - q1) ** 2, axis=-1) * inv_sigma2

    in1 = chi2_1 < th
    in2 = chi2_2 < th
    inlier = in1 & in2 & valid
    score = jnp.sum(
        jnp.where(valid & in1, th - chi2_1, 0.0)
        + jnp.where(valid & in2, th - chi2_2, 0.0),
        axis=-1,
    )
    return score, inlier


def score_fundamental(F21, x1, x2, valid, sigma):
    """Epipolar chi2 score (``CheckFundamental``): point-to-line distances
    both directions, th=3.841, score threshold 5.991."""
    th = 3.841
    th_score = 5.991
    inv_sigma2 = 1.0 / (sigma * sigma)
    p1 = _to_h(x1)
    p2 = _to_h(x2)
    # epipolar line in view 2 of x1: l2 = F21 p1
    l2 = jnp.einsum("...ij,mj->...mi", F21, p1, precision=_HI)
    num2 = jnp.einsum("mi,...mi->...m", p2, l2, precision=_HI)
    den2 = l2[..., 0] ** 2 + l2[..., 1] ** 2
    chi2_2 = (num2 * num2) / jnp.maximum(den2, 1e-12) * inv_sigma2
    # epipolar line in view 1 of x2: l1 = F21^T p2
    l1 = jnp.einsum("...ji,mj->...mi", F21, p2, precision=_HI)
    num1 = jnp.einsum("mi,...mi->...m", p1, l1, precision=_HI)
    den1 = l1[..., 0] ** 2 + l1[..., 1] ** 2
    chi2_1 = (num1 * num1) / jnp.maximum(den1, 1e-12) * inv_sigma2

    in1 = chi2_1 < th
    in2 = chi2_2 < th
    inlier = in1 & in2 & valid
    score = jnp.sum(
        jnp.where(valid & in1, th_score - chi2_1, 0.0)
        + jnp.where(valid & in2, th_score - chi2_2, 0.0),
        axis=-1,
    )
    return score, inlier


def _sample_sets(key, n_valid, iters):
    """[iters, 8] distinct indices into the compacted (front-packed) match
    arrays — the reference draws without replacement
    (``Initializer.cpp:41-66``); duplicate indices would waste hypotheses
    on degenerate 8-point systems."""
    return sample_distinct(key, n_valid, iters, 8)


def _check_rt(R, t, x1, x2, valid, K, sigma2):
    """Vet candidate poses by triangulation (``CheckRT``, Initializer.cpp:
    569-713). R: [C, 3, 3], t: [C, 3]. Returns (n_good [C],
    parallax_deg [C], pts [C, M, 3], good [C, M])."""
    C = R.shape[0]
    M = x1.shape[0]
    eye34 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P1 = jnp.matmul(K, eye34, precision=_HI)[None]  # [1, 3, 4]
    Rt = jnp.concatenate([R, t[..., None]], axis=-1)  # [C, 3, 4]
    P2 = jnp.einsum("ij,cjk->cik", K, Rt, precision=_HI)

    x1b = jnp.broadcast_to(x1[None], (C, M, 2))
    x2b = jnp.broadcast_to(x2[None], (C, M, 2))
    pts = triangulate_dlt(jnp.broadcast_to(P1, (C, 3, 4)), P2, x1b, x2b)  # [C, M, 3]

    finite = jnp.all(jnp.isfinite(pts), axis=-1)
    # parallax between the two viewing rays
    O2 = -jnp.einsum("cji,cj->ci", R, t, precision=_HI)  # camera-2 centre in frame-1 coords
    n1 = pts
    n2 = pts - O2[:, None, :]
    cos_par = jnp.sum(n1 * n2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1), 1e-12
    )
    z1 = pts[..., 2]
    p2c = jnp.einsum("cij,cmj->cmi", R, pts, precision=_HI) + t[:, None, :]
    z2 = p2c[..., 2]
    low_par = cos_par < _COS_PARALLAX_MAX
    # reject negative depth unless the point is at near-infinite parallax
    # (reference semantics: depth check applies only when parallax is finite)
    pass_depth = jnp.logical_not(((z1 <= 0) | (z2 <= 0)) & low_par)

    # reprojection error in both views (pinhole on undistorted coords)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def reproj_err(p, x):
        zi = jnp.where(jnp.abs(p[..., 2]) < 1e-12, 1e-12, p[..., 2])
        u = fx * p[..., 0] / zi + cx
        v = fy * p[..., 1] / zi + cy
        return (u - x[..., 0]) ** 2 + (v - x[..., 1]) ** 2

    err1 = reproj_err(pts, x1b)
    err2 = reproj_err(p2c, x2b)
    th = 4.0 * sigma2
    pass_reproj = (err1 < th) & (err2 < th)

    # nGood counts every vetted triangulation; the parallax flag only gates
    # the per-point "good" mask (reference CheckRT: nGood++ unconditional,
    # vbGood set only when cosParallax < 0.99998)
    counted = valid[None, :] & finite & pass_depth & pass_reproj
    good = counted & low_par
    n_good = jnp.sum(counted.astype(jnp.int32), axis=-1)

    # parallax statistic: 50th-smallest cos among counted points
    # (Initializer.cpp:701-709)
    cos_masked = jnp.where(counted, cos_par, 1.0)  # fill with cos=1 (0 deg)
    cos_sorted = jnp.sort(cos_masked, axis=-1)  # ascending
    n_counted = jnp.sum(counted.astype(jnp.int32), axis=-1)
    idx = jnp.minimum(50, jnp.maximum(n_counted - 1, 0))
    sel = jnp.take_along_axis(cos_sorted, idx[:, None], axis=-1)[:, 0]
    parallax = jnp.degrees(jnp.arccos(jnp.clip(sel, -1.0, 1.0)))
    parallax = jnp.where(n_counted > 0, parallax, 0.0)
    return n_good, parallax, pts, good


@partial(jax.jit, static_argnames=("cfg",))
def initialize_two_view(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    key: jnp.ndarray,
    cfg: InitConfig,
) -> TwoViewResult:
    """Full two-view bootstrap on matched, undistorted level-0 coords.

    x1, x2: [M, 2] compacted match coordinates (front-packed; see
    ``ops.matcher.compact_matches``), valid: [M] mask, K: [3, 3], key:
    PRNG key (replaces the reference's ``srand(0)``,
    ``demo_initialization.cpp:42,59``).
    """
    sigma = cfg.sigma
    sigma2 = sigma * sigma
    n_valid = jnp.sum(valid.astype(jnp.int32))
    kh, kf = jax.random.split(key)

    # --- batched RANSAC: all hypotheses for both models in one program ---
    def best_model(subkey, solver, scorer):
        idx = _sample_sets(subkey, n_valid, cfg.ransac_iterations)  # [S, 8]
        s1 = x1[idx]  # [S, 8, 2]
        s2 = x2[idx]
        models = solver(s1, s2)  # [S, 3, 3]
        scores, inliers = scorer(models, x1, x2, valid, sigma)  # [S], [S, M]
        b = jnp.argmax(scores)
        # local-optimization step: refit on all inliers of the winning
        # hypothesis (weighted DLT), rescore; keep whichever scores higher.
        w = inliers[b].astype(x1.dtype)
        refit = solver(x1[None], x2[None], w[None])[0]
        r_score, r_inliers = scorer(refit, x1, x2, valid, sigma)
        better = r_score > scores[b]
        model = jnp.where(better, refit, models[b])
        score = jnp.where(better, r_score, scores[b])
        inl = jnp.where(better, r_inliers, inliers[b])
        return model, score, inl

    H, sh, in_h = best_model(kh, solve_h_dlt, score_homography)
    F, sf, in_f = best_model(kf, solve_f_8point, score_fundamental)

    rh = sh / jnp.maximum(sh + sf, 1e-12)
    use_h = rh > cfg.rh_threshold  # Initializer.cpp:111

    # --- pose candidates from the selected model (both computed; selected
    # by masking — cheap relative to CheckRT) ---
    Rh, th_, vh = decompose_homography(H, K)         # [8, ...]
    Rf, tf_ = decompose_essential(F, K)              # [4, ...]
    Rf = jnp.concatenate([Rf, jnp.broadcast_to(jnp.eye(3), (4, 3, 3))])
    tf_ = jnp.concatenate([tf_, jnp.zeros((4, 3))])
    vf = jnp.array([True] * 4 + [False] * 4)

    Rc = jnp.where(use_h, Rh, Rf)
    tc = jnp.where(use_h, th_, tf_)
    vc = jnp.where(use_h, vh, vf)
    inlier = jnp.where(use_h, in_h, in_f)
    n_inliers = jnp.sum(inlier.astype(jnp.int32))

    n_good, parallax, pts, good = _check_rt(Rc, tc, x1, x2, inlier, K, sigma2)
    n_good = jnp.where(vc, n_good, -1)

    # Deduplicate near-identical candidates: Faugeras sign combinations
    # coincide when x1 or x3 ~ 0, and a duplicate must not masquerade as a
    # competing interpretation in the ambiguity gate below. Keep the first
    # of each duplicate group.
    rel_trace = jnp.einsum("cij,dij->cd", Rc, Rc, precision=_HI)       # tr(Rc^T Rd)
    t_dot = jnp.einsum("ci,di->cd", tc, tc, precision=_HI)
    same = (rel_trace > 3.0 - 1e-4) & (t_dot > 1.0 - 1e-4)
    idx_c = jnp.arange(Rc.shape[0])
    earlier = idx_c[None, :] < idx_c[:, None]
    dup = jnp.any(same & earlier, axis=1)
    n_good = jnp.where(dup, -1, n_good)

    order = jnp.argsort(-n_good)
    best = order[0]
    best_good = n_good[best]
    second_good = n_good[order[1]]

    # acceptance gates (Initializer.cpp:517-554)
    min_good = jnp.maximum(
        jnp.int32(cfg.min_triangulated),
        (0.9 * n_inliers.astype(jnp.float32)).astype(jnp.int32),
    )
    # 0.7 ambiguity factor per the reference (Initializer.cpp:527); the
    # duplicate-candidate pass above keeps coincident Faugeras sign
    # combinations from tripping this gate.
    unambiguous = second_good.astype(jnp.float32) < 0.7 * best_good.astype(jnp.float32)
    enough_parallax = parallax[best] > cfg.min_parallax_deg
    success = (
        (n_valid >= cfg.min_matches)
        & (best_good >= min_good)
        & unambiguous
        & enough_parallax
    )

    return TwoViewResult(
        success=success,
        R21=Rc[best],
        t21=tc[best],
        points3d=pts[best],
        tri_mask=good[best] & success,
        used_homography=use_h,
        score_h=sh,
        score_f=sf,
        n_inliers=n_inliers,
        n_good=best_good,
        parallax_deg=parallax[best],
    )
