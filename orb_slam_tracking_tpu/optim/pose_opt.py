"""Pose-only optimization: LM over SE(3) with Huber weights and staged
outlier reclassification.

TPU-native equivalent of ORB-SLAM's ``PoseOptimization`` built on the
vendored g2o stack the reference carries (``VertexSE3Expmap`` +
``EdgeSE3ProjectXYZOnlyPose``, ``Thirdparty/g2o/g2o/types/
types_six_dof_expmap.h:53-103``; LM loop ``optimization_algorithm_
levenberg.cpp:61-164``): minimize reprojection error of known 3D map
points over the camera pose only, with

- analytic Jacobians of the pinhole projection w.r.t. a left-multiplied
  se(3) increment (same linearization as ``linearizeOplus``),
- Huber kernel at delta = sqrt(5.991) (``robust_kernel_impl.h:76``),
- ORB-SLAM's 4-round schedule: optimize, reclassify outliers by chi2
  against 5.991 * sigma2(octave), re-optimize with outliers excluded
  (their "setLevel(1)"), dropping the robust kernel in late rounds,
- Nielsen lambda control.

Everything is fixed-shape; the rounds and LM iterations are static loops.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .lm import huber_weight, nielsen_update, solve_damped
from ..geometry import se3

# Matmul precision for the TRACKING hot path: DEFAULT (bf16), NOT
# pinned. Round 4 pinned these ops to HIGHEST (a 6-pass bf16 emulation
# of f32) citing the BA residual finding (optim/ba.py:_obs_residuals);
# round 5 reproduced the official-bench tracking regression on a quiet
# relay (151.11 fps vs r3's 253.41) and bisected it to exactly these
# pins: ORB_TRACKING_F32=0 measured 251.42 fps on the same relay
# session, a 1.66x step-time difference. The pin stays available for
# A/B (ORB_TRACKING_F32=1) but defaults OFF: unlike the BA residual
# path - where default precision measurably stalls convergence at a
# wrong optimum - the pose path never had a measured accuracy problem
# (the r3 clean-loop ATE 0.87 cm / device-loop 0.99 cm were achieved
# at default precision; +-0.5 px observation noise dominates any bf16
# rounding of the projection transform, and the LM reclassification
# absorbs the rest).
import os as _os
_HI = (jax.lax.Precision.HIGHEST
       if _os.environ.get("ORB_TRACKING_F32", "0") == "1"
       else jax.lax.Precision.DEFAULT)

__all__ = ["PoseOptResult", "optimize_pose"]

_CHI2_TH = 5.991  # 95% for 2 dof


class PoseOptResult(NamedTuple):
    R: jnp.ndarray          # [3, 3] optimized world-to-camera rotation
    t: jnp.ndarray          # [3]
    inlier: jnp.ndarray     # [N] bool final inlier classification
    n_inliers: jnp.ndarray  # [] int32
    chi2: jnp.ndarray       # [] float final robust cost over inliers


def _residuals_jac(R, t, pts, uv, fx, fy, cx, cy):
    """Reprojection residuals [N, 2] and Jacobians [N, 2, 6] w.r.t. a
    left-multiplied increment xi = (omega, v): T <- exp(xi) T."""
    pc = jnp.matmul(pts, R.T, precision=_HI) + t  # [N, 3] camera-frame pts
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * x * zi + cx
    v = fy * y * zi + cy
    r = jnp.stack([u, v], axis=-1) - uv      # [N, 2]

    # d(uv)/d(pc): [N, 2, 3]
    zero = jnp.zeros_like(x)
    J_proj = jnp.stack(
        [
            jnp.stack([fx * zi, zero, -fx * x * zi * zi], axis=-1),
            jnp.stack([zero, fy * zi, -fy * y * zi * zi], axis=-1),
        ],
        axis=-2,
    )
    # d(pc)/d(xi) = [-[pc]_x | I]: [N, 3, 6]
    J_pc = jnp.concatenate(
        [-se3.hat(pc), jnp.broadcast_to(jnp.eye(3), pc.shape[:-1] + (3, 3))], axis=-1
    )
    J = jnp.matmul(J_proj, J_pc, precision=_HI)  # [N, 2, 6]
    return r, J, z


def _robust_cost(r, inv_sigma2, active, use_huber, delta2):
    chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
    if use_huber:
        # robust cost: quadratic inside, linear outside
        rho = jnp.where(
            chi2 <= delta2, chi2, 2.0 * jnp.sqrt(delta2 * chi2) - delta2
        )
    else:
        rho = chi2
    return jnp.sum(jnp.where(active, rho, 0.0))


def _lm_rounds(R, t, r0, J0, z0, pts, uv, inv_sigma2, active, fx, fy, cx, cy,
               iters: int, use_huber: bool, delta_scale: float = 1.0,
               batched_solve: bool = False):
    """One optimization stage: `iters` LM steps over the active subset.

    Speculative-accept structure: the carry holds the linearization
    (r, J, z) AT the accepted pose, so each iteration runs exactly ONE
    residual+Jacobian pass (at the candidate) instead of a linearize pass
    plus a cost pass — on a rejected step the next solve reuses the carried
    linearization with a larger lambda, which is numerically identical to
    relinearizing at the unchanged pose. The final carry's (r, z) are the
    residuals at the returned pose, so callers reclassify without another
    pass.

    ``delta_scale`` widens the Huber threshold: a tight kernel (delta ~
    2.45 px) turns a coherent multi-pixel prediction error into a flat
    robust cost with spurious local minima; the first round therefore runs
    with a widened kernel so the quadratic basin captures the pose, and
    later rounds tighten back (graduated non-convexity).
    """
    delta2 = _CHI2_TH * delta_scale

    def step(carry, _):
        Rc, tc, lam, nu, cost, r, J, z = carry
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        w = huber_weight(chi2, delta2) if use_huber else jnp.ones_like(chi2)
        w = jnp.where(active, w * inv_sigma2, 0.0)
        H = jnp.einsum("nri,n,nrj->ij", J, w, J, precision=_HI)
        b = jnp.einsum("nri,n,nr->i", J, w, r, precision=_HI)
        dx = solve_damped(H, -b, lam, batched=batched_solve)
        dR, dt = se3.se3_exp(dx)
        R_new = jnp.matmul(dR, Rc, precision=_HI)
        t_new = jnp.matmul(dR, tc, precision=_HI) + dt
        r_new, J_new, z_new = _residuals_jac(R_new, t_new, pts, uv,
                                             fx, fy, cx, cy)
        new_cost = _robust_cost(r_new, inv_sigma2, active, use_huber, delta2)
        # predicted decrease of the quadratic model given the damped step:
        # 0.5 * dx^T (lam * D dx - b)   (g2o's rho denominator)
        pred = 0.5 * jnp.dot(dx, lam * jnp.diagonal(H) * dx - b)
        rho_gain = (cost - new_cost) / jnp.maximum(jnp.abs(pred), 1e-9)
        lam_new, nu_new = nielsen_update(lam, nu, rho_gain)
        good = new_cost < cost
        Rc = jnp.where(good, R_new, Rc)
        tc = jnp.where(good, t_new, tc)
        cost = jnp.where(good, new_cost, cost)
        r = jnp.where(good, r_new, r)
        J = jnp.where(good, J_new, J)
        z = jnp.where(good, z_new, z)
        return (Rc, tc, lam_new, nu_new, cost, r, J, z), None

    cost0 = _robust_cost(r0, inv_sigma2, active, use_huber, delta2)
    (R, t, _, _, cost, r, J, z), _ = jax.lax.scan(
        step,
        (R, t, jnp.float32(1e-4), jnp.float32(2.0), cost0, r0, J0, z0),
        None, length=iters,
    )
    return R, t, cost, r, J, z


@partial(jax.jit, static_argnames=("rounds", "iters_per_round",
                                   "coarse_delta_scale", "batched_solve"))
def optimize_pose(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    pts: jnp.ndarray,
    uv: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    rounds: int = 4,
    iters_per_round: int = 10,
    coarse_delta_scale: float = 25.0,
    batched_solve: bool = False,
) -> PoseOptResult:
    """Optimize a world-to-camera pose against known 3D points.

    R0, t0: initial pose. pts: [N, 3] world points. uv: [N, 2] observed
    (undistorted) pixels. inv_sigma2: [N] per-observation information
    (1/1.2^(2*octave) in ORB-SLAM). valid: [N] mask. K: [3, 3].
    ``coarse_delta_scale`` widens the first round's Huber basin; callers
    seeding from far-away poses (relocalization) pass a larger value so
    the expected residual magnitude stays inside the quadratic region.
    Callers that wrap this function in ``jax.vmap`` (multi-sequence DP)
    MUST pass ``batched_solve=True`` so the 6x6 damped solve takes the
    closed-form block-Schur path instead of one LU per batch element
    (under vmap the solve cannot detect the batch axis itself).
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    R, t = R0, t0
    inlier = valid
    # one linearization up front; thereafter every LM iteration does exactly
    # one residual+Jacobian pass, and rounds reuse the final linearization
    # of the previous round (the pose does not move between rounds)
    r, J, z = _residuals_jac(R, t, pts, uv, fx, fy, cx, cy)
    for rnd in range(rounds):
        use_huber = rnd < 2  # ORB-SLAM drops the robust kernel in late rounds
        # graduated kernel: wide basin first, nominal afterwards
        delta_scale = coarse_delta_scale if rnd == 0 else 1.0
        R, t, cost, r, J, z = _lm_rounds(
            R, t, r, J, z, pts, uv, inv_sigma2, inlier, fx, fy, cx, cy,
            iters_per_round, use_huber, delta_scale, batched_solve,
        )
        # reclassify against the full set each round (an outlier can return);
        # r/z are already the residuals at the returned pose
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        inlier = valid & (chi2 <= _CHI2_TH) & (z > 0)
    chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
    final_cost = jnp.sum(jnp.where(inlier, chi2, 0.0))
    return PoseOptResult(
        R=R,
        t=t,
        inlier=inlier,
        n_inliers=jnp.sum(inlier.astype(jnp.int32)),
        chi2=final_cost,
    )
