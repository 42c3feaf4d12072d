"""Sim(3): similarity transforms for scale-drift-aware loop correction.

TPU-native equivalent of the vendored g2o Sim(3) stack — the ``Sim3``
type with exp/log (``Thirdparty/g2o/g2o/types/sim3.h:41-150``), the
Sim(3) vertices/edges (``types_seven_dof_expmap.h:48,99,130,152``), and
the role of ORB-SLAM's ``Sim3Solver`` (RANSAC over minimal sets, closed
-form Horn/Umeyama) + ``Optimizer::OptimizeSim3`` (robust LM on
bidirectional reprojection residuals). Monocular SLAM accumulates scale
drift; loop closure estimates the 7-dof relative transform between the
loop keyframes from 3D-3D matched map points.

Representation: ``(s, R, t)`` with action ``X -> s * R @ X + t``; the
tangent is ``xi = [rho(3), phi(3), sigma]`` with the left-multiplied
convention used throughout (matching ``geometry/se3.py``): for small xi,
``delta(pc) = rho - hat(pc) phi + sigma * pc`` — which is why the 7-dof
reprojection Jacobian below is the SE(3) one plus a single scale column.

Everything is batched and jit-friendly: closed-form 3x3 math, static
iteration counts, ``jnp.where`` small-angle branches.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .sampling import sample_distinct
from .se3 import hat, so3_exp, so3_log

# float32 matmul precision on TPU for Sim(3)/pose algebra (the default
# truncates to bfloat16 - see optim/ba.py:_obs_residuals).
_HI = jax.lax.Precision.HIGHEST

__all__ = [
    "Sim3", "sim3_exp", "sim3_log", "sim3_apply", "sim3_inverse",
    "sim3_compose", "solve_sim3_horn", "ransac_sim3", "optimize_sim3",
]

_EPS = 1e-8


class Sim3(NamedTuple):
    s: jnp.ndarray  # [...] scale
    R: jnp.ndarray  # [..., 3, 3]
    t: jnp.ndarray  # [..., 3]


def sim3_apply(g: Sim3, X: jnp.ndarray) -> jnp.ndarray:
    """X [..., N, 3] -> s R X + t."""
    return g.s[..., None, None] * jnp.einsum(
        "...ij,...nj->...ni", g.R, X, precision=_HI
    ) + g.t[..., None, :]


def sim3_inverse(g: Sim3) -> Sim3:
    si = 1.0 / g.s
    Rt = jnp.swapaxes(g.R, -1, -2)
    return Sim3(s=si, R=Rt, t=-si[..., None] * jnp.einsum("...ij,...j->...i", Rt, g.t, precision=_HI))


def sim3_compose(a: Sim3, b: Sim3) -> Sim3:
    """a o b (apply b first)."""
    return Sim3(
        s=a.s * b.s,
        R=jnp.matmul(a.R, b.R, precision=_HI),
        t=a.s[..., None] * jnp.einsum("...ij,...j->...i", a.R, b.t, precision=_HI) + a.t,
    )


def _w_matrix(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The Sim(3) exponential's translation mixer: ``t = W rho`` with
    ``W = int_0^1 e^{sigma u} exp(u phi) du`` — the closed form of
    ``g2o/sim3.h:90-150``. Written as
    ``W = C I + a1 hat(phi) + a2 hat(phi)^2`` with the four
    small-parameter regimes (sigma->0, theta->0, both) branch-free.

    With the scalar integrals
      C   = (e^s - 1)/s
      I_s = [e^s (s sin th - th cos th) + th] / (s^2 + th^2)
      I_c = [e^s (s cos th + th sin th) - s] / (s^2 + th^2)
    the coefficients are a1 = I_s/th, a2 = (C - I_c)/th^2.
    """
    theta = jnp.linalg.norm(phi, axis=-1)
    small_s = jnp.abs(sigma) < 1e-5
    small_t = theta < 1e-5
    s2 = jnp.where(small_s, 1.0, sigma)
    t2 = jnp.where(small_t, 1.0, theta)
    es = jnp.exp(sigma)
    c = jnp.cos(theta)
    sn = jnp.sin(theta)
    denom = s2 * s2 + t2 * t2

    C = jnp.where(small_s, 1.0 + sigma / 2.0, (es - 1.0) / s2)

    a1_gen = (es * (s2 * sn - t2 * c) + t2) / (t2 * denom)
    a1_s0 = (1.0 - c) / (t2 * t2)
    a1_t0 = (es * (s2 - 1.0) + 1.0) / (s2 * s2)
    a1_00 = jnp.full_like(theta, 0.5)
    a1 = jnp.where(
        small_t, jnp.where(small_s, a1_00, a1_t0),
        jnp.where(small_s, a1_s0, a1_gen),
    )

    I_c = (es * (s2 * c + t2 * sn) - s2) / denom
    a2_gen = (C - I_c) / (t2 * t2)
    a2_s0 = (t2 - sn) / (t2 * t2 * t2)
    a2_t0 = (es * (s2 * s2 / 2.0 - s2 + 1.0) - 1.0) / (s2 * s2 * s2)
    a2_00 = jnp.full_like(theta, 1.0 / 6.0)
    a2 = jnp.where(
        small_t, jnp.where(small_s, a2_00, a2_t0),
        jnp.where(small_s, a2_s0, a2_gen),
    )

    Phi = hat(phi)
    return (
        C[..., None, None] * jnp.eye(3, dtype=phi.dtype)
        + a1[..., None, None] * Phi
        + a2[..., None, None] * jnp.matmul(Phi, Phi, precision=_HI)
    )


def sim3_exp(xi: jnp.ndarray) -> Sim3:
    """xi [..., 7] = [rho, phi, sigma] -> Sim3 (g2o ``Sim3(update)``
    semantics, ``sim3.h:90-150``)."""
    rho = xi[..., 0:3]
    phi = xi[..., 3:6]
    sigma = xi[..., 6]
    W = _w_matrix(phi, sigma)
    return Sim3(
        s=jnp.exp(sigma),
        R=so3_exp(phi),
        t=jnp.einsum("...ij,...j->...i", W, rho, precision=_HI),
    )


def sim3_log(g: Sim3) -> jnp.ndarray:
    """Inverse of sim3_exp: Sim3 -> xi [..., 7]."""
    phi = so3_log(g.R)
    sigma = jnp.log(g.s)
    W = _w_matrix(phi, sigma)
    rho = jnp.linalg.solve(W, g.t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def solve_sim3_horn(x1: jnp.ndarray, x2: jnp.ndarray,
                    w: jnp.ndarray | None = None) -> Sim3:
    """Closed-form weighted Horn/Umeyama: the Sim3 g with x1 ~ g(x2).

    x1, x2: [..., N, 3]; w: optional [..., N] weights. This is the
    minimal-set solver inside ORB-SLAM's ``Sim3Solver::ComputeSim3``.
    """
    if w is None:
        w = jnp.ones(x1.shape[:-1], x1.dtype)
    wn = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), _EPS)
    mu1 = jnp.einsum("...n,...ni->...i", wn, x1, precision=_HI)
    mu2 = jnp.einsum("...n,...ni->...i", wn, x2, precision=_HI)
    c1 = x1 - mu1[..., None, :]
    c2 = x2 - mu2[..., None, :]
    Sigma = jnp.einsum("...n,...ni,...nj->...ij", wn, c1, c2, precision=_HI)
    U, D, Vt = jnp.linalg.svd(Sigma)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.ones(D.shape[:-1] + (3,), x1.dtype)
    S = S.at[..., 2].set(jnp.where(det < 0, -1.0, 1.0))
    R = jnp.matmul(U, S[..., :, None] * Vt, precision=_HI)
    var2 = jnp.einsum("...n,...ni->...", wn, c2 * c2, precision=_HI)
    s = jnp.sum(D * S, axis=-1) / jnp.maximum(var2, _EPS)
    t = mu1 - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu2, precision=_HI)
    return Sim3(s=s, R=R, t=t)


class Sim3RansacResult(NamedTuple):
    g: Sim3
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


@partial(jax.jit, static_argnames=("iterations",))
def ransac_sim3(
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    valid: jnp.ndarray,
    key: jnp.ndarray,
    iterations: int = 256,
    tol: float = 0.05,
    min_inliers: int = 6,
) -> Sim3RansacResult:
    """RANSAC Sim(3) from matched 3D points (ORB-SLAM ``Sim3Solver``
    ``iterate`` role, with the reprojection gate replaced by a metric
    3D gate ``tol`` — callers refine with ``optimize_sim3``). Matched
    rows must be compacted to the front."""
    n_valid = jnp.sum(valid.astype(jnp.int32))
    idx = sample_distinct(key, n_valid, iterations, 3)     # [S, 3]
    g = solve_sim3_horn(x1[idx], x2[idx])                  # batched [S]
    pred = sim3_apply(g, x2)                               # broadcast [S, N, 3]
    err = jnp.linalg.norm(pred - x1[None], axis=-1)        # [S, N]
    inl = (err < tol) & valid[None, :]
    scores = jnp.sum(inl.astype(jnp.int32), axis=-1)
    b = jnp.argmax(scores)
    # refit on the winner's inliers
    w = inl[b].astype(x1.dtype)
    g_fit = solve_sim3_horn(x1, x2, w)
    pred = sim3_apply(g_fit, x2)
    inl_fit = (jnp.linalg.norm(pred - x1, axis=-1) < tol) & valid
    better = jnp.sum(inl_fit.astype(jnp.int32)) >= scores[b]
    g_best = Sim3(
        s=jnp.where(better, g_fit.s, g.s[b]),
        R=jnp.where(better, g_fit.R, g.R[b]),
        t=jnp.where(better, g_fit.t, g.t[b]),
    )
    inliers = jnp.where(better, inl_fit, inl[b])
    n = jnp.sum(inliers.astype(jnp.int32))
    return Sim3RansacResult(g=g_best, inliers=inliers, n_inliers=n,
                            ok=n >= min_inliers)


@partial(jax.jit, static_argnames=("iterations", "fix_scale"))
def optimize_sim3(
    g0: Sim3,
    x1: jnp.ndarray,     # [N, 3] points in frame 1
    x2: jnp.ndarray,     # [N, 3] matched points in frame 2
    uv1: jnp.ndarray,    # [N, 2] observations of x2-matches in image 1
    uv2: jnp.ndarray,    # [N, 2] observations of x1-matches in image 2
    K: jnp.ndarray,
    valid: jnp.ndarray,
    iterations: int = 10,
    huber_chi2: float = 10.0,
    fix_scale: bool = False,
) -> Tuple[Sim3, jnp.ndarray]:
    """Robust LM on bidirectional reprojection residuals — the
    ``Optimizer::OptimizeSim3`` capability: minimize
    ``|uv1 - proj(K, g(x2))|^2 + |uv2 - proj(K, g^-1(x1))|^2`` over
    g in Sim(3), Huber-weighted, left-multiplied increments
    (``EdgeSim3ProjectXYZ`` / ``EdgeInverseSim3ProjectXYZ``,
    ``types_seven_dof_expmap.h:99,130``). Returns (g, inlier mask).
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def proj_jac(pc):
        x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
        zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        uv = jnp.stack([fx * x * zi + cx, fy * y * zi + cy], axis=-1)
        zero = jnp.zeros_like(x)
        Jp = jnp.stack([
            jnp.stack([fx * zi, zero, -fx * x * zi * zi], axis=-1),
            jnp.stack([zero, fy * zi, -fy * y * zi * zi], axis=-1),
        ], axis=-2)  # [N, 2, 3]
        return uv, Jp

    wv = valid.astype(x1.dtype)

    def residuals(g):
        # forward: x2 through g into image 1
        p1 = sim3_apply(g, x2)
        uvh1, Jp1 = proj_jac(p1)
        r1 = uvh1 - uv1
        # d p1 / d xi = [I, -hat(p1), p1]  (left-mult sim3 increment)
        Jpc1 = jnp.concatenate([
            jnp.broadcast_to(jnp.eye(3), p1.shape[:-1] + (3, 3)),
            -hat(p1),
            p1[..., :, None],
        ], axis=-1)  # [N, 3, 7]
        J1 = jnp.matmul(Jp1, Jpc1, precision=_HI)
        # inverse: x1 through g^-1 into image 2. With the left increment
        # g' = exp(xi) o g, p2' = g^-1(exp(xi)^-1 x1) and for small xi
        # exp(xi)^-1 x1 ~ x1 - (rho + hat(phi) x1 + sigma x1), so with
        # M = d g^-1(y)/dy = (1/s) R^T:
        #   d p2/d rho   = -M
        #   d p2/d phi   =  M hat(x1)   (since d(hat(phi) x1)/dphi = -hat(x1))
        #   d p2/d sigma = -M x1
        gi = sim3_inverse(g)
        p2 = sim3_apply(gi, x1)
        uvh2, Jp2 = proj_jac(p2)
        r2 = uvh2 - uv2
        M = gi.s * gi.R                                # (1/s) R^T, [3, 3]
        d_rho = jnp.broadcast_to(-M, p2.shape[:-1] + (3, 3))
        d_phi = jnp.einsum("ij,njk->nik", M, hat(x1), precision=_HI)
        d_sig = -jnp.einsum("ij,nj->ni", M, x1, precision=_HI)[..., :, None]
        Jpc2 = jnp.concatenate([d_rho, d_phi, d_sig], axis=-1)  # [N, 3, 7]
        J2 = jnp.matmul(Jp2, Jpc2, precision=_HI)
        return r1, J1, r2, J2

    def chi2_dir(g):
        r1, _, r2, _ = residuals(g)
        return jnp.sum(r1 * r1, -1) * wv, jnp.sum(r2 * r2, -1) * wv

    def chi2_of(g):
        c1, c2 = chi2_dir(g)
        return c1 + c2

    def cost_of(g):
        c = chi2_of(g)
        rho = jnp.where(c <= huber_chi2, c,
                        2.0 * jnp.sqrt(huber_chi2 * c) - huber_chi2)
        return jnp.sum(rho)

    def step(carry, _):
        g, lam, cost = carry
        r1, J1, r2, J2 = residuals(g)
        c1 = jnp.sum(r1 * r1, -1) * wv
        c2 = jnp.sum(r2 * r2, -1) * wv
        w1 = jnp.where(c1 <= huber_chi2, 1.0,
                       jnp.sqrt(huber_chi2 / jnp.maximum(c1, _EPS))) * wv
        w2 = jnp.where(c2 <= huber_chi2, 1.0,
                       jnp.sqrt(huber_chi2 / jnp.maximum(c2, _EPS))) * wv
        H = (
            jnp.einsum("nri,n,nrj->ij", J1, w1, J1, precision=_HI)
            + jnp.einsum("nri,n,nrj->ij", J2, w2, J2, precision=_HI)
        )
        b = (
            jnp.einsum("nri,n,nr->i", J1, w1, r1, precision=_HI)
            + jnp.einsum("nri,n,nr->i", J2, w2, r2, precision=_HI)
        )
        if fix_scale:
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            b = b.at[6].set(0.0)
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(7)
        xi = -jnp.linalg.solve(Hd, b)
        g_new = sim3_compose(sim3_exp(xi), g)
        new_cost = cost_of(g_new)
        good = new_cost < cost
        g = Sim3(
            s=jnp.where(good, g_new.s, g.s),
            R=jnp.where(good, g_new.R, g.R),
            t=jnp.where(good, g_new.t, g.t),
        )
        cost = jnp.where(good, new_cost, cost)
        lam = jnp.where(good, lam * 0.5, lam * 4.0)
        return (g, lam, cost), None

    cost0 = cost_of(g0)
    (g, _, _), _ = jax.lax.scan(
        step, (g0, jnp.float32(1e-3), cost0), None, length=iterations
    )
    # per-direction gating: g2o's OptimizeSim3 keeps a correspondence only
    # if BOTH its edges pass th2 (`e12->chi2()>th2 || e21->chi2()>th2`
    # erases it) — each direction gets the full threshold, not half of a
    # summed budget
    c1, c2 = chi2_dir(g)
    inlier = (c1 <= huber_chi2) & (c2 <= huber_chi2) & valid
    return g, inlier
