"""Shared Levenberg-Marquardt machinery.

Replicates the control policies of the vendored g2o LM implementation the
full reference system would use (``Thirdparty/g2o/g2o/core/
optimization_algorithm_levenberg.cpp``): Nielsen's adaptive damping update
(``:134-147``) and robust Huber weighting
(``robust_kernel_impl.h:76``). Everything is branch-free arithmetic usable
inside ``lax`` loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small-matrix solves must not run at TPU-default (bfloat16) matmul
# precision — see the round-4 note in optim/ba.py:_obs_residuals.
_HI = jax.lax.Precision.HIGHEST

__all__ = [
    "huber_weight",
    "tukey_weight",
    "cauchy_weight",
    "pseudo_huber_weight",
    "nielsen_update",
    "solve_damped",
    "inv3x3",
    "solve_spd6",
]


def huber_weight(chi2: jnp.ndarray, delta2: jnp.ndarray) -> jnp.ndarray:
    """IRLS weight of the Huber kernel given squared error and squared
    threshold: w = 1 inside, delta/|e| outside
    (g2o ``RobustKernelHuber::robustify``, robust_kernel_impl.h:76)."""
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-20)))


def tukey_weight(chi2: jnp.ndarray, delta2: jnp.ndarray) -> jnp.ndarray:
    """Tukey biweight: smooth rejection, zero influence beyond delta
    (g2o ``RobustKernelTukey``)."""
    r = chi2 / jnp.maximum(delta2, 1e-20)
    return jnp.where(r <= 1.0, (1.0 - r) ** 2, 0.0)


def cauchy_weight(chi2: jnp.ndarray, delta2: jnp.ndarray) -> jnp.ndarray:
    """Cauchy/Lorentzian kernel weight (g2o ``RobustKernelCauchy``)."""
    return 1.0 / (1.0 + chi2 / jnp.maximum(delta2, 1e-20))


def pseudo_huber_weight(chi2: jnp.ndarray, delta2: jnp.ndarray) -> jnp.ndarray:
    """Pseudo-Huber: smooth everywhere, Huber-like asymptotics
    (g2o ``RobustKernelPseudoHuber``)."""
    return 1.0 / jnp.sqrt(1.0 + chi2 / jnp.maximum(delta2, 1e-20))


def nielsen_update(lam, nu, rho):
    """Nielsen's lambda schedule (g2o ``optimization_algorithm_levenberg.
    cpp:134-147``): on success scale by max(1/3, 1-(2 rho-1)^3) and reset
    nu; on failure multiply by nu and double nu."""
    good = rho > 0
    factor = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
    lam_new = jnp.where(good, lam * factor, lam * nu)
    nu_new = jnp.where(good, 2.0, nu * 2.0)
    return lam_new, nu_new


def inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / determinant)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def solve_spd6(M: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a symmetric positive-definite 6x6 system in closed form via
    3x3 block Schur elimination (adjugate 3x3 inverses, branch-free):

        [A B; B^T D]^-1  via  S = D - B^T A^-1 B

    Valid only for the damped normal equations (SPD by construction;
    the LM damping floor keeps A and S away from singularity). Kept for
    BATCHED SPD solves; the unbatched pose-LM chain dispatches to
    pivoted LU instead — an on-chip A/B at the flagship operating point
    (``scripts/tpu_solve6_experiment.py``, v5e, 1024 obs, 2x6 LM)
    measured LU at 0.384 ms per optimize_pose vs 0.541 ms for this
    closed form: at batch size 1 the Schur expansion's long dependent
    chain of tiny vector ops costs more than the LU kernel's pivot
    latency, which overlaps with dispatch.
    """
    A = M[..., :3, :3]
    Bm = M[..., :3, 3:]
    D = M[..., 3:, 3:]
    b1 = b[..., :3]
    b2 = b[..., 3:]
    Ainv = inv3x3(A)
    AinvB = jnp.matmul(Ainv, Bm, precision=_HI)          # [.., 3, 3]
    S = D - jnp.matmul(jnp.swapaxes(Bm, -1, -2), AinvB, precision=_HI)
    Sinv = inv3x3(S)
    Ainv_b1 = jnp.einsum("...ij,...j->...i", Ainv, b1, precision=_HI)
    rhs2 = b2 - jnp.einsum("...ji,...j->...i", Bm, Ainv_b1, precision=_HI)
    x2 = jnp.einsum("...ij,...j->...i", Sinv, rhs2, precision=_HI)
    x1 = Ainv_b1 - jnp.einsum("...ij,...j->...i", AinvB, x2, precision=_HI)
    return jnp.concatenate([x1, x2], axis=-1)


def solve_damped(
    H: jnp.ndarray,
    b: jnp.ndarray,
    lam: jnp.ndarray,
    batched: bool | None = None,
) -> jnp.ndarray:
    """Solve (H + lam*diag(H)) dx = b for a small dense system (the
    multiplicative damping g2o's ``setLambda`` applies to the diagonal).
    BATCHED 6-dim SPD systems take the closed-form block-Schur path
    (one LU pivot loop per batch element would serialize); unbatched
    systems use pivoted LU, which the on-chip A/B measured 1.4x faster
    than the closed form at batch 1 (see ``solve_spd6``).

    ``batched`` must be passed EXPLICITLY by callers that are wrapped in
    ``jax.vmap`` (multi-sequence DP runners): under vmap H traces as 2-D
    here, so the ndim fallback cannot see the batch axis and would pick
    the per-element LU the closed form exists to avoid. ``None`` keeps
    the trace-time ndim heuristic for direct (un-vmapped) callers."""
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    eye = jnp.eye(H.shape[-1], dtype=H.dtype)
    Hd = H + lam * eye * diag[..., None, :]
    if batched is None:
        batched = H.ndim > 2
    if H.shape[-1] == 6 and batched:
        return solve_spd6(Hd, b)
    return jnp.linalg.solve(Hd, b)
