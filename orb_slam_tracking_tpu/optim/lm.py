"""Shared Levenberg-Marquardt machinery.

Replicates the control policies of the vendored g2o LM implementation the
full reference system would use (``Thirdparty/g2o/g2o/core/
optimization_algorithm_levenberg.cpp``): Nielsen's adaptive damping update
(``:134-147``) and robust Huber weighting
(``robust_kernel_impl.h:76``). Everything is branch-free arithmetic usable
inside ``lax`` loops.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "huber_weight",
    "tukey_weight",
    "cauchy_weight",
    "pseudo_huber_weight",
    "nielsen_update",
    "solve_damped",
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


def solve_damped(H: jnp.ndarray, b: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Solve (H + lam*diag(H)) dx = b for a small dense system (the
    multiplicative damping g2o's ``setLambda`` applies to the diagonal)."""
    diag = jnp.diagonal(H, axis1=-2, axis2=-1)
    eye = jnp.eye(H.shape[-1], dtype=H.dtype)
    Hd = H + lam * eye * diag[..., None, :]
    return jnp.linalg.solve(Hd, b)
