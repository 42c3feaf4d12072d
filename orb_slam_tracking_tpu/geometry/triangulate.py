"""Batched DLT triangulation.

TPU-native replacement for ``cv::triangulatePoints``
(``Initialization/Initializer.cpp:618``): the 4x4 DLT system is built for
every (match, candidate-pose) pair at once and solved by batched
eigendecomposition of ``A^T A`` (symmetric eigh is the TPU-friendly way to
get the null vector; it avoids batched SVD of non-square matrices).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax as _lax

# float32 matmul precision on TPU for geometry solves (the default
# truncates to bfloat16 - see optim/ba.py:_obs_residuals).
_HI = _lax.Precision.HIGHEST

__all__ = ["triangulate_dlt"]


def triangulate_dlt(P1: jnp.ndarray, P2: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Triangulate image-point pairs.

    P1, P2: [..., 3, 4] projection matrices (broadcast over points).
    x1, x2: [..., N, 2] pixel coords in the respective cameras.
    Returns [..., N, 3] world points (dehomogenized).
    """
    # DLT rows: x * P[2] - P[0], y * P[2] - P[1] for each view
    r0 = x1[..., :, 0:1] * P1[..., None, 2, :] - P1[..., None, 0, :]
    r1 = x1[..., :, 1:2] * P1[..., None, 2, :] - P1[..., None, 1, :]
    r2 = x2[..., :, 0:1] * P2[..., None, 2, :] - P2[..., None, 0, :]
    r3 = x2[..., :, 1:2] * P2[..., None, 2, :] - P2[..., None, 1, :]
    A = jnp.stack([r0, r1, r2, r3], axis=-2)  # [..., N, 4, 4]
    # null vector of A = eigenvector of smallest eigenvalue of A^T A
    AtA = jnp.einsum("...ij,...ik->...jk", A, A, precision=_HI)
    _, vecs = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    X = vecs[..., :, 0]  # [..., N, 4]
    w = X[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-12, jnp.sign(w) * 1e-12 + (w == 0) * 1e-12, w)
    return X[..., :3] / w
