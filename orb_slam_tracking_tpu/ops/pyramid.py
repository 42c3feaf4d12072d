"""Image pyramid with reflect borders and separable Gaussian blur.

TPU-native replacement for ``ORBextractor::ComputePyramid``
(``Features/ORBextractor.cpp:1660-1713``): per level, resize the previous
level by 1/scale (bilinear) and surround it with a 19-px BORDER_REFLECT_101
apron. The reference keeps the apron as hidden out-of-bounds memory of a
larger ``cv::Mat``; here each level is stored *with* its apron explicitly —
shape ``[H_l + 38, W_l + 38]`` — and keypoint coordinates are level-local
(the +19 offset is applied only where pixels are sampled).

Everything is static-shape: level sizes are a pure function of the config,
computed host-side (``OrbConfig.level_shapes``).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as _np

from ..config import OrbConfig
from .pattern import EDGE_THRESHOLD

__all__ = ["reflect_pad", "gaussian_blur", "build_pyramid", "GAUSS7_SIGMA2"]


def reflect_pad(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 padding (edge pixel not duplicated), 2D."""
    return jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")


def _gauss_kernel_1d(ksize: int, sigma: float) -> jnp.ndarray:
    r = ksize // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


GAUSS7_SIGMA2 = (7, 2.0)  # the reference's blur before descriptors
                          # (ORBextractor.cpp:1601-1606)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian with BORDER_REFLECT_101, matching
    ``cv::GaussianBlur(..., Size(7,7), 2, 2, BORDER_REFLECT_101)``.

    On TPU the row taps are staged as input channels so the conv carries a
    ksize^2-deep contraction onto the MXU (single-channel spatial convs
    lower without any matrix-unit use); elsewhere the separable 1D pair is
    fastest.
    """
    k = _gauss_kernel_1d(ksize, sigma).astype(img.dtype)
    r = ksize // 2
    p = jnp.pad(img, ((r, r), (r, r)), mode="reflect")
    h, w = img.shape
    # separable blur as 2*ksize shifted multiply-adds — fully fusable VPU
    # work on TPU (conv lowerings of single-channel kernels are far
    # slower) and equally fine on CPU
    horiz = sum(k[i] * p[:, i: i + w] for i in range(ksize))
    return sum(k[i] * horiz[i: i + h, :] for i in range(ksize))


@functools.lru_cache(maxsize=64)
def _resize_matrix(n_in: int, n_out: int) -> _np.ndarray:
    """[n_out, n_in] interpolation matrix M with M @ v ==
    jax.image.resize(v, n_out, 'linear').

    Pure numpy (callable from inside a trace): jax.image.resize 'linear'
    is a normalized triangle kernel at half-pixel sample positions with
    the kernel width scaled by the downsampling factor (antialiasing).
    """
    scale = n_in / n_out
    c = max(scale, 1.0)
    pos = ( _np.arange(n_out, dtype=_np.float64) + 0.5) * scale - 0.5  # [n_out]
    j = _np.arange(n_in, dtype=_np.float64)                            # [n_in]
    w = _np.maximum(0.0, 1.0 - _np.abs((pos[:, None] - j[None, :]) / c))
    s = w.sum(axis=1, keepdims=True)
    w = _np.where(_np.abs(s) > 1e-4, w / _np.where(s == 0, 1.0, s), 0.0)
    in_range = (pos >= -0.5) & (pos <= n_in - 0.5)
    w = _np.where(in_range[:, None], w, 0.0)
    return w.astype(_np.float32)


def _resize_bilinear(img: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear (antialiased) resize with half-pixel centers, equal to
    ``jax.image.resize(..., 'linear')``.

    On TPU the two 1D interpolations run as dense matmuls with
    precomputed weight matrices — gather-based resize lowering wastes the
    matrix unit; shapes are static so the matrices are compile-time
    constants.
    """
    if jax.default_backend() == "tpu":
        mh = jnp.asarray(_resize_matrix(img.shape[0], shape[0]))
        mw = jnp.asarray(_resize_matrix(img.shape[1], shape[1]))
        out = jnp.dot(mh, img, preferred_element_type=jnp.float32)
        return jnp.dot(out, mw.T, preferred_element_type=jnp.float32)
    return jax.image.resize(img, shape, method="linear")


def build_pyramid(
    image: jnp.ndarray, cfg: OrbConfig, pad: int = EDGE_THRESHOLD
) -> List[jnp.ndarray]:
    """``image [H, W] float32`` -> list of ``n_levels`` padded level images
    ``[H_l + 2*pad, W_l + 2*pad]``. Level l is resized from level l-1
    (cascaded, as the reference does) rather than from level 0 — the
    repeated low-pass matters for FAST stability at high octaves."""
    h, w = image.shape
    shapes = cfg.level_shapes(h, w)
    levels = []
    cur = image
    for lvl, (hl, wl) in enumerate(shapes):
        if lvl > 0:
            cur = _resize_bilinear(cur, (hl, wl))
        levels.append(reflect_pad(cur, pad))
    return levels
