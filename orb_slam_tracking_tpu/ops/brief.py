"""Rotated-BRIEF (rBRIEF) 256-bit descriptors.

TPU-native replacement for ``computeOrbDescriptor``
(``Features/ORBextractor.cpp:169-228``): for each keypoint, the 256 learned
point pairs (pattern.py) are rotated by the keypoint's IC angle, sampled
from the Gaussian-blurred level image at rounded integer offsets (the
reference's ``GET_VALUE`` does ``cvRound`` of the rotated coordinates —
nearest-neighbour, not bilinear), and compared: bit_i = (I(p_i^1) < I(p_i^2)).

The sample step is one [N, 512] gather from the blurred padded level;
packing is a shift-sum into [N, 8] uint32 words. Bit k of word j is pair
index j*32 + k, so Hamming distance by XOR+popcount over the 8 words is
bit-compatible with DBoW2's ``FORB::distance``
(``Thirdparty/DBoW2/src/FORB.cpp:77-115``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pattern import EDGE_THRESHOLD, brief_pattern

__all__ = ["descriptors_at", "pack_bits"]


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[N, 256] {0,1} -> [N, 8] uint32, little-endian bit order per word."""
    n = bits.shape[0]
    b = bits.reshape(n, 8, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def descriptors_at(
    blurred_padded: jnp.ndarray,
    xy: jnp.ndarray,
    angle_deg: jnp.ndarray,
    pad: int = EDGE_THRESHOLD,
) -> jnp.ndarray:
    """Compute rBRIEF descriptors.

    blurred_padded: [H + 2*pad, W + 2*pad] blurred level image.
    xy: [N, 2] float32 level-local keypoint coords (integer-valued).
    angle_deg: [N] float32 orientation in degrees.
    Returns [N, 8] uint32.
    """
    pat = jnp.asarray(brief_pattern(), dtype=jnp.float32)  # [256, 4]
    px = jnp.concatenate([pat[:, 0], pat[:, 2]])  # [512] x offsets
    py = jnp.concatenate([pat[:, 1], pat[:, 3]])  # [512] y offsets

    theta = jnp.radians(angle_deg)
    ca, sa = jnp.cos(theta), jnp.sin(theta)  # [N]
    # rotate pattern by keypoint angle; round like the reference's cvRound
    rx = jnp.rint(px[None, :] * ca[:, None] - py[None, :] * sa[:, None])
    ry = jnp.rint(px[None, :] * sa[:, None] + py[None, :] * ca[:, None])

    w = blurred_padded.shape[1]
    xi = (xy[:, 0:1] + rx).astype(jnp.int32) + pad
    yi = (xy[:, 1:2] + ry).astype(jnp.int32) + pad
    # keypoints live >= EDGE_THRESHOLD-3 from the border and |rotated
    # offset| <= ceil(13*sqrt(2)) = 19, so indices stay inside the padded
    # image; clip defensively for padding rows (invalid keypoints at 0,0).
    xi = jnp.clip(xi, 0, w - 1)
    yi = jnp.clip(yi, 0, blurred_padded.shape[0] - 1)

    # Round the blurred image to integers before comparison — the
    # reference blurs into CV_8U (``ORBextractor.cpp:1113-1116``), so its
    # descriptor bits compare INTEGER intensities. Matching that here (on
    # both backends identically) also makes every sample value exactly
    # representable in bf16, unlocking the kernel's single-pass path.
    blurred_int = jnp.rint(blurred_padded)

    if jax.default_backend() == "tpu":
        # per-keypoint DMA + one-hot contractions (pallas_kernels.py) —
        # XLA's gather runs at ~100 MB/s effective on TPU
        from .pallas_kernels import brief_sample_pallas

        vals = brief_sample_pallas(blurred_int, yi, xi,
                                   integer_values=True)
    else:
        flat = blurred_int.reshape(-1)
        vals = flat[yi * w + xi]  # [N, 512]
    t0, t1 = vals[:, :256], vals[:, 256:]
    bits = (t0 < t1).astype(jnp.uint32)
    return pack_bits(bits)
