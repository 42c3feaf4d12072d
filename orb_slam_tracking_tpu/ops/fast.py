"""FAST-9/16 corner detection as dense, branch-free array programs.

TPU-native replacement for the reference's per-cell ``cv::FAST`` loop
(``Features/ORBextractor.cpp:1109-1123``). Instead of early-exit scalar
code, the segment test is evaluated for *every* pixel of a level at once:

- the 16 Bresenham-ring neighbours become 16 shifted views of the padded
  level image (pure slices — no gather);
- the arc test and the exact FAST score (the maximum threshold at which a
  pixel remains a corner — what OpenCV's ``cornerScore`` computes by
  binary search) reduce over a static 9-wide sliding window;
- non-max suppression is a 3x3 ``reduce_window`` max;
- the reference's dual-threshold retry (``iniThFAST=20`` per 35-px cell,
  fall back to ``minThFAST=7`` where a cell has no strong corner) becomes
  two comparisons against one score map plus a per-cell block-reduce —
  corner@t <=> score > t, so no second FAST pass is needed.

The output is a masked score map in level coordinates; downstream
selection (select.py) turns it into fixed-capacity keypoint arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pattern import EDGE_THRESHOLD

__all__ = ["RING_OFFSETS", "fast_score", "detect_level"]

# The 16-pixel Bresenham circle of radius 3, clockwise from 12 o'clock
# (the standard FAST-9/16 ring).
RING_OFFSETS = (
    (0, -3), (1, -3), (2, -2), (3, -1),
    (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1),
    (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
_ARC = 9  # contiguous arc length for FAST-9


def fast_score(padded: jnp.ndarray, pad: int = EDGE_THRESHOLD) -> jnp.ndarray:
    """Exact FAST-9 corner score for every interior pixel.

    ``padded``: level image with a >=3-px apron, shape [H+2p, W+2p].
    Returns ``[H, W]`` float32; ``score > t`` <=> pixel is a FAST corner at
    threshold ``t``. Non-corners get scores <= 0.
    """
    h = padded.shape[0] - 2 * pad
    w = padded.shape[1] - 2 * pad
    c = jax.lax.dynamic_slice(padded, (pad, pad), (h, w))
    # [16, H, W] ring neighbourhood via shifted slices of the padded image.
    ring = jnp.stack(
        [
            jax.lax.dynamic_slice(padded, (pad + dy, pad + dx), (h, w))
            for (dx, dy) in RING_OFFSETS
        ]
    )
    diff_b = ring - c[None]          # bright: ring - center
    diff_d = -diff_b                 # dark: center - ring
    score_b = _max_windowed_min(diff_b)
    score_d = _max_windowed_min(diff_d)
    return jnp.maximum(score_b, score_d)


def _max_windowed_min(d: jnp.ndarray) -> jnp.ndarray:
    """max over the 16 cyclic 9-windows of the per-window min of d[16,H,W]."""
    d24 = jnp.concatenate([d, d[: _ARC - 1]], axis=0)
    acc = d24[0:16]
    for k in range(1, _ARC):
        acc = jnp.minimum(acc, d24[k : k + 16])
    return jnp.max(acc, axis=0)


def _cell_reduce_max(x: jnp.ndarray, cs: int) -> jnp.ndarray:
    """Per-cell max over non-overlapping cs x cs cells, broadcast back to
    pixel resolution. x: [H, W] -> [H, W]."""
    h, w = x.shape
    ph = (-h) % cs
    pw = (-w) % cs
    xp = jnp.pad(x, ((0, ph), (0, pw)), constant_values=-jnp.inf)
    ncy, ncx = (h + ph) // cs, (w + pw) // cs
    cells = xp.reshape(ncy, cs, ncx, cs).max(axis=(1, 3))
    back = jnp.repeat(jnp.repeat(cells, cs, axis=0), cs, axis=1)
    return back[:h, :w]


def detect_level(
    padded: jnp.ndarray,
    ini_th: int,
    min_th: int,
    cell_size: int,
    pad: int = EDGE_THRESHOLD,
) -> jnp.ndarray:
    """Full per-level detection: score + dual-threshold cell fallback + NMS
    + border masking. Returns a score map [H, W]; zero where no keypoint may
    be placed. Keypoint-eligible region is [pad-3, dim-pad+3) per axis, the
    reference's min/maxBorder (``ORBextractor.cpp:1032-1046``).
    """
    h = padded.shape[0] - 2 * pad
    w = padded.shape[1] - 2 * pad
    if jax.default_backend() == "tpu":
        # fused VMEM-resident kernel (exact; measured 24x the XLA path)
        from .pallas_kernels import fast_score_pallas

        score = fast_score_pallas(padded, pad)
    else:
        score = fast_score(padded, pad)

    # Region where keypoints may live (minBorder = EDGE_THRESHOLD - 3).
    b = pad - 3
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    region = (ys >= b) & (ys < h - b) & (xs >= b) & (xs < w - b)
    score = jnp.where(region, score, 0.0)

    corner_hi = score > ini_th
    corner_lo = score > min_th
    # Fall back to the low threshold only in cells with no strong corner
    # (ORBextractor.cpp:1109-1123 retry semantics).
    cell_max = _cell_reduce_max(jnp.where(corner_hi, score, 0.0), cell_size)
    has_hi = cell_max > ini_th
    keep = corner_hi | (corner_lo & jnp.logical_not(has_hi))
    score = jnp.where(keep, score, 0.0)

    # 3x3 non-max suppression (cv::FAST nonmaxSuppression=true).
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((score >= pooled) & (score > 0.0), score, 0.0)
