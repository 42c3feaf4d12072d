"""Atlas ORB extraction: all pyramid levels packed into one canvas.

Round-1 profiling showed ~half the extraction frame time was per-level
program overhead: the 8-level pyramid ran 8 separate FAST kernels, 8
moment chains, 8 blurs and 8 descriptor-sampler calls (the staging copies
around each Pallas call dominate at the small upper-level sizes). This
module packs the padded levels into ONE vertically-stacked canvas

    [ level0 + 19px apron ]
    [ level1 + 19px apron ]
    ...                        shape [sum(h_l + 38), max(w_l + 38) -> 128-aligned]

so the four heavy stages — FAST-9 score (Pallas), disc moments
(shifted-add chain), 7x7 Gaussian blur and rBRIEF patch sampling
(Pallas) — each run exactly once over the canvas. Per-level work that
must stay level-anchored for exactness (eligibility border, the
dual-threshold cell fallback of ``ORBextractor.cpp:1109-1123``, NMS,
budgeted selection) operates on static slices of the canvas score map —
cheap fused VPU ops.

Exactness: every block carries its own 19-px reflect apron, and keypoints
live >= 35 px from any block edge (16-px eligibility border + 19-px
apron), while the largest read stencil is the radius-15 moment disc and
the 19-px rotated BRIEF offsets + 3-px blur taps — all strictly inside
the owning block. The atlas path is therefore bit-identical to running
the round-1 per-level path (verified by tests/test_atlas.py).

Reference semantics replicated: ``ORBextractor::operator()``
(``Features/ORBextractor.cpp:1531-1653``); per-level budgets
(``:529-548``); dual FAST thresholds (``:1109-1123``); IC angle
(``:103-159``); rBRIEF (``:169-228``).
"""

from __future__ import annotations

import functools
import os
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import OrbConfig
from ..types import Keypoints
from .brief import descriptors_at
from .fast import _cell_reduce_max, fast_score
from .orientation import angles_at, moment_maps
from .pattern import EDGE_THRESHOLD, PATCH_SIZE
from .pyramid import _resize_bilinear, gaussian_blur, reflect_pad
from .select import select_level

__all__ = ["AtlasLayout", "atlas_layout", "build_atlas", "orb_extract_atlas"]

_PAD = EDGE_THRESHOLD  # 19-px apron per block (ORBextractor.cpp:90)


class AtlasLayout(NamedTuple):
    level_shapes: Tuple[Tuple[int, int], ...]  # interior (h_l, w_l)
    row_offsets: Tuple[int, ...]               # canvas row of block l's top
    canvas_h: int
    canvas_w: int                              # 128-aligned


@functools.lru_cache(maxsize=32)
def _layout(h: int, w: int, cfg: OrbConfig) -> AtlasLayout:
    shapes = cfg.level_shapes(h, w)
    offsets = []
    row = 0
    for (hl, wl) in shapes:
        offsets.append(row)
        row += hl + 2 * _PAD
    wc = max(wl for (_, wl) in shapes) + 2 * _PAD
    wc = ((wc + 127) // 128) * 128  # lane-aligned: the Pallas passes then
    #                                 need no column-padding copy
    return AtlasLayout(tuple(shapes), tuple(offsets), row, wc)


def atlas_layout(h: int, w: int, cfg: OrbConfig) -> AtlasLayout:
    return _layout(h, w, cfg)


def build_atlas(image: jnp.ndarray, cfg: OrbConfig) -> jnp.ndarray:
    """[H, W] image -> the stacked canvas [canvas_h, canvas_w].

    Levels are produced by the same cascaded matmul resize as
    ``pyramid.build_pyramid`` (bit-identical), reflect-padded, then
    right-padded with zeros to the common width and concatenated.
    """
    lay = _layout(image.shape[0], image.shape[1], cfg)
    blocks: List[jnp.ndarray] = []
    cur = image
    for lvl, (hl, wl) in enumerate(lay.level_shapes):
        if lvl > 0:
            cur = _resize_bilinear(cur, (hl, wl))
        padded = reflect_pad(cur, _PAD)
        blocks.append(
            jnp.pad(padded, ((0, 0), (0, lay.canvas_w - padded.shape[1])))
        )
    return jnp.concatenate(blocks, axis=0)


def _detect_slice(score: jnp.ndarray, ini_th: int, min_th: int,
                  cell_size: int) -> jnp.ndarray:
    """detect_level's mask/fallback/NMS stages on a level-aligned score
    slice [h_l, w_l] (the score itself was computed on the canvas)."""
    h, w = score.shape
    b = _PAD - 3
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    region = (ys >= b) & (ys < h - b) & (xs >= b) & (xs < w - b)
    score = jnp.where(region, score, 0.0)

    corner_hi = score > ini_th
    corner_lo = score > min_th
    cell_max = _cell_reduce_max(jnp.where(corner_hi, score, 0.0), cell_size)
    has_hi = cell_max > ini_th
    keep = corner_hi | (corner_lo & jnp.logical_not(has_hi))
    score = jnp.where(keep, score, 0.0)

    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((score >= pooled) & (score > 0.0), score, 0.0)


def orb_extract_atlas(image: jnp.ndarray, cfg: OrbConfig,
                      mask: jnp.ndarray | None = None) -> Keypoints:
    """Atlas-fused equivalent of ``extractor.orb_extract`` (bit-identical
    output; see module docstring for the argument)."""
    budgets = cfg.features_per_level()
    scales = cfg.level_scales()
    lay = _layout(image.shape[0], image.shape[1], cfg)
    canvas = build_atlas(image, cfg)
    harris = cfg.score_type == "harris"

    # --- the four heavy single-pass stages ---
    on_tpu = jax.default_backend() == "tpu"
    # Per-keypoint moments kernel (round 5): the dense canvas pass costs
    # 0.402 ms of VPU time for ~2M pixels of which only the ~2k selected
    # keypoints are read. Gated until validated on real hardware
    # (interpret mode has missed Mosaic lowering restrictions before —
    # .claude/skills/verify/SKILL.md).
    kp_moments = on_tpu and os.environ.get(
        "ORB_TPU_KP_MOMENTS", "0") == "1"
    if on_tpu:
        from .pallas_kernels import fast_score_pallas

        score_c = fast_score_pallas(canvas, _PAD)
    else:
        score_c = fast_score(canvas, _PAD)
    if not kp_moments:
        m10_c, m01_c = moment_maps(canvas)      # canvas-interior aligned
    blurred_c = gaussian_blur(canvas)
    if harris:
        from .harris import harris_response

        harris_c = harris_response(canvas, _PAD)  # one canvas pass

    # --- per-level light stages on static slices (exact per-level
    #     anchoring: the slice origin IS the level origin) ---
    xy_atlas, xs, resps, angsrc, octs, sizes, valids = [], [], [], [], [], [], []
    for lvl, ((hl, wl), off) in enumerate(zip(lay.level_shapes, lay.row_offsets)):
        s = jax.lax.slice(score_c, (off, 0), (off + hl, wl))
        det = _detect_slice(s, cfg.ini_th_fast, cfg.min_th_fast,
                            cfg.fast_cell_size)
        if mask is not None:
            from .extractor import _mask_level

            det = jnp.where(_mask_level(mask, hl, wl), det, 0.0)
        if harris:
            hr = jax.lax.slice(harris_c, (off, 0), (off + hl, wl))
            det = jnp.where(det > 0.0, hr + 1.0, 0.0)
        xy_l, resp, valid = select_level(det, budgets[lvl], cfg.select_cell_size)
        if harris:
            resp = jnp.where(valid, resp - 1.0, resp)
        # canvas-interior coordinates of this level's keypoints
        xy_c = xy_l + jnp.asarray([0.0, float(off)])
        xy_atlas.append(xy_c)
        xs.append(xy_l * scales[lvl])
        resps.append(resp)
        octs.append(jnp.full((budgets[lvl],), lvl, dtype=jnp.int32))
        sizes.append(
            jnp.full((budgets[lvl],), PATCH_SIZE * scales[lvl], dtype=jnp.float32)
        )
        valids.append(valid)

    xy_c = jnp.concatenate(xy_atlas)
    if kp_moments:
        from .pallas_kernels import moments_at_pallas

        yc = xy_c[:, 1].astype(jnp.int32) + _PAD   # absolute canvas pixel
        xc = xy_c[:, 0].astype(jnp.int32) + _PAD
        g10, g01 = moments_at_pallas(canvas, yc, xc)
        ang = jnp.degrees(jnp.arctan2(g01, g10))
        angle = jnp.where(ang < 0, ang + 360.0, ang)
    else:
        angle = angles_at(m10_c, m01_c, xy_c)   # one gather, all levels
    desc = descriptors_at(blurred_c, xy_c, angle)  # one sampler pass

    xy = jnp.concatenate(xs)
    response = jnp.concatenate(resps)
    octave = jnp.concatenate(octs)
    size = jnp.concatenate(sizes)
    valid = jnp.concatenate(valids)

    n = xy.shape[0]
    cap = cfg.max_keypoints
    if cap < n:
        raise ValueError(f"max_keypoints {cap} < total budget {n}")
    pad_n = cap - n
    return Keypoints(
        xy=jnp.pad(xy, ((0, pad_n), (0, 0))),
        response=jnp.pad(response, (0, pad_n)),
        angle_deg=jnp.pad(angle, (0, pad_n)),
        octave=jnp.pad(octave, (0, pad_n)),
        size=jnp.pad(size, (0, pad_n)),
        desc=jnp.pad(desc, ((0, pad_n), (0, 0))),
        valid=jnp.pad(valid, (0, pad_n)),
    )
