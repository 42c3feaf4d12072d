"""ORB extraction orchestrator: pyramid -> FAST -> select -> orient -> rBRIEF.

TPU-native equivalent of ``ORBextractor::operator()``
(``Features/ORBextractor.cpp:1531-1653``): one jittable function from a
float32 image to a fixed-capacity ``Keypoints`` pytree. All shapes are a
static function of (image shape, OrbConfig); occupancy is carried in the
validity mask. Per-level work is a static Python loop (levels have
different static shapes, so they are separate XLA computations fused into
one program).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import OrbConfig
from ..types import Keypoints
from .brief import descriptors_at
from .fast import detect_level
from .orientation import angles_at, moment_maps
from .pattern import EDGE_THRESHOLD, PATCH_SIZE
from .pyramid import build_pyramid, gaussian_blur
from .select import select_level

__all__ = ["orb_extract"]


def _mask_level(mask: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Downsample a level-0 detection mask (nonzero = detect, the OpenCV
    ``ORBextractor::operator()`` mask convention,
    ``ORBextractor.hpp:83-85``) to a level's resolution."""
    m = jax.image.resize(mask.astype(jnp.float32), (h, w), "nearest")
    return m > 0.5


def _harris_rank(score: jnp.ndarray, padded: jnp.ndarray) -> jnp.ndarray:
    """Swap FAST detection scores for Harris ranking scores (+1 keeps the
    score-map convention 'positive = keypoint'; response is in
    [-0.13, 0.13] at 8-bit range, see ops/harris.py)."""
    from .harris import harris_response

    return jnp.where(score > 0.0, harris_response(padded) + 1.0, 0.0)


@partial(jax.jit, static_argnames=("cfg",))
def orb_extract(image: jnp.ndarray, cfg: OrbConfig,
                mask: jnp.ndarray | None = None) -> Keypoints:
    """Extract ORB keypoints + descriptors from ``image [H, W] float32``.

    ``mask`` (optional, [H, W], nonzero = detect) restricts detection —
    the reference functor's mask argument (``ORBextractor.hpp:83-85``).
    ``cfg.score_type == "harris"`` ranks FAST corners by the Harris
    measure (the declared scoreType axis, ``Settings.hpp:77,124``);
    keypoint ``response`` then carries the Harris value.

    Returns a ``Keypoints`` with capacity ``cfg.max_keypoints``; the first
    ``sum(cfg.features_per_level())`` rows hold per-level results (invalid
    rows interleaved where a level found fewer corners than its budget).

    Dispatches to the atlas-fused path (ops/atlas.py, bit-identical, one
    canvas pass per heavy stage) unless ``cfg.use_atlas`` is off.
    """
    if cfg.use_atlas:
        from .atlas import orb_extract_atlas

        return orb_extract_atlas(image, cfg, mask)
    budgets = cfg.features_per_level()
    scales = cfg.level_scales()
    levels = build_pyramid(image, cfg, pad=EDGE_THRESHOLD)
    harris = cfg.score_type == "harris"

    xs, resps, angs, octs, sizes, descs, valids = [], [], [], [], [], [], []
    for lvl, padded in enumerate(levels):
        score = detect_level(
            padded, cfg.ini_th_fast, cfg.min_th_fast, cfg.fast_cell_size
        )
        if mask is not None:
            score = jnp.where(
                _mask_level(mask, score.shape[0], score.shape[1]),
                score, 0.0)
        if harris:
            score = _harris_rank(score, padded)
        xy_l, resp, valid = select_level(score, budgets[lvl], cfg.select_cell_size)
        if harris:
            resp = jnp.where(valid, resp - 1.0, resp)
        m10, m01 = moment_maps(padded)
        ang = angles_at(m10, m01, xy_l)
        blurred = gaussian_blur(padded)
        desc = descriptors_at(blurred, xy_l, ang)

        s = scales[lvl]
        xs.append(xy_l * s)
        resps.append(resp)
        angs.append(ang)
        octs.append(jnp.full((budgets[lvl],), lvl, dtype=jnp.int32))
        sizes.append(jnp.full((budgets[lvl],), PATCH_SIZE * s, dtype=jnp.float32))
        descs.append(desc)
        valids.append(valid)

    xy = jnp.concatenate(xs)
    response = jnp.concatenate(resps)
    angle = jnp.concatenate(angs)
    octave = jnp.concatenate(octs)
    size = jnp.concatenate(sizes)
    desc = jnp.concatenate(descs)
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
