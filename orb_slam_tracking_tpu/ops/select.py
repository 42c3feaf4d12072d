"""Spatially-uniform keypoint selection with a fixed per-level budget.

TPU-native surrogate for the reference's greedy quadtree
(``ORBextractor::DistributeOctTree``, ``Features/ORBextractor.cpp:698-1011``).
The quadtree splits nodes until node count reaches the level budget and keeps
the single max-response keypoint per leaf (``:975-1007``) — i.e. it converges
to "one best corner per roughly-uniform spatial cell". The array-native
equivalent with static shapes:

1. partition the level into fixed cells of ``cell_size`` px (cell count
   chosen >= budget);
2. per-cell argmax of the masked FAST score map — a dense block-reduce, no
   sorting, no lists;
3. global top-``budget`` cells by response.

This preserves the quadtree's spatial-uniformity *objective* rather than its
serial mechanics; equivalence is validated downstream by match/init metrics
(SURVEY.md §7.3). It also cannot divide-by-zero on thin aspect ratios (a
known reference bug, ``ORBextractor.cpp:705-706``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["select_level"]


def select_level(
    score: jnp.ndarray, budget: int, cell_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pick up to ``budget`` spatially-spread maxima from a score map.

    score: [H, W] float32, zero where ineligible (output of fast.detect_level).
    Returns (xy [budget, 2] float32 level coords, response [budget] float32,
    valid [budget] bool).
    """
    h, w = score.shape
    cs = cell_size
    ph, pw = (-h) % cs, (-w) % cs
    ncy, ncx = (h + ph) // cs, (w + pw) // cs
    n_cells = ncy * ncx
    if n_cells < budget:
        raise ValueError(
            f"selection grid {ncy}x{ncx} has fewer cells than budget {budget}; "
            f"decrease cell_size ({cs}) or budget"
        )
    sp = jnp.pad(score, ((0, ph), (0, pw)))
    # [ncy, cs, ncx, cs] -> [n_cells, cs*cs]
    cells = sp.reshape(ncy, cs, ncx, cs).transpose(0, 2, 1, 3).reshape(n_cells, cs * cs)
    cell_best = jnp.max(cells, axis=1)          # [n_cells]
    cell_arg = jnp.argmax(cells, axis=1)        # [n_cells]

    top_resp, top_cell = jax.lax.top_k(cell_best, budget)
    flat = cell_arg[top_cell]
    cy = top_cell // ncx
    cx = top_cell % ncx
    y = cy * cs + flat // cs
    x = cx * cs + flat % cs
    xy = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    valid = top_resp > 0.0
    return xy, top_resp, valid
