"""Two-frame initialization matching.

TPU-native replacement for ``ORBmatcher::SearchForInitialization``
(``Features/ORBmatcher.cpp:11-150``). The reference's sequential scan —
grid-windowed candidate lookup, best/second-best tracking, match
"stealing" (``:95-103``), rotation-consistency histogram (``:108-141``) —
becomes one dense masked program:

- the grid lookup (``Frame::GetFeaturesInArea``) becomes a coordinate-
  window mask over the full [N1, N2] Hamming matrix (hamming.py's MXU
  bit-matmul);
- best/second-best + ratio test are two masked min-reductions;
- the sequential steal logic becomes an order-independent mutual-best
  resolution: per F2 keypoint keep the globally closest claimant
  (scatter-min with an index tiebreak) — same fixed point the reference's
  in-order stealing converges to, but deterministic and parallel;
- the 30-bin rotation histogram with top-3 bin retention reproduces
  ``ComputeThreeMaxima`` (``:152-183``) including the 0.1x secondary-bin
  gates and the corrected HISTO_LENGTH/360 factor (``:21-23``).

All thresholds come from ``MatcherConfig`` (TH_LOW=50, ratio=0.9,
window=100, matching ``ORBmatcher.cpp:5-7`` / ``tracking.cpp:105``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# float32 matmul precision on TPU (the default truncates to bfloat16
# - see optim/ba.py:_obs_residuals).
_HI = jax.lax.Precision.HIGHEST

from ..config import MatcherConfig
from .hamming import hamming_matrix

__all__ = [
    "MatchResult", "search_for_initialization", "compact_matches",
    "search_for_triangulation", "match_descriptors",
    "match_descriptors_bow",
]

# plain int, NOT jnp.int32: a module-level jnp constant would initialize
# the XLA backend at import time, which breaks multi-process workers that
# must call jax.distributed.initialize() first (parallel/distributed.py)
_BIG = 1 << 20


class MatchResult(NamedTuple):
    matches12: jnp.ndarray  # [N1] int32 index into frame-2 kps, -1 = none
    distances: jnp.ndarray  # [N1] int32 Hamming distance (valid where matched)
    n_matches: jnp.ndarray  # [] int32
    # reject histogram, mirroring the reference's diagnostic counters
    # (ORBmatcher.cpp:33,143-147)
    n_reject_distance: jnp.ndarray
    n_reject_ratio: jnp.ndarray
    n_reject_orientation: jnp.ndarray


@partial(jax.jit, static_argnames=("cfg",))
def search_for_initialization(
    desc1: jnp.ndarray,
    xy1: jnp.ndarray,
    octave1: jnp.ndarray,
    angle1: jnp.ndarray,
    valid1: jnp.ndarray,
    desc2: jnp.ndarray,
    xy2: jnp.ndarray,
    octave2: jnp.ndarray,
    angle2: jnp.ndarray,
    valid2: jnp.ndarray,
    cfg: MatcherConfig,
) -> MatchResult:
    """Match frame-1 keypoints to frame-2 keypoints for initialization.

    Coordinates should be undistorted level-0 pixels (the reference searches
    its grid over ``mvKeysUn``). Only octave-0 keypoints participate on both
    sides (``ORBmatcher.cpp:36-44``).
    """
    n1 = desc1.shape[0]

    D = hamming_matrix(desc1, desc2)  # [N1, N2] int32

    dx = xy1[:, 0:1] - xy2[None, :, 0]
    dy = xy1[:, 1:2] - xy2[None, :, 1]
    r = cfg.window_size
    in_window = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
    eligible = (
        valid1[:, None]
        & valid2[None, :]
        & (octave1 == 0)[:, None]
        & (octave2 == 0)[None, :]
        & in_window
    )
    Dm = jnp.where(eligible, D, _BIG)

    best = jnp.min(Dm, axis=1)                      # [N1]
    best_j = jnp.argmin(Dm, axis=1)                 # [N1]
    cols = jax.lax.broadcasted_iota(jnp.int32, Dm.shape, 1)
    second = jnp.min(jnp.where(cols == best_j[:, None], _BIG, Dm), axis=1)

    had_candidate = best < _BIG
    pass_low = best <= cfg.th_low
    pass_ratio = best.astype(jnp.float32) < cfg.nn_ratio * second.astype(jnp.float32)
    accept = had_candidate & pass_low & pass_ratio

    # mutual resolution: per F2 index, keep the single closest claimant
    # (dist-then-index lexicographic key; replaces ORBmatcher.cpp:95-103)
    rows = jnp.arange(n1, dtype=jnp.int32)
    # accepted keys are <= 256*n1 + n1, far below the int32 sentinel
    sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
    key = jnp.where(accept, best * jnp.int32(n1) + rows, sentinel)
    n2 = desc2.shape[0]
    min_key_per_j = jnp.full((n2,), sentinel, dtype=jnp.int32)
    min_key_per_j = min_key_per_j.at[best_j].min(key)
    keep = accept & (key == min_key_per_j[best_j])

    n_reject_distance = jnp.sum(had_candidate & ~pass_low)
    n_reject_ratio = jnp.sum(had_candidate & pass_low & ~pass_ratio)

    if cfg.check_orientation:
        # rotation histogram over kept matches (ORBmatcher.cpp:108-141)
        rot = angle1 - angle2[best_j]
        rot = jnp.where(rot < 0, rot + 360.0, rot)
        factor = cfg.histo_length / 360.0
        b = jnp.round(rot * factor).astype(jnp.int32)
        b = jnp.where(b == cfg.histo_length, 0, b)
        counts = jnp.zeros((cfg.histo_length,), jnp.int32).at[b].add(
            keep.astype(jnp.int32)
        )
        top_counts, top_bins = jax.lax.top_k(counts, 3)
        c1, c2, c3 = top_counts[0], top_counts[1], top_counts[2]
        allow2 = c2.astype(jnp.float32) >= 0.1 * c1.astype(jnp.float32)
        allow3 = c3.astype(jnp.float32) >= 0.1 * c1.astype(jnp.float32)
        in_top = (
            (b == top_bins[0])
            | ((b == top_bins[1]) & allow2)
            | ((b == top_bins[2]) & allow3)
        )
        n_reject_orientation = jnp.sum(keep & ~in_top)
        keep = keep & in_top
    else:
        n_reject_orientation = jnp.int32(0)

    matches12 = jnp.where(keep, best_j.astype(jnp.int32), -1)
    distances = jnp.where(keep, best, _BIG)
    return MatchResult(
        matches12=matches12,
        distances=distances,
        n_matches=jnp.sum(keep.astype(jnp.int32)),
        n_reject_distance=n_reject_distance,
        n_reject_ratio=n_reject_ratio,
        n_reject_orientation=n_reject_orientation,
    )


@partial(jax.jit, static_argnames=("cfg", "scale_factor"))
def search_for_triangulation(
    desc1: jnp.ndarray,
    xy1: jnp.ndarray,
    octave1: jnp.ndarray,
    angle1: jnp.ndarray,
    valid1: jnp.ndarray,
    desc2: jnp.ndarray,
    xy2: jnp.ndarray,
    octave2: jnp.ndarray,
    angle2: jnp.ndarray,
    valid2: jnp.ndarray,
    F21: jnp.ndarray,
    cfg: MatcherConfig,
    scale_factor: float = 1.2,
) -> MatchResult:
    """Epipolar-gated matching of unassociated keypoints between two
    keyframes — ORB-SLAM's ``SearchForTriangulation`` role for
    ``CreateNewMapPoints`` (the capability the reference's vendored stack
    declares; its own matcher stops at initialization).

    Unlike ``search_for_initialization`` there is NO octave-0 restriction
    and no window: candidates are gated by the epipolar line instead —
    the squared point-to-line distance of the frame-2 keypoint from
    ``F21 @ x1`` must be below ``3.84 * sigma2(octave2)``
    (ORB-SLAM's CheckDistEpipolarLine chi2 bound, per-octave sigma).
    ``F21`` maps frame-1 pixels to frame-2 epipolar lines.
    """
    n1 = desc1.shape[0]

    D = hamming_matrix(desc1, desc2)  # [N1, N2]

    ones1 = jnp.ones_like(xy1[:, :1])
    p1 = jnp.concatenate([xy1, ones1], axis=-1)              # [N1, 3]
    l2 = jnp.matmul(p1, F21.T, precision=_HI)  # [N1, 3]
    num = l2[:, 0:1] * xy2[None, :, 0] + l2[:, 1:2] * xy2[None, :, 1] + l2[:, 2:3]
    den = jnp.maximum(l2[:, 0:1] ** 2 + l2[:, 1:2] ** 2, 1e-12)
    dsq = (num * num) / den                                  # [N1, N2]
    sigma2_2 = scale_factor ** (2.0 * octave2.astype(jnp.float32))  # [N2]
    on_epiline = dsq < 3.84 * sigma2_2[None, :]

    eligible = valid1[:, None] & valid2[None, :] & on_epiline
    Dm = jnp.where(eligible, D, _BIG)

    best = jnp.min(Dm, axis=1)
    best_j = jnp.argmin(Dm, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, Dm.shape, 1)
    second = jnp.min(jnp.where(cols == best_j[:, None], _BIG, Dm), axis=1)

    had_candidate = best < _BIG
    pass_low = best <= cfg.th_low
    pass_ratio = best.astype(jnp.float32) < cfg.nn_ratio * second.astype(jnp.float32)
    accept = had_candidate & pass_low & pass_ratio

    rows = jnp.arange(n1, dtype=jnp.int32)
    sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
    key = jnp.where(accept, best * jnp.int32(n1) + rows, sentinel)
    n2 = desc2.shape[0]
    min_key_per_j = jnp.full((n2,), sentinel, dtype=jnp.int32).at[best_j].min(key)
    keep = accept & (key == min_key_per_j[best_j])

    n_reject_distance = jnp.sum(had_candidate & ~pass_low)
    n_reject_ratio = jnp.sum(had_candidate & pass_low & ~pass_ratio)

    if cfg.check_orientation:
        rot = angle1 - angle2[best_j]
        rot = jnp.where(rot < 0, rot + 360.0, rot)
        factor = cfg.histo_length / 360.0
        b = jnp.round(rot * factor).astype(jnp.int32)
        b = jnp.where(b == cfg.histo_length, 0, b)
        counts = jnp.zeros((cfg.histo_length,), jnp.int32).at[b].add(
            keep.astype(jnp.int32)
        )
        top_counts, top_bins = jax.lax.top_k(counts, 3)
        c1, c2, c3 = top_counts[0], top_counts[1], top_counts[2]
        allow2 = c2.astype(jnp.float32) >= 0.1 * c1.astype(jnp.float32)
        allow3 = c3.astype(jnp.float32) >= 0.1 * c1.astype(jnp.float32)
        in_top = (
            (b == top_bins[0])
            | ((b == top_bins[1]) & allow2)
            | ((b == top_bins[2]) & allow3)
        )
        n_reject_orientation = jnp.sum(keep & ~in_top)
        keep = keep & in_top
    else:
        n_reject_orientation = jnp.int32(0)

    return MatchResult(
        matches12=jnp.where(keep, best_j.astype(jnp.int32), -1),
        distances=jnp.where(keep, best, _BIG),
        n_matches=jnp.sum(keep.astype(jnp.int32)),
        n_reject_distance=n_reject_distance,
        n_reject_ratio=n_reject_ratio,
        n_reject_orientation=n_reject_orientation,
    )


@partial(jax.jit, static_argnames=())
def match_descriptors(
    desc1: jnp.ndarray,
    valid1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid2: jnp.ndarray,
    ratio: float = 0.75,
    th: int = 50,
):
    """Window-free global descriptor matching (best + ratio + mutual).

    The spatial-prior-free matcher relocalization needs (ORB-SLAM's
    ``SearchByBoW`` role): returns matches12 [N1] int32 (-1 = none).
    """
    n1 = desc1.shape[0]
    n2 = desc2.shape[0]
    D = hamming_matrix(desc1, desc2)
    Dm = jnp.where(valid1[:, None] & valid2[None, :], D, _BIG)
    best = jnp.min(Dm, axis=1)
    best_j = jnp.argmin(Dm, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, Dm.shape, 1)
    second = jnp.min(jnp.where(cols == best_j[:, None], _BIG, Dm), axis=1)
    accept = (best <= th) & (
        best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    )
    sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
    rows = jnp.arange(n1, dtype=jnp.int32)
    key = jnp.where(accept, best * jnp.int32(n1) + rows, sentinel)
    min_key = jnp.full((n2,), sentinel, dtype=jnp.int32).at[best_j].min(key)
    keep = accept & (key == min_key[best_j])
    return jnp.where(keep, best_j.astype(jnp.int32), -1)


@jax.jit
def match_descriptors_bow(
    desc1: jnp.ndarray,
    valid1: jnp.ndarray,
    node1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid2: jnp.ndarray,
    node2: jnp.ndarray,
    ratio: float = 0.75,
    th: int = 50,
):
    """Vocabulary-node-restricted matching — the actual ``SearchByBoW``
    (``ORBmatcher.cpp`` SearchByBoW iterates the two frames' FeatureVector
    in lockstep and only compares features under the SAME direct-index
    node). Confining best/second-best to one vocabulary cell is what makes
    the 0.75 ratio test survivable on self-similar scenes: globally, the
    second-best among hundreds of look-alike features is nearly as close
    as the true match and the ratio gate starves the Sim(3) solver of
    seeds.

    ``node1``/``node2`` are per-keypoint direct-index node ids
    (``bow.vocabulary.direct_index_nodes``). Same contract as
    :func:`match_descriptors` otherwise.
    """
    n1 = desc1.shape[0]
    n2 = desc2.shape[0]
    D = hamming_matrix(desc1, desc2)
    elig = (valid1[:, None] & valid2[None, :]
            & (node1[:, None] == node2[None, :]))
    Dm = jnp.where(elig, D, _BIG)
    best = jnp.min(Dm, axis=1)
    best_j = jnp.argmin(Dm, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, Dm.shape, 1)
    second = jnp.min(jnp.where(cols == best_j[:, None], _BIG, Dm), axis=1)
    accept = (best <= th) & (
        best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    )
    sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
    rows = jnp.arange(n1, dtype=jnp.int32)
    key = jnp.where(accept, best * jnp.int32(n1) + rows, sentinel)
    min_key = jnp.full((n2,), sentinel, dtype=jnp.int32).at[best_j].min(key)
    keep = accept & (key == min_key[best_j])
    return jnp.where(keep, best_j.astype(jnp.int32), -1)


@partial(jax.jit, static_argnames=("cap",))
def compact_matches(matches12: jnp.ndarray, cap: int):
    """Compact sparse matches [N1] -> fixed-capacity pairs.

    Returns (pairs [cap, 2] int32 (i1, i2), valid [cap] bool). Matched rows
    are moved to the front in index order (stable), like the reference's
    ``mvMatches12`` compaction (``Initializer.cpp:24-34``).
    """
    n1 = matches12.shape[0]
    matched = matches12 >= 0
    order = jnp.argsort(jnp.where(matched, 0, 1), stable=True)
    take = order[:cap]
    valid = matched[take]
    i1 = jnp.where(valid, take.astype(jnp.int32), 0)
    i2 = jnp.where(valid, matches12[take], 0)
    return jnp.stack([i1, i2], axis=-1), valid
