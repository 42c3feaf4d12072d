"""Fixed-capacity SLAM map pytrees with full lifecycle state.

The reference forward-declares ``Map`` and ``MapPoint`` but never defines
them (``tracking.hpp:33-34``, ``SlamTypes/Frame.hpp:18`` — SURVEY.md §0);
this module supplies the TPU-native realization of that declared intent:
no pointer graphs, just preallocated arrays with validity masks —

- map points: positions, descriptors, observation counts, tracking
  statistics (visible/found, for ORB-SLAM's found-ratio culling) and the
  keyframe-age stamp that drives MapPointCulling;
- keyframes: poses + ids + full keypoint snapshots (undistorted pixels,
  descriptors, octaves, angles, and the keypoint→map-point association
  ``Frame.hpp:91-93`` declares as ``mvpMapPoints``) — these snapshots are
  what covisibility-graph triangulation and BoW-restricted matching read;
- a COO observation list (keyframe idx, point idx, pixel, information)
  feeding bundle adjustment.

Slots (points, keyframes, observations) are RECYCLED: culling a point or
keyframe clears its validity bit and the freed rows are found again by
``free_slots`` — a long run reuses capacity instead of ratcheting to the
wall (the round-1 "capacity full" stall).

All capacities come from ``TrackerConfig`` plus the keypoint capacity of
the extractor, so every consumer compiles once.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrackerConfig

__all__ = [
    "SlamMap", "empty_map", "free_slots", "update_normal_and_depth",
    "apply_ba_result", "OBS_PER_KF",
]

# observation-list capacity per keyframe slot
OBS_PER_KF = 512


class SlamMap(NamedTuple):
    # map points
    pts: jnp.ndarray          # [P, 3] world positions
    desc: jnp.ndarray         # [P, 8] uint32 representative descriptor
    pt_valid: jnp.ndarray     # [P] bool
    n_obs: jnp.ndarray        # [P] int32 times observed by a keyframe
    pt_birth_kf: jnp.ndarray  # [P] int32 keyframe count at creation (age)
    pt_visible: jnp.ndarray   # [P] int32 frames where predicted visible
    pt_found: jnp.ndarray     # [P] int32 frames where actually matched
    # viewing statistics (MapPoint mNormalVector / mfMinDistance /
    # mfMaxDistance — ORB-SLAM UpdateNormalAndDepth): mean unit viewing
    # direction and the scale-invariance distance envelope. dmax == 0
    # marks "no viewing info yet"; frustum gates are skipped for such
    # points.
    pt_normal: jnp.ndarray    # [P, 3] float32 mean viewing direction
    pt_dmin: jnp.ndarray      # [P] float32 min scale-invariant distance
    pt_dmax: jnp.ndarray      # [P] float32 max scale-invariant distance
    # keyframes
    kf_R: jnp.ndarray         # [Kc, 3, 3] world-to-camera
    kf_t: jnp.ndarray         # [Kc, 3]
    kf_valid: jnp.ndarray     # [Kc] bool
    kf_frame_id: jnp.ndarray  # [Kc] int32
    # per-keyframe keypoint snapshots (mvKeysUn/mDescriptors/mvpMapPoints)
    kf_kp_xy: jnp.ndarray     # [Kc, N, 2] float32 undistorted pixels
    kf_kp_desc: jnp.ndarray   # [Kc, N, 8] uint32
    kf_kp_octave: jnp.ndarray  # [Kc, N] int32
    kf_kp_angle: jnp.ndarray   # [Kc, N] float32 degrees
    kf_kp_valid: jnp.ndarray   # [Kc, N] bool
    kf_kp_pt: jnp.ndarray      # [Kc, N] int32 map-point slot or -1
    # observations (COO)
    obs_kf: jnp.ndarray       # [O] int32 keyframe slot
    obs_pt: jnp.ndarray       # [O] int32 map-point slot
    obs_kp: jnp.ndarray       # [O] int32 keypoint index inside the keyframe
    #                           snapshot (ties BA pruning back to kf_kp_pt)
    obs_uv: jnp.ndarray       # [O, 2] float32 undistorted pixels
    obs_inv_sigma2: jnp.ndarray  # [O] float32 information (per octave)
    obs_valid: jnp.ndarray    # [O] bool

    @property
    def point_capacity(self) -> int:
        return self.pts.shape[0]

    @property
    def kf_capacity(self) -> int:
        return self.kf_R.shape[0]

    @property
    def kp_capacity(self) -> int:
        return self.kf_kp_xy.shape[1]

    def n_points(self):
        return jnp.sum(self.pt_valid.astype(jnp.int32))

    def n_keyframes(self):
        return jnp.sum(self.kf_valid.astype(jnp.int32))


@partial(jax.jit, static_argnames=("scale_factor", "n_levels"))
def update_normal_and_depth(m: SlamMap, scale_factor: float,
                            n_levels: int) -> SlamMap:
    """Recompute every point's mean viewing direction and scale-distance
    envelope from the observation list — the batch analog of ORB-SLAM's
    per-point ``MapPoint::UpdateNormalAndDepth`` (called after creation
    and whenever BA moves points/keyframes).

    normal  = mean over observing keyframes of the unit vector from the
              keyframe's optical centre to the point;
    dmax    = max over observations of dist * scale^octave  (the distance
              at which the point would appear at octave 0);
    dmin    = dmax / scale^(n_levels - 1).

    One segment-sum program over the COO observation list; points with no
    valid observation keep dmax == 0, which disables the frustum gates in
    ``search_by_projection``.
    """
    P = m.point_capacity
    okf = m.obs_kf
    opt = m.obs_pt
    ov = m.obs_valid & m.kf_valid[okf] & m.pt_valid[opt]

    # keyframe optical centres C = -R^T t
    centers = -jnp.einsum("kij,ki->kj", m.kf_R, m.kf_t)  # [Kc, 3]
    view = m.pts[opt] - centers[okf]                     # [O, 3]
    dist = jnp.linalg.norm(view, axis=-1)
    unit = view / jnp.maximum(dist, 1e-9)[:, None]

    w = ov.astype(jnp.float32)
    sum_dir = jnp.zeros((P, 3), jnp.float32).at[opt].add(unit * w[:, None])
    cnt = jnp.zeros((P,), jnp.float32).at[opt].add(w)
    normal = sum_dir / jnp.maximum(cnt, 1.0)[:, None]
    nrm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nrm, 1e-9)

    octv = m.kf_kp_octave[okf, m.obs_kp].astype(jnp.float32)
    dmax_cand = jnp.where(ov, dist * scale_factor ** octv, 0.0)
    dmax = jnp.zeros((P,), jnp.float32).at[opt].max(dmax_cand)
    dmin = dmax / scale_factor ** (n_levels - 1)
    has = cnt > 0
    return m._replace(
        pt_normal=jnp.where(has[:, None], normal, m.pt_normal),
        pt_dmin=jnp.where(has, dmin, m.pt_dmin),
        pt_dmax=jnp.where(has, dmax, m.pt_dmax),
    )


def apply_ba_result(m: SlamMap, res) -> SlamMap:
    """Adopt a ``bundle_adjust`` result into the map: refined poses and
    points, plus the outlier lifecycle (``Frame.hpp:91-93``'s "marked as
    outliers after BA"): observations reclassified as outliers are
    invalidated, per-point observation counts drop with the pruned rows,
    and the keyframe snapshots' keypoint->point associations are severed
    so the slots can be re-associated later.
    """
    pruned = m.obs_valid & ~res.obs_inlier
    sever = jnp.zeros(m.kf_kp_pt.shape, jnp.int32).at[
        m.obs_kf, m.obs_kp
    ].add(pruned.astype(jnp.int32)) > 0
    return m._replace(
        kf_R=res.kf_R, kf_t=res.kf_t, pts=res.pts,
        obs_valid=m.obs_valid & res.obs_inlier,
        n_obs=m.n_obs.at[m.obs_pt].add(-pruned.astype(jnp.int32)),
        kf_kp_pt=jnp.where(sever, -1, m.kf_kp_pt),
    )


def free_slots(valid, n: int) -> np.ndarray:
    """First ``n`` free (invalid) slot indices, host-side. May return
    fewer than ``n`` when capacity is genuinely exhausted."""
    return np.where(~np.asarray(valid))[0][:n]


def empty_map(cfg: TrackerConfig, kp_capacity: int = 2048) -> SlamMap:
    P = cfg.max_map_points
    Kc = cfg.max_keyframes
    N = kp_capacity
    O = Kc * OBS_PER_KF
    return SlamMap(
        pts=jnp.zeros((P, 3), jnp.float32),
        desc=jnp.zeros((P, 8), jnp.uint32),
        pt_valid=jnp.zeros((P,), bool),
        n_obs=jnp.zeros((P,), jnp.int32),
        pt_birth_kf=jnp.zeros((P,), jnp.int32),
        pt_visible=jnp.zeros((P,), jnp.int32),
        pt_found=jnp.zeros((P,), jnp.int32),
        pt_normal=jnp.zeros((P, 3), jnp.float32),
        pt_dmin=jnp.zeros((P,), jnp.float32),
        pt_dmax=jnp.zeros((P,), jnp.float32),
        kf_R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (Kc, 3, 3)).copy(),
        kf_t=jnp.zeros((Kc, 3), jnp.float32),
        kf_valid=jnp.zeros((Kc,), bool),
        kf_frame_id=jnp.full((Kc,), -1, jnp.int32),
        kf_kp_xy=jnp.zeros((Kc, N, 2), jnp.float32),
        kf_kp_desc=jnp.zeros((Kc, N, 8), jnp.uint32),
        kf_kp_octave=jnp.zeros((Kc, N), jnp.int32),
        kf_kp_angle=jnp.zeros((Kc, N), jnp.float32),
        kf_kp_valid=jnp.zeros((Kc, N), bool),
        kf_kp_pt=jnp.full((Kc, N), -1, jnp.int32),
        obs_kf=jnp.zeros((O,), jnp.int32),
        obs_pt=jnp.zeros((O,), jnp.int32),
        obs_kp=jnp.zeros((O,), jnp.int32),
        obs_uv=jnp.zeros((O, 2), jnp.float32),
        obs_inv_sigma2=jnp.ones((O,), jnp.float32),
        obs_valid=jnp.zeros((O,), bool),
    )
