"""Fixed-capacity SLAM map pytrees.

The reference forward-declares ``Map`` and ``MapPoint`` but never defines
them (``tracking.hpp:33-34``, ``SlamTypes/Frame.hpp:18`` — SURVEY.md §0);
this module supplies the TPU-native realization of that declared intent:
no pointer graphs, just preallocated arrays with validity masks —

- map points: positions, descriptors, observation counts;
- keyframes: poses + ids + their keypoint snapshots (needed for
  triangulating new points against the previous keyframe);
- a COO observation list (keyframe idx, point idx, pixel, information)
  feeding bundle adjustment.

All capacities come from ``TrackerConfig`` so every consumer compiles once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import TrackerConfig

__all__ = ["SlamMap", "empty_map", "OBS_PER_KF"]

# observation-list capacity per keyframe slot
OBS_PER_KF = 512


class SlamMap(NamedTuple):
    # map points
    pts: jnp.ndarray          # [P, 3] world positions
    desc: jnp.ndarray         # [P, 8] uint32 representative descriptor
    pt_valid: jnp.ndarray     # [P] bool
    n_obs: jnp.ndarray        # [P] int32 times observed by a keyframe
    # keyframes
    kf_R: jnp.ndarray         # [Kc, 3, 3] world-to-camera
    kf_t: jnp.ndarray         # [Kc, 3]
    kf_valid: jnp.ndarray     # [Kc] bool
    kf_frame_id: jnp.ndarray  # [Kc] int32
    # observations (COO)
    obs_kf: jnp.ndarray       # [O] int32 keyframe slot
    obs_pt: jnp.ndarray       # [O] int32 map-point slot
    obs_uv: jnp.ndarray       # [O, 2] float32 undistorted pixels
    obs_inv_sigma2: jnp.ndarray  # [O] float32 information (per octave)
    obs_valid: jnp.ndarray    # [O] bool

    @property
    def point_capacity(self) -> int:
        return self.pts.shape[0]

    @property
    def kf_capacity(self) -> int:
        return self.kf_R.shape[0]

    def n_points(self):
        return jnp.sum(self.pt_valid.astype(jnp.int32))

    def n_keyframes(self):
        return jnp.sum(self.kf_valid.astype(jnp.int32))


def empty_map(cfg: TrackerConfig) -> SlamMap:
    P = cfg.max_map_points
    Kc = cfg.max_keyframes
    O = Kc * OBS_PER_KF
    return SlamMap(
        pts=jnp.zeros((P, 3), jnp.float32),
        desc=jnp.zeros((P, 8), jnp.uint32),
        pt_valid=jnp.zeros((P,), bool),
        n_obs=jnp.zeros((P,), jnp.int32),
        kf_R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (Kc, 3, 3)).copy(),
        kf_t=jnp.zeros((Kc, 3), jnp.float32),
        kf_valid=jnp.zeros((Kc,), bool),
        kf_frame_id=jnp.full((Kc,), -1, jnp.int32),
        obs_kf=jnp.zeros((O,), jnp.int32),
        obs_pt=jnp.zeros((O,), jnp.int32),
        obs_uv=jnp.zeros((O, 2), jnp.float32),
        obs_inv_sigma2=jnp.ones((O,), jnp.float32),
        obs_valid=jnp.zeros((O,), bool),
    )
