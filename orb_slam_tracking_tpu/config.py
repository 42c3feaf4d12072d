"""Typed, validated configuration tree for the TPU-native SLAM tracking engine.

TPU-first replacement for the reference's stringly ``Settings`` class
(reference: ``Config/Settings.hpp:8-129``), which reads a YAML through
``cv::FileStorage`` and silently coerces missing keys to zero (see the
iniThFAST/fastTh key-mismatch quirk, ``Settings.hpp:75-77`` vs
``Settings.yaml:36-39``). Here every config is a frozen dataclass with explicit
defaults matching the reference's *documented* operating point, and the YAML
loader raises on unknown keys instead of zero-filling.

All configs are hashable so they can be passed as static arguments to
``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import math
import re
from typing import Optional, Tuple

__all__ = [
    "CameraConfig",
    "OrbConfig",
    "MatcherConfig",
    "InitConfig",
    "TrackerConfig",
    "SystemConfig",
    "load_system_config",
]


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole camera with Brown radial-tangential distortion.

    Mirrors the intrinsics block of the reference settings
    (``Config/Settings.hpp:28-39``): fx, fy, cx, cy and k1, k2, p1, p2.
    Image size is part of the config because every shape downstream is static.
    """

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    width: int = 640
    height: int = 480
    fps: float = 30.0
    rgb: bool = True

    def __post_init__(self):
        if self.fx <= 0 or self.fy <= 0:
            raise ValueError(f"focal lengths must be positive, got {self.fx}, {self.fy}")
        if self.width <= 0 or self.height <= 0:
            raise ValueError("image size must be positive")

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2))

    @property
    def k_tuple(self) -> Tuple[float, ...]:
        return (self.fx, 0.0, self.cx, 0.0, self.fy, self.cy, 0.0, 0.0, 1.0)


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    """ORB extraction operating point.

    Defaults follow the reference's documented thresholds — 1000 features,
    scale 1.2, 8 levels, FAST thresholds 20/7 (``Settings.yaml:27-33``,
    ``demo/demo_ORBextractor.cpp:20``) — not the accidental 0/0 the reference
    demo actually runs with (key-name mismatch, SURVEY §5.6).

    ``max_keypoints`` is the static capacity of all keypoint arrays; the
    actual number extracted is carried in a validity mask (TPU fixed-shape
    discipline replacing ``std::vector`` growth).
    """

    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7
    # Keypoint ranking score (the reference's declared scoreType axis,
    # ORBextractor.hpp:57 / Settings.hpp:77-90): "fast" ranks by the exact
    # FAST corner score; "harris" detects with FAST and ranks the corners
    # by the Harris measure (OpenCV-ORB HARRIS_SCORE semantics).
    score_type: str = "fast"
    # Static capacity of keypoint arrays (>= n_features, padded with invalid).
    max_keypoints: int = 0  # 0 => auto: next multiple of 256 >= n_features
    # Border where no keypoint may live; the reference's EDGE_THRESHOLD=19
    # (ORBextractor.cpp:90) minus the 3px FAST apron.
    edge_threshold: int = 19
    patch_size: int = 31
    half_patch_size: int = 15
    # Spatial-uniformity cell target in pixels at each level; the reference's
    # quadtree converges to ~one max-response keypoint per leaf cell
    # (ORBextractor.cpp:975-1007); we use a fixed grid at equivalent density.
    fast_cell_size: int = 35
    # Cell size (px) of the top-1-per-cell selection grid replacing the
    # quadtree (ops/select.py); cell count per level must exceed that
    # level's feature budget.
    select_cell_size: int = 12
    # Run the atlas-fused extraction path (ops/atlas.py): all levels packed
    # into one canvas so the heavy stages run once instead of per level.
    # Bit-identical to the per-level path; the flag exists for A/B
    # measurement and fallback.
    use_atlas: bool = True

    def __post_init__(self):
        if self.n_levels < 1:
            raise ValueError("n_levels must be >= 1")
        if self.scale_factor <= 1.0:
            raise ValueError("scale_factor must be > 1")
        if self.score_type not in ("fast", "harris"):
            raise ValueError(
                f"score_type must be 'fast' or 'harris', "
                f"got {self.score_type!r}")
        if self.max_keypoints == 0:
            cap = ((self.n_features + 255) // 256) * 256
            object.__setattr__(self, "max_keypoints", cap)
        if self.max_keypoints < self.n_features:
            raise ValueError("max_keypoints must be >= n_features")

    def features_per_level(self) -> Tuple[int, ...]:
        """Geometric per-level feature budget.

        Same math as the reference ctor (``ORBextractor.cpp:529-548``):
        ``nfeatures*(1-1/s)/(1-(1/s)^L)`` at level 0, scaled by 1/s per level,
        remainder assigned to the top level.
        """
        inv = 1.0 / self.scale_factor
        n_desired = self.n_features * (1 - inv) / (1 - inv ** self.n_levels)
        budget = []
        total = 0
        for _ in range(self.n_levels - 1):
            n = int(round(n_desired))
            budget.append(n)
            total += n
            n_desired *= inv
        budget.append(max(self.n_features - total, 0))
        return tuple(budget)

    def level_scales(self) -> Tuple[float, ...]:
        return tuple(self.scale_factor ** i for i in range(self.n_levels))

    def level_shapes(self, height: int, width: int) -> Tuple[Tuple[int, int], ...]:
        """Static (H, W) of each pyramid level (round like cv::resize)."""
        shapes = []
        for s in self.level_scales():
            shapes.append((int(round(height / s)), int(round(width / s))))
        return tuple(shapes)


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    """Initialization matcher thresholds (``Features/ORBmatcher.cpp:5-7``)."""

    nn_ratio: float = 0.9
    check_orientation: bool = True
    th_low: int = 50
    th_high: int = 100
    histo_length: int = 30
    window_size: int = 100  # search radius in px (tracking.cpp:105)
    # Max matches carried through init (static shape; the reference requires
    # >= 100 matches, tracking.cpp:105)
    max_matches: int = 2048


@dataclasses.dataclass(frozen=True)
class InitConfig:
    """Two-view initialization (``Initialization/Initializer.hpp:20``,
    ``Initializer.cpp:19-125``)."""

    sigma: float = 1.0
    ransac_iterations: int = 200  # tracking.cpp:88 (demo uses 2000)
    min_matches: int = 100        # tracking.cpp:105
    min_triangulated: int = 50    # Initializer.cpp:527-549
    min_parallax_deg: float = 1.0
    # Model selection: RH = SH/(SH+SF) > rh_threshold => homography.
    # The reference code uses 0.50 (Initializer.cpp:111, the ORB-SLAM3
    # convention) and its own comment notes ORB-SLAM2 used 0.40
    # (Initializer.cpp:110). Default 0.40 here by measured decision
    # (BASELINE.md round 5): on planar scenes the H/F scores tie near
    # RH~0.49, 0.50 picks the planar-DEGENERATE F model (init delayed
    # ~150 frames on the planar stress sequence), while 0.40 prefers H
    # (init 18 frames earlier, equal ATE) and leaves every non-planar
    # sequence bit-identical (clean-loop control: RH=0.39, F selected,
    # same ATE).
    rh_threshold: float = 0.40
    # χ² thresholds at 95%: 2 dof (H symmetric transfer) / 1 dof (F epipolar)
    chi2_h: float = 5.991
    chi2_f: float = 3.841


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Full tracking-loop knobs, completing the reference's declared intent
    (states ``tracking.hpp:58-65``, motion model ``tracking.hpp:110-111``,
    keyframe bounds ``Config/Settings.hpp:44-46``)."""

    use_motion_model: bool = True
    min_frames: int = 0
    max_frames: int = 18  # 18 * fps / 30 at fps=30 (Settings.hpp:46)
    # Projection-search radius (px) for motion-model matching (stage 1),
    # scaled per keypoint octave like ORB-SLAM's th*scaleFactor^octave.
    projection_radius: float = 15.0
    # Tight re-match radius for the local-map stage after the first pose
    # optimization (ORB-SLAM SearchByProjection uses ~2.5-4 px here); this
    # is the main guard against association drift along flat cost valleys.
    local_map_radius: float = 3.0
    # Minimum inliers to accept a tracked pose.
    min_tracked_inliers: int = 10
    # Device-loop LOST recovery (slam/device_mapping.py): when a frame
    # fails the inlier gate inside the one-scan sequence loop, a
    # lax.cond tier re-matches the SAME frame's keypoints against the
    # map at projection_radius * this scale from the last good pose and
    # re-optimizes with a widened Huber basin — the device twin of the
    # host's windowed re-acquisition (the reference's LOST state has no
    # recovery, tracking.hpp:58-65; full ORB-SLAM re-acquires). Paid
    # only on LOST frames (scalar-predicate cond on TPU). 0 disables.
    lost_recovery_radius_scale: float = 3.0
    # Pose-only optimizer rounds with outlier reclassification. ORB-SLAM
    # runs 4x10; measured on the closed-loop ground-truth suite, 2 rounds
    # of 6 LM steps tracks with identical ATE at a quarter of the
    # sequential chain length (the LM chain is latency-bound on TPU).
    pose_opt_rounds: int = 2
    pose_opt_iters: int = 6
    huber_delta: float = math.sqrt(5.991)
    # Map capacities (static shapes).
    max_keyframes: int = 64
    max_map_points: int = 8192
    # Bag-of-words place recognition for LOST-state relocalization: a small
    # vocabulary is trained on the init-frame descriptors (the reference
    # ships a pretrained DBoW2 vocabulary instead; SURVEY.md §7.10).
    use_bow: bool = True
    bow_branching: int = 8
    bow_depth: int = 3
    # Path to a pretrained vocabulary artifact (save_vocabulary npz or
    # DBoW2 ORBvoc .txt). The default "bundled" resolves to the best
    # corpus-trained artifact shipped with the package (preferring
    # data/orbvoc_synth_k10_L5.npz, 100k words — the held-out recall
    # study winner, BASELINE.md round 4 — over the 10k L4 one), falling
    # back to one-frame training when absent. None forces one-frame
    # training.
    # When
    # set, the tracker loads it at map init instead of training from the
    # init frame — the reference's own workflow (a shipped ORBvoc loaded at
    # System construction; TemplatedVocabulary.h:229-265).
    vocab_path: Optional[str] = "bundled"
    # Local BA window.
    ba_window: int = 20
    ba_iterations: int = 10
    # Data-dependent LM convergence gate: stop paying for BA iterations
    # once an accepted step improves the robust cost by less than this
    # fraction (the capability of g2o's "Raul" early termination,
    # optimization_algorithm_levenberg.cpp:154-161, re-expressed as a
    # lax.cond no-op on the remaining scan steps — optim/ba.py). The
    # map is warm across keyframe inserts, so most local-BA solves
    # converge in 2-4 of the ba_iterations budget. 0.0 disables.
    ba_early_stop_rel: float = 1e-4
    # BA segment-sum formulation — see optim/ba.bundle_adjust
    # (segment_mode=...). "auto" resolves to the Kronecker-factored
    # one-hot matmul build on TPU (colliding scatter-adds serialize
    # there: 75% of the LM iteration at 64 KF, BASELINE.md r5) and to
    # plain scatter on CPU (where scatter is fastest).
    ba_segment_mode: str = "auto"
    # --- map lifecycle (ORB-SLAM LocalMapping semantics) ---
    # Covisibility-graph triangulation: new points are triangulated against
    # the best-covisible keyframes (CreateNewMapPoints), not just the
    # previous one.
    covis_keyframes: int = 3
    covis_min_shared: int = 15
    # Fuse: a candidate new point whose keypoint sits within this radius of
    # an existing point's projection (and matches its descriptor) is an
    # association to that point, not a new one.
    fuse_radius_px: float = 2.0
    # MapPointCulling: a point must reach >= cull_min_obs keyframe
    # observations within cull_age_kfs keyframes of its creation, and keep
    # a tracking found/visible ratio above cull_found_ratio.
    cull_min_obs: int = 3
    cull_age_kfs: int = 3
    cull_found_ratio: float = 0.25
    cull_min_visible: int = 8
    # KeyFrameCulling: a keyframe is redundant when this fraction of its
    # points is observed by >= 4 keyframes.
    kf_redundancy_frac: float = 0.9
    # Relocalization: number of BoW place-recognition candidates whose
    # observed points bound the 2D-3D search (TemplatedDatabase.h:35 query
    # -> candidates; map-wide fallback only without a vocabulary).
    reloc_bow_candidates: int = 5
    # --- loop closing (the capability the reference vendors g2o's Sim(3)
    # types for, types_seven_dof_expmap.h:48-152; ORB-SLAM LoopClosing) ---
    use_loop_closing: bool = True
    # A loop candidate must be at least this many frames older than the
    # current keyframe (scale drift needs time; also blocks trivial
    # self-matches the covisibility exclusion misses).
    loop_min_frame_gap: int = 60
    # Candidate must recur in this many consecutive keyframe insertions
    # (ORB-SLAM mnCovisibilityConsistencyTh = 3).
    loop_consistency_th: int = 3
    # Minimum Sim(3) inliers to accept a loop (ORB-SLAM: 20).
    loop_min_inliers: int = 20
    # Most consistent candidates run through the Sim(3) gauntlet per
    # keyframe. ORB-SLAM bounds the equivalent cost inside ComputeSim3
    # with a global 300-iteration RANSAC budget shared round-robin across
    # nInitialCandidates; a candidate cap is the batched analog (the list
    # is BoW-score-sorted, so the cap drops the least likely first).
    loop_max_sim3_candidates: int = 5
    # Covisibility edges enter the essential graph above this shared-point
    # count (ORB-SLAM uses 100 for the covisibility tier; maps here are
    # smaller).
    loop_covis_edge_min_shared: int = 30
    # LM iterations for the Sim(3) pose-graph solve.
    pose_graph_iterations: int = 15
    # SearchAndFuse: pixel radius for projecting loop map points into the
    # current covisibility group's keyframes (corrected poses).
    loop_fuse_radius_px: float = 8.0
    # SearchBySim3 growth: BASE pixel radius for the bidirectional
    # projection match that grows the RANSAC correspondences before
    # OptimizeSim3. The effective per-keypoint radius is
    # base * scale_factor**octave — the ORBmatcher::SearchBySim3
    # convention (7.5 * mvScaleFactors[kp.octave]).
    loop_sim3_grow_radius_px: float = 7.5
    # LM iterations for the global bundle adjustment that follows a loop
    # correction (ORB-SLAM RunGlobalBundleAdjustment; 0 disables). All
    # keyframes are free except the oldest (the gauge anchor).
    loop_global_ba_iterations: int = 8


@dataclasses.dataclass(frozen=True)
class SystemConfig:
    camera: CameraConfig
    orb: OrbConfig = OrbConfig()
    matcher: MatcherConfig = MatcherConfig()
    init: InitConfig = InitConfig()
    tracker: TrackerConfig = TrackerConfig()

    @property
    def init_orb(self) -> OrbConfig:
        """Init-time extractor with 2x the features (tracking.cpp:17-23)."""
        return dataclasses.replace(
            self.orb, n_features=2 * self.orb.n_features, max_keypoints=0
        )


# Keys accepted from reference-style YAML (Settings.hpp:18-97), mapped onto
# the dataclass tree. Both the documented names and the bundled-YAML variant
# names are accepted to avoid the reference's silent-zero quirk.
_CAMERA_KEYS = {
    "Camera.fx": "fx", "Camera.fy": "fy", "Camera.cx": "cx", "Camera.cy": "cy",
    "Camera.k1": "k1", "Camera.k2": "k2", "Camera.p1": "p1", "Camera.p2": "p2",
    "Camera.fps": "fps", "Camera.RGB": "rgb",
    "Camera.width": "width", "Camera.height": "height",
}
_ORB_KEYS = {
    "ORBextractor.nFeatures": "n_features",
    "ORBextractor.scaleFactor": "scale_factor",
    "ORBextractor.nLevels": "n_levels",
    "ORBextractor.iniThFAST": "ini_th_fast",
    "ORBextractor.fastTh": "ini_th_fast",      # bundled-YAML alias
    "ORBextractor.minThFAST": "min_th_fast",
    "ORBextractor.scoreType": "score_type",    # 0 = Harris, 1 = FAST
    "ORBextractor.nScoreType": "score_type",   # (Settings.hpp:77,124 enum)
}
_TRACKER_KEYS = {"UseMotionModel": "use_motion_model"}


def _parse_opencv_yaml(text: str) -> dict:
    """Parse the subset of OpenCV FileStorage YAML the reference uses.

    The ``%YAML:1.0`` directive is invalid for PyYAML; the documents are flat
    ``key: scalar`` maps, so a tolerant line parser is enough and avoids an
    OpenCV dependency.
    """
    out = {}
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or line.startswith("%"):
            continue
        m = re.match(r"^([\w.]+)\s*:\s*(.+)$", line)
        if not m:
            continue
        key, val = m.group(1), m.group(2).strip().strip('"')
        try:
            out[key] = int(val)
        except ValueError:
            try:
                out[key] = float(val)
            except ValueError:
                out[key] = val
    return out


def load_system_config(path: str, width: int = 640, height: int = 480,
                       strict: bool = True) -> SystemConfig:
    """Load a reference-style ``Settings.yaml`` into a validated SystemConfig.

    Unlike ``cv::FileStorage`` (missing keys coerce to 0, Settings.hpp:75-77),
    unknown keys raise when ``strict`` and required camera keys must exist.
    """
    with open(path) as f:
        raw = _parse_opencv_yaml(f.read())

    cam_kwargs, orb_kwargs, trk_kwargs = {}, {}, {}
    for key, val in raw.items():
        if key in _CAMERA_KEYS:
            field = _CAMERA_KEYS[key]
            cam_kwargs[field] = bool(val) if field == "rgb" else val
        elif key in _ORB_KEYS:
            field = _ORB_KEYS[key]
            if field == "score_type":
                # reference enum: HARRIS_SCORE=0, FAST_SCORE=1
                # (ORBextractor.hpp:57)
                orb_kwargs[field] = "harris" if int(val) == 0 else "fast"
            elif field is not None:
                orb_kwargs[field] = val
        elif key in _TRACKER_KEYS:
            trk_kwargs[_TRACKER_KEYS[key]] = bool(val)
        elif strict:
            raise KeyError(f"unknown settings key {key!r} in {path}")

    for req in ("fx", "fy", "cx", "cy"):
        if req not in cam_kwargs:
            raise KeyError(f"missing required camera key Camera.{req} in {path}")
    cam_kwargs.setdefault("width", width)
    cam_kwargs.setdefault("height", height)

    camera = CameraConfig(**cam_kwargs)
    orb = OrbConfig(**orb_kwargs)
    tracker = TrackerConfig(**trk_kwargs)
    fps = camera.fps or 30.0
    tracker = dataclasses.replace(tracker, max_frames=int(18 * fps / 30))
    return SystemConfig(camera=camera, orb=orb, tracker=tracker)
