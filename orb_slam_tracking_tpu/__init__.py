"""orb_slam_tracking_tpu — a TPU-native monocular SLAM tracking engine.

Brand-new JAX/XLA/Pallas framework with the capabilities of the reference
C++ codebase ``zeal-up/ORB_SLAM_Tracking`` (an educational extraction of the
ORB-SLAM tracking thread), re-designed TPU-first:

- ORB extraction (FAST pyramid + spatially-uniform selection + rBRIEF) as
  batched fixed-shape array programs with Pallas kernels on the hot paths.
- Hamming descriptor matching as a blocked XOR/popcount + MXU bit-matmul.
- Two-view initialization: batched H/F RANSAC, model selection,
  decomposition, triangulation and cheirality vetting in one jitted program.
- Pose-only Gauss-Newton/LM and Schur-complement bundle adjustment
  (single-chip and sharded across a device mesh with XLA collectives).
- A functional tracker state machine over fixed-capacity map pytrees.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    CameraConfig,
    InitConfig,
    MatcherConfig,
    OrbConfig,
    SystemConfig,
    TrackerConfig,
    load_system_config,
)
