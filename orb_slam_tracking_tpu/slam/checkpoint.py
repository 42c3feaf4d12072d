"""Checkpoint / resume for the tracker and map.

The reference persists nothing beyond a text dump of triangulated points
(``demo_initialization.cpp:187-191``) and DBoW2's vocabulary files
(SURVEY.md §5.4); a production engine needs restartable state. The map,
trajectory, pose, and vocabulary are flat arrays, so a single compressed
``.npz`` round-trips everything; the format is versioned for forward
compatibility. (For multi-host sharded deployments the same pytree can be
handed to orbax; this file-local format keeps single-host checkpoints
dependency-free.)
"""

from __future__ import annotations

import numpy as np

from .map import SlamMap
from .tracker import TrackState, Tracker

__all__ = ["save_tracker", "load_tracker"]

_FORMAT_VERSION = 4  # v4: per-point viewing statistics (normal/dmin/dmax)


def save_tracker(tracker: Tracker, path: str) -> None:
    """Serialize map, pose, velocity, trajectory, bookkeeping, and — when
    BoW is enabled — the vocabulary tree and keyframe database (without
    them a resumed tracker silently loses relocalization)."""
    m = tracker.map
    data = {f"map_{k}": np.asarray(v) for k, v in m._asdict().items()}
    if tracker.vocab is not None:
        v = tracker.vocab
        data.update(
            vocab_k=np.int64(v.k),
            vocab_depth=np.int64(v.depth),
            vocab_word_weight=np.asarray(v.word_weight),
            **{f"vocab_level_{i}": np.asarray(d)
               for i, d in enumerate(v.node_desc)},
        )
    if tracker.kf_db is not None:
        data.update(
            kfdb_bow=np.asarray(tracker.kf_db.bow),
            kfdb_valid=np.asarray(tracker.kf_db.valid),
        )
    data.update(
        version=np.int32(_FORMAT_VERSION),
        state=np.int32(tracker.state),
        frame_id=np.int32(tracker.frame_id),
        R=tracker.R,
        t=tracker.t,
        vel_R=tracker.vel_R,
        vel_t=tracker.vel_t,
        have_velocity=np.bool_(tracker.have_velocity),
        frames_since_kf=np.int32(tracker.frames_since_kf),
        n_kf=np.int32(tracker.n_kf),
        kf_insert_count=np.int32(tracker.kf_insert_count),
        last_kf_slot=np.int32(tracker.last_kf_slot),
        kf_ref_inliers=np.int32(tracker.kf_ref_inliers),
        traj_frame_id=np.asarray([f for f, *_ in tracker.trajectory], np.int32),
        traj_ts=np.asarray([ts for _, ts, *_ in tracker.trajectory], np.float64),
        traj_R=np.asarray([R for _, _, R, _ in tracker.trajectory], np.float32).reshape(-1, 3, 3),
        traj_t=np.asarray([t for *_, t in tracker.trajectory], np.float32).reshape(-1, 3),
    )
    np.savez_compressed(path, **data)


def load_tracker(tracker: Tracker, path: str) -> Tracker:
    """Restore state saved by ``save_tracker`` into a fresh Tracker built
    with the same SystemConfig. Returns the tracker (mutated in place)."""
    import jax.numpy as jnp

    z = np.load(path, allow_pickle=False)
    version = int(z["version"])
    if version != _FORMAT_VERSION:
        # v1/v2 predate the lifecycle map layout (keyframe snapshots,
        # recycled slots); v3 lacks the per-point viewing statistics —
        # neither can be mapped onto the current SlamMap
        raise ValueError(f"unsupported checkpoint version {version}")
    map_fields = {
        k[len("map_"):]: jnp.asarray(z[k]) for k in z.files if k.startswith("map_")
    }
    tracker.map = SlamMap(**map_fields)
    tracker.state = int(z["state"])
    tracker.frame_id = int(z["frame_id"])
    tracker.R = z["R"]
    tracker.t = z["t"]
    tracker.vel_R = z["vel_R"]
    tracker.vel_t = z["vel_t"]
    tracker.have_velocity = bool(z["have_velocity"])
    tracker.frames_since_kf = int(z["frames_since_kf"])
    tracker.n_kf = int(z["n_kf"])
    tracker.kf_insert_count = int(z["kf_insert_count"])
    tracker.last_kf_slot = int(z["last_kf_slot"])
    tracker.kf_ref_inliers = int(z["kf_ref_inliers"])
    tracker.trajectory = [
        (int(f), float(ts), R, t)
        for f, ts, R, t in zip(z["traj_frame_id"], z["traj_ts"], z["traj_R"], z["traj_t"])
    ]
    # BoW state (format v2; older checkpoints lose relocalization indexing
    # and the tracker falls back to map-wide matching)
    tracker.vocab = None
    tracker.kf_db = None
    if "vocab_k" in z.files:
        from ..bow.vocabulary import Vocabulary

        depth = int(z["vocab_depth"])
        tracker.vocab = Vocabulary(
            node_desc=tuple(
                jnp.asarray(z[f"vocab_level_{i}"].astype(np.uint32))
                for i in range(depth)
            ),
            word_weight=jnp.asarray(z["vocab_word_weight"].astype(np.float32)),
            k=int(z["vocab_k"]),
            depth=depth,
        )
    if "kfdb_bow" in z.files:
        from ..bow.database import KeyframeDatabase

        tracker.kf_db = KeyframeDatabase(
            bow=jnp.asarray(z["kfdb_bow"].astype(np.float32)),
            valid=jnp.asarray(z["kfdb_valid"].astype(bool)),
        )
    if tracker.state in (TrackState.INITIALIZING,):
        # reference frame snapshot is not persisted; restart seeding
        tracker.state = TrackState.NOT_INITIALIZED
        tracker.ref = None
    return tracker
