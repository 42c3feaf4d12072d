import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_tracking_tpu.bow.database import (
    add_keyframe,
    empty_database,
    query,
)
from orb_slam_tracking_tpu.bow.vocabulary import (
    _bitwise_majority,
    build_vocabulary,
    transform,
)


def _noisy(rng, c, n, k=12):
    out = np.tile(c, (n, 1))
    for r in range(n):
        for b in rng.choice(256, k, replace=False):
            out[r, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return out


def test_bitwise_majority():
    a = np.array([[0xFF, 0, 0, 0, 0, 0, 0, 0]], np.uint32)
    b = np.array([[0xFF, 0, 0, 0, 0, 0, 0, 0]], np.uint32)
    c = np.array([[0x00, 0, 0, 0, 0, 0, 0, 0]], np.uint32)
    m = _bitwise_majority(np.concatenate([a, b, c]))
    assert m[0] == 0xFF  # 2/3 majority keeps the bits


def test_vocabulary_transform_clusters(rng):
    centers = rng.integers(0, 2**32, (20, 8), dtype=np.uint32)
    train = np.concatenate([_noisy(rng, c, 40) for c in centers])
    voc = build_vocabulary(train, k=5, depth=3, seed=0)
    assert voc.n_words == 125
    # two noisy views of the same cluster land on the same word most of the
    # time; different clusters rarely collide
    a = _noisy(rng, centers[0], 20)
    b = _noisy(rng, centers[0], 20)
    other = _noisy(rng, centers[7], 20)
    wa, _ = transform(voc, jnp.asarray(a), jnp.ones(20, bool))
    wb, _ = transform(voc, jnp.asarray(b), jnp.ones(20, bool))
    wo, _ = transform(voc, jnp.asarray(other), jnp.ones(20, bool))
    wa, wb, wo = map(np.asarray, (wa, wb, wo))
    assert (wa == wb).mean() > 0.8
    assert (wa == wo).mean() < 0.3


def test_database_retrieval(rng):
    centers = rng.integers(0, 2**32, (30, 8), dtype=np.uint32)
    train = np.concatenate([_noisy(rng, c, 40) for c in centers])
    voc = build_vocabulary(train, k=6, depth=3, seed=1)
    sceneA = np.concatenate([_noisy(rng, centers[i], 5) for i in range(10)])
    sceneA2 = np.concatenate([_noisy(rng, centers[i], 5) for i in range(10)])
    sceneB = np.concatenate([_noisy(rng, centers[i], 5) for i in range(10, 20)])
    _, bowA = transform(voc, jnp.asarray(sceneA), jnp.ones(len(sceneA), bool))
    _, bowA2 = transform(voc, jnp.asarray(sceneA2), jnp.ones(len(sceneA2), bool))
    _, bowB = transform(voc, jnp.asarray(sceneB), jnp.ones(len(sceneB), bool))
    db = empty_database(8, voc.n_words)
    db = add_keyframe(db, 0, bowA)
    db = add_keyframe(db, 1, bowB)
    sc = np.asarray(query(db, bowA2))
    assert sc[0] > sc[1] + 0.2
    assert np.isneginf(sc[2:]).all()  # empty slots masked


def test_bow_vector_normalized(rng):
    centers = rng.integers(0, 2**32, (10, 8), dtype=np.uint32)
    train = np.concatenate([_noisy(rng, c, 30) for c in centers])
    voc = build_vocabulary(train, k=4, depth=2, seed=2)
    desc = _noisy(rng, centers[0], 16)
    valid = np.ones(16, bool)
    valid[8:] = False  # half invalid: must not contribute
    _, bow = transform(voc, jnp.asarray(desc), jnp.asarray(valid))
    assert abs(float(jnp.sum(jnp.abs(bow))) - 1.0) < 1e-5


def test_scoring_family_properties(rng):
    from orb_slam_tracking_tpu.bow.database import SCORINGS, score_pairwise

    centers = rng.integers(0, 2**32, (20, 8), dtype=np.uint32)
    train = np.concatenate([_noisy(rng, c, 30) for c in centers])
    voc = build_vocabulary(train, k=5, depth=3, seed=3)
    sceneA = np.concatenate([_noisy(rng, centers[i], 5) for i in range(8)])
    sceneA2 = np.concatenate([_noisy(rng, centers[i], 5) for i in range(8)])
    sceneB = np.concatenate([_noisy(rng, centers[i], 5) for i in range(8, 16)])
    _, a = transform(voc, jnp.asarray(sceneA), jnp.ones(len(sceneA), bool))
    _, a2 = transform(voc, jnp.asarray(sceneA2), jnp.ones(len(sceneA2), bool))
    _, b = transform(voc, jnp.asarray(sceneB), jnp.ones(len(sceneB), bool))
    for name in SCORINGS:
        same = float(score_pairwise(a, a2, name))
        diff = float(score_pairwise(a, b, name))
        assert same > diff, name  # every scoring ranks the revisit higher
    # self-similarity fixed points (ScoringObject.cpp normalization):
    assert abs(float(score_pairwise(a, a, "l1")) - 1.0) < 1e-5
    assert abs(float(score_pairwise(a, a, "l2")) - 1.0) < 1e-5
    assert abs(float(score_pairwise(a, a, "chi2")) - 1.0) < 1e-5
    assert abs(float(score_pairwise(a, a, "kl")) - 0.0) < 1e-5
    assert abs(float(score_pairwise(a, a, "bhattacharyya")) - 1.0) < 1e-4


def test_query_scoring_dispatch(rng):
    centers = rng.integers(0, 2**32, (12, 8), dtype=np.uint32)
    train = np.concatenate([_noisy(rng, c, 30) for c in centers])
    voc = build_vocabulary(train, k=4, depth=3, seed=4)
    s1 = np.concatenate([_noisy(rng, centers[i], 5) for i in range(6)])
    s2 = np.concatenate([_noisy(rng, centers[i], 5) for i in range(6, 12)])
    _, b1 = transform(voc, jnp.asarray(s1), jnp.ones(len(s1), bool))
    _, b2 = transform(voc, jnp.asarray(s2), jnp.ones(len(s2), bool))
    db = add_keyframe(add_keyframe(empty_database(4, voc.n_words), 0, b1), 1, b2)
    for name in ("l1", "l2", "chi2", "kl", "bhattacharyya", "dot"):
        sc = np.asarray(query(db, b1, scoring=name))
        assert sc[0] > sc[1], name
        assert np.isneginf(sc[2:]).all()


def test_vocabulary_save_load_roundtrip(rng, tmp_path):
    from orb_slam_tracking_tpu.bow.vocabulary import (
        load_vocabulary,
        save_vocabulary,
    )

    centers = rng.integers(0, 2**32, (15, 8), dtype=np.uint32)
    train = np.concatenate([_noisy(rng, c, 25) for c in centers])
    voc = build_vocabulary(train, k=4, depth=3, seed=5)
    path = str(tmp_path / "vocab.npz")
    save_vocabulary(voc, path)
    voc2 = load_vocabulary(path)
    assert voc2.k == voc.k and voc2.depth == voc.depth
    for a, b in zip(voc.node_desc, voc2.node_desc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(voc.word_weight), np.asarray(voc2.word_weight)
    )
    # transforms agree exactly
    q = _noisy(rng, centers[0], 10)
    w1, b1 = transform(voc, jnp.asarray(q), np.ones(10, bool))
    w2, b2 = transform(voc2, jnp.asarray(q), np.ones(10, bool))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2))


def test_direct_index_nodes(rng):
    from orb_slam_tracking_tpu.bow.vocabulary import direct_index_nodes

    centers = rng.integers(0, 2**32, (10, 8), dtype=np.uint32)
    train = np.concatenate([_noisy(rng, c, 25) for c in centers])
    voc = build_vocabulary(train, k=3, depth=3, seed=6)
    words = jnp.asarray([0, 1, 2, 3, 8, 9, 26], jnp.int32)
    # levels_up=1: parent of word w is w // k
    np.testing.assert_array_equal(
        np.asarray(direct_index_nodes(voc, words, 1)),
        np.asarray(words) // 3,
    )
    # levels_up=depth: everything maps to the root
    assert (np.asarray(direct_index_nodes(voc, words, 3)) == 0).all()


def test_corpus_training_and_pretrained_ingestion(rng, tmp_path):
    """Multi-frame corpus training + the pretrained-artifact workflow
    (TemplatedVocabulary.h:107-140 create, :229-265 save/load): train from
    rendered frames, save, and have the Tracker load it via vocab_path
    instead of training its own."""
    from orb_slam_tracking_tpu.bow import (
        build_vocabulary_from_frames,
        save_vocabulary,
    )
    from orb_slam_tracking_tpu.config import (
        CameraConfig,
        OrbConfig,
        SystemConfig,
        TrackerConfig,
    )
    from orb_slam_tracking_tpu.slam.tracker import Tracker, TrackState
    from orb_slam_tracking_tpu.utils.synthetic import (
        CornerField,
        make_trajectory,
        render_frame,
    )

    cam = CameraConfig(fx=450.0, fy=450.0, cx=320.0, cy=240.0,
                       width=640, height=480)
    field = CornerField(rng, n=600)
    poses = make_trajectory(10, "strafe")
    frames = [render_frame(field, cam, R, t) for R, t in poses]

    voc = build_vocabulary_from_frames(
        frames[:4], OrbConfig(n_features=500), k=6, depth=3, seed=0
    )
    assert voc.n_words == 216
    path = str(tmp_path / "voc.npz")
    save_vocabulary(voc, path)

    cfg = SystemConfig(
        camera=cam,
        orb=OrbConfig(n_features=1000),
        tracker=TrackerConfig(max_map_points=2048, max_keyframes=16,
                              ba_window=8, vocab_path=path),
    )
    tr = Tracker(cfg)
    for i, f in enumerate(frames):
        tr.track(f, i / 30.0)
    assert tr.state == TrackState.WORKING
    # the tracker adopted the artifact, not a per-run training
    assert tr.vocab is not None and tr.vocab.n_words == 216
    assert tr.kf_db is not None and tr.kf_db.bow.shape[1] == 216
