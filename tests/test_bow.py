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
