"""DBoW2 text-format vocabulary interchange
(``TemplatedVocabulary.h:229-265`` loadFromTextFile/saveToTextFile).

The dense complete-tree Vocabulary must round-trip through the text
format and absorb DBoW2's RAGGED trees (nodes with fewer than k
children, leaves above the bottom level) with node-for-node descent
parity.
"""

import numpy as np
import pytest

from orb_slam_tracking_tpu.bow.vocabulary import (
    Vocabulary,
    build_vocabulary,
    load_orbvoc_text,
    load_vocabulary,
    save_orbvoc_text,
    transform,
)

import jax.numpy as jnp


def _rand_descs(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


def test_orbvoc_text_round_trip(rng, tmp_path):
    """save_orbvoc_text -> load_orbvoc_text reproduces words, weights and
    BoW vectors exactly (complete tree, the easy case)."""
    voc = build_vocabulary(_rand_descs(rng, 400), k=3, depth=3, seed=0)
    path = tmp_path / "voc.txt"
    save_orbvoc_text(voc, path)
    back = load_vocabulary(path)   # .txt dispatch
    assert back.k == voc.k and back.depth == voc.depth

    q = _rand_descs(rng, 64)
    valid = jnp.ones(64, bool)
    w1, b1 = transform(voc, jnp.asarray(q), valid)
    w2, b2 = transform(back, jnp.asarray(q), valid)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), atol=1e-6)
    for lvl in range(voc.depth):
        np.testing.assert_array_equal(
            np.asarray(voc.node_desc[lvl]), np.asarray(back.node_desc[lvl]))


def _desc_bytes(rng):
    return " ".join(str(int(b)) for b in rng.integers(0, 256, 32))


def test_orbvoc_ragged_tree(tmp_path):
    """A hand-crafted ragged DBoW2 file: k=2, L=2; root child A has ONE
    child (slot padded), root child B is a LEAF at level 1 (self-chain to
    the bottom). Descent must reach exactly the two real words."""
    # descriptors chosen so Hamming relationships are unambiguous
    zeros = " ".join(["0"] * 32)
    ones = " ".join(["255"] * 32)
    half = " ".join(["255"] * 16 + ["0"] * 16)
    lines = [
        "2 2 0 0",
        f"0 0 {zeros} 0",     # node 1 = root child A (all-zero)
        f"0 1 {ones} 2.5",    # node 2 = root child B: LEAF at level 1
        f"1 1 {half} 1.5",    # node 3 = A's only child: leaf (padded slot)
    ]
    p = tmp_path / "ragged.txt"
    p.write_text("\n".join(lines) + "\n")
    voc = load_orbvoc_text(p)
    assert voc.k == 2 and voc.depth == 2 and voc.n_words == 4

    # query near B (all-ones) -> B's chained word (dense leaf 1*2+0=2)
    # query near A's child (half) -> word 0 (dense leaf 0*2+0)
    q = np.zeros((2, 8), np.uint32)
    q[0] = np.frombuffer(bytes([255] * 32), np.uint32)
    q[1] = np.frombuffer(bytes([255] * 16 + [0] * 16), np.uint32)
    w, bow = transform(voc, jnp.asarray(q), jnp.ones(2, bool))
    w = np.asarray(w)
    assert w[0] == 2, w    # B chained: level-0 slot 1 -> level-1 slot 2
    assert w[1] == 0, w    # A -> its single real child at slot 0
    ww = np.asarray(voc.word_weight)
    assert ww[2] == pytest.approx(2.5)
    assert ww[0] == pytest.approx(1.5)
    # padded/unreachable leaves carry zero weight
    assert ww[1] == 0.0 and ww[3] == 0.0


def test_orbvoc_padded_slots_unreachable(rng, tmp_path):
    """Padding duplicates the first child, and argmin tie-breaking keeps
    every padded slot unreachable: no descent result may land in a
    zero-weight padded word when querying the node's own descriptors."""
    zeros = " ".join(["0"] * 32)
    ones = " ".join(["255"] * 32)
    lines = [
        "3 1 0 0",
        f"0 1 {zeros} 1.0",   # real child 0 (leaf)
        f"0 1 {ones} 2.0",    # real child 1 (leaf)
        # third slot padded with child 0's descriptor
    ]
    p = tmp_path / "pad.txt"
    p.write_text("\n".join(lines) + "\n")
    voc = load_orbvoc_text(p)
    q = _rand_descs(rng, 256)
    w, _ = transform(voc, jnp.asarray(q), jnp.ones(256, bool))
    assert set(np.asarray(w).tolist()) <= {0, 1}  # slot 2 never wins
