"""Keyframe recognition database: dense BoW scoring for relocalization.

TPU-native replacement for DBoW2's inverted-file database
(``Thirdparty/DBoW2/include/DBoW2/TemplatedDatabase.h:35``, ``add``/
``query``) and its scoring family (``ScoringObject.h:73-88``). Sparse
inverted files are pointer-chasing machinery; with dense [n_words] BoW
vectors a query against every stored keyframe is one matvec on the MXU —
the database is simply a [Kmax, n_words] matrix with a validity mask.

L1 scoring matches DBoW2's default for ORB vocabularies:
  s(v, w) = 1 - 0.5 * |v/|v| - w/|w||_1
(vectors are stored L1-normalized, so the score is
``1 - 0.5 * sum |v - w|``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["KeyframeDatabase", "empty_database", "add_keyframe", "query"]


class KeyframeDatabase(NamedTuple):
    bow: jnp.ndarray     # [Kmax, n_words] float32, L1-normalized rows
    valid: jnp.ndarray   # [Kmax] bool


def empty_database(max_keyframes: int, n_words: int) -> KeyframeDatabase:
    return KeyframeDatabase(
        bow=jnp.zeros((max_keyframes, n_words), jnp.float32),
        valid=jnp.zeros((max_keyframes,), bool),
    )


def add_keyframe(db: KeyframeDatabase, slot, bow_vec: jnp.ndarray) -> KeyframeDatabase:
    return KeyframeDatabase(
        bow=db.bow.at[slot].set(bow_vec),
        valid=db.valid.at[slot].set(True),
    )


@jax.jit
def query(db: KeyframeDatabase, bow_vec: jnp.ndarray):
    """L1 similarity of the query against every stored keyframe.

    Returns scores [Kmax] (invalid slots -inf). Top-k/candidate gating is
    the caller's policy (the reference's relocalization would take the
    best-scoring keyframes and verify geometrically).
    """
    diff = jnp.sum(jnp.abs(db.bow - bow_vec[None, :]), axis=-1)
    score = 1.0 - 0.5 * diff
    return jnp.where(db.valid, score, -jnp.inf)
