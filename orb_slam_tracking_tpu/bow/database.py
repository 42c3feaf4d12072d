"""Keyframe recognition database: dense BoW scoring for relocalization.

TPU-native replacement for DBoW2's inverted-file database
(``Thirdparty/DBoW2/include/DBoW2/TemplatedDatabase.h:35``, ``add``/
``query``) and its full scoring family (``ScoringObject.h:73-88``,
formulas from ``src/ScoringObject.cpp``). Sparse inverted files are
pointer-chasing machinery; with dense [n_words] BoW vectors a query
against every stored keyframe is one matvec on the MXU — the database is
simply a [Kmax, n_words] matrix with a validity mask.

Vectors are stored L1-normalized (DBoW2's convention for L1/ChiSquare/
KL/Bhattacharyya scorings); the L2 scoring renormalizes internally. The
default L1 scoring matches DBoW2's default for ORB vocabularies:
  s(v, w) = 1 - 0.5 * |v/|v|_1 - w/|w|_1|_1.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

import numpy as np

# float32 matmul precision on TPU (the default truncates to bfloat16
# - see optim/ba.py:_obs_residuals).
_HI = jax.lax.Precision.HIGHEST

__all__ = [
    "KeyframeDatabase", "empty_database", "add_keyframe", "query",
    "SCORINGS", "score_pairwise",
]

# log(DBL_EPSILON), the KL fallback for absent database words
# (ScoringObject.cpp:18)
_LOG_EPS = float(np.log(np.finfo(np.float64).eps))


def _score_l1(q, db):
    # 1 - 0.5 ||v - w||_1 (Nister 2006; ScoringObject.cpp L1Scoring)
    return 1.0 - 0.5 * jnp.sum(jnp.abs(db - q[None, :]), axis=-1)


def _score_l2(q, db):
    # 1 - sqrt(1 - <v, w>) on L2-normalized vectors, clamped at rounding
    # errors (ScoringObject.cpp L2Scoring)
    qn = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    dn = db / jnp.maximum(
        jnp.linalg.norm(db, axis=-1, keepdims=True), 1e-12
    )
    dot = jnp.matmul(dn, qn, precision=_HI)
    return jnp.where(dot >= 1.0, 1.0, 1.0 - jnp.sqrt(jnp.maximum(1.0 - dot, 0.0)))


def _score_chi2(q, db):
    # 2 * sum v*w/(v+w) (ScoringObject.cpp ChiSquareScoring: the
    # (v-w)^2/(v+w) expansion with constants folded)
    s = db + q[None, :]
    return 2.0 * jnp.sum(
        jnp.where(s != 0.0, db * q[None, :] / jnp.where(s == 0.0, 1.0, s), 0.0),
        axis=-1,
    )


def _score_kl(q, db):
    # KL(q || w): sum over q's support of v*log(v/w), with absent database
    # words contributing v*(log v - LOG_EPS) (ScoringObject.cpp KLScoring).
    # Lower = more similar; negated so that argmax ranks candidates like
    # the other scorings.
    v = q[None, :]
    logw = jnp.where(db > 0, jnp.log(jnp.where(db > 0, db, 1.0)), _LOG_EPS)
    kl = jnp.sum(
        jnp.where(v > 0, v * (jnp.log(jnp.where(v > 0, v, 1.0)) - logw), 0.0),
        axis=-1,
    )
    return -kl


def _score_bhattacharyya(q, db):
    # sum sqrt(v*w) (ScoringObject.cpp BhattacharyyaScoring)
    return jnp.sum(jnp.sqrt(db * q[None, :]), axis=-1)


def _score_dot(q, db):
    # sum v*w (ScoringObject.cpp DotProductScoring; DBoW2 applies it to
    # unnormalized vectors — here vectors are stored L1-normalized, which
    # rescales scores but not rankings)
    return jnp.matmul(db, q, precision=_HI)


SCORINGS = {
    "l1": _score_l1,
    "l2": _score_l2,
    "chi2": _score_chi2,
    "kl": _score_kl,
    "bhattacharyya": _score_bhattacharyya,
    "dot": _score_dot,
}


def score_pairwise(v: jnp.ndarray, w: jnp.ndarray, scoring: str = "l1"):
    """Score two single BoW vectors (DBoW2 ``Vocabulary::score``)."""
    return SCORINGS[scoring](v, w[None, :])[0]


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


def remove_keyframe(db: KeyframeDatabase, slot) -> KeyframeDatabase:
    """Drop a culled keyframe from the index (TemplatedDatabase erase)."""
    return KeyframeDatabase(bow=db.bow, valid=db.valid.at[slot].set(False))


@partial(jax.jit, static_argnames=("scoring",))
def query(db: KeyframeDatabase, bow_vec: jnp.ndarray, scoring: str = "l1"):
    """Similarity of the query against every stored keyframe.

    Returns scores [Kmax] (invalid slots -inf). Top-k/candidate gating is
    the caller's policy (the reference's relocalization would take the
    best-scoring keyframes and verify geometrically).
    """
    score = SCORINGS[scoring](bow_vec, db.bow)
    return jnp.where(db.valid, score, -jnp.inf)
