"""Bag-of-binary-words vocabulary: hierarchical k-medians over ORB
descriptors, batched tree descent, tf-idf weighting.

TPU-native replacement for the vendored DBoW2 vocabulary
(``Thirdparty/DBoW2/include/DBoW2/TemplatedVocabulary.h``): ``create``'s
hierarchical k-means with kmeans++ seeding (``:379,570-654``) becomes a
branching-factor-batched k-medians over packed uint32 descriptors (the
binary-descriptor centroid is the bitwise majority, exactly DBoW2's
``FORB::meanValue``, ``src/FORB.cpp:24-73``); the per-feature ``transform``
descent (``:1220-1310``) becomes a vectorized level-by-level argmin over
Hamming distances to the current node's children — all features descend in
lockstep, so each level is one [N, branching] Hamming block on the MXU
path.

The tree is stored as dense arrays (levels x nodes x children), so the
whole vocabulary is a pytree that jits and ships to device once.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hamming import hamming_matrix

__all__ = [
    "Vocabulary", "build_vocabulary", "transform", "save_vocabulary",
    "load_vocabulary", "direct_index_nodes", "load_orbvoc_text",
    "save_orbvoc_text",
]


class Vocabulary(NamedTuple):
    """Dense complete-tree vocabulary with branching factor k, depth L.

    node_desc[l]: [k^(l+1), 8] uint32 — centroids of level l (children of
    level l-1 nodes, contiguous blocks of k per parent).
    word_weight: [k^L] float32 — idf weights of the leaves (words).
    """

    node_desc: tuple      # length L of [k^(l+1), 8] arrays
    word_weight: jnp.ndarray
    k: int
    depth: int

    @property
    def n_words(self) -> int:
        return self.k ** self.depth


def _bitwise_majority(descs: np.ndarray) -> np.ndarray:
    """Majority vote per bit over [N, 8] uint32 (FORB::meanValue)."""
    if len(descs) == 0:
        return np.zeros(8, np.uint32)
    bits = np.unpackbits(descs.view(np.uint8), axis=1, bitorder="little")
    maj = (bits.sum(0) * 2 >= len(descs)).astype(np.uint8)
    return np.packbits(maj, bitorder="little").view(np.uint32)


# 16-bit popcount lookup table: Hamming distance between [*, 8]-uint32
# descriptor rows is 16 LUT gathers on their uint16 halves — ~8x less
# memory traffic than the unpackbits/compare formulation it replaced
# (load-bearing at 1M-word training scale: the trainer calls this
# O(levels x iters) times over the full multi-million-descriptor corpus).
_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)],
                  dtype=np.uint8)


def _hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N, 8] x [M, 8] -> [N, M] int popcount distances (host-side)."""
    a16 = np.ascontiguousarray(a).view(np.uint16)   # [N, 16]
    b16 = np.ascontiguousarray(b).view(np.uint16)   # [M, 16]
    x = np.bitwise_xor(a16[:, None, :], b16[None, :, :])
    return _POP16[x].sum(-1, dtype=np.int32)


def _kmedians(rng, descs: np.ndarray, k: int, iters: int = 8) -> np.ndarray:
    """Binary k-medians with kmeans++-style seeding; returns [k, 8]."""
    n = len(descs)
    if n == 0:
        return np.zeros((k, 8), np.uint32)
    if n <= k:
        out = np.zeros((k, 8), np.uint32)
        out[:n] = descs
        out[n:] = descs[rng.integers(0, n, k - n)]
        return out
    # kmeans++ seeding on Hamming distance; d2 carries the running
    # min-distance-to-chosen-centers so each new center costs ONE
    # [n, 1] distance column, not a full recomputed [n, len(centers)]
    # matrix (the recompute made seeding O(k^2 n) — the dominant cost
    # of the 100k-word round-4 train).
    centers = [descs[rng.integers(n)]]
    d2 = _hamming_np(descs, centers[0][None]).ravel().astype(np.float64)
    for _ in range(k - 1):
        p = d2 / max(d2.sum(), 1e-9)
        centers.append(descs[rng.choice(n, p=p)])
        d_new = _hamming_np(descs, centers[-1][None]).ravel()
        np.minimum(d2, d_new, out=d2)
    C = np.stack(centers)
    for _ in range(iters):
        assign = _hamming_np(descs, C).argmin(1)
        newC = C.copy()
        for j in range(k):
            sel = descs[assign == j]
            if len(sel):
                newC[j] = _bitwise_majority(sel)
        if (newC == C).all():
            break
        C = newC
    return C


def build_vocabulary(descs: np.ndarray, k: int = 10, depth: int = 4,
                     seed: int = 0, weight_by_idf: bool = True) -> Vocabulary:
    """Train a (k, L) vocabulary from [N, 8]-uint32 training descriptors.

    Host-side training (one-off artifact creation, like DBoW2's offline
    ``create``); the resulting tree is device-resident arrays.
    """
    rng = np.random.default_rng(seed)
    descs = np.asarray(descs, np.uint32)
    levels = []
    # assignment of each training descriptor to a node of the current level
    assign = np.zeros(len(descs), np.int64)
    n_nodes = 1
    for lvl in range(depth):
        centers = np.zeros((n_nodes * k, 8), np.uint32)
        new_assign = np.zeros_like(assign)
        # one sort per level instead of an O(n) `assign == node` scan per
        # node (100k scans of a multi-million-element array at the leaf
        # level of a 1M-word k=10 L=6 tree)
        order = np.argsort(assign, kind="stable")
        bounds = np.searchsorted(assign[order], np.arange(n_nodes + 1))
        for node in range(n_nodes):
            sel = order[bounds[node]:bounds[node + 1]]
            C = _kmedians(rng, descs[sel], k)
            centers[node * k : (node + 1) * k] = C
            if len(sel):
                sub = _hamming_np(descs[sel], C).argmin(1)
                new_assign[sel] = node * k + sub
        levels.append(jnp.asarray(centers))
        assign = new_assign
        n_nodes *= k
    # idf word weights (TemplatedVocabulary TF_IDF convention: each training
    # descriptor counts as one "document feature")
    n_words = n_nodes
    counts = np.bincount(assign, minlength=n_words).astype(np.float64)
    if weight_by_idf:
        n_docs = max(len(descs), 1)
        w = np.log(n_docs / np.maximum(counts, 1.0))
        w[counts == 0] = 0.0
    else:
        w = np.ones(n_words)
    return Vocabulary(
        node_desc=tuple(levels),
        word_weight=jnp.asarray(w.astype(np.float32)),
        k=k,
        depth=depth,
    )


def build_vocabulary_from_frames(images, orb_cfg, k: int = 10,
                                 depth: int = 4, seed: int = 0,
                                 max_descriptors: int = 200_000) -> Vocabulary:
    """Train a vocabulary from a CORPUS of frames (the reference workflow:
    pretrained ORB vocabularies are built offline from many images, then
    shipped as an artifact — ``TemplatedVocabulary.h:107-140`` ``create``
    takes per-image feature lists).

    Extraction is one jitted program reused across frames; descriptors are
    pooled (subsampled to ``max_descriptors``) and clustered host-side.
    """
    import jax as _jax

    from ..ops.extractor import orb_extract

    ex = _jax.jit(lambda im: orb_extract(im, orb_cfg))
    pool = []
    for im in images:
        kps = ex(jnp.asarray(im, jnp.float32))
        d = np.asarray(kps.desc)[np.asarray(kps.valid)]
        pool.append(d)
    descs = np.concatenate(pool, axis=0)
    if len(descs) > max_descriptors:
        rng = np.random.default_rng(seed)
        descs = descs[rng.choice(len(descs), max_descriptors, replace=False)]
    return build_vocabulary(descs, k=k, depth=depth, seed=seed)


@partial(jax.jit, static_argnames=("voc_k", "voc_depth"))
def _descend(node_desc, word_weight, desc, valid, voc_k: int, voc_depth: int):
    n = desc.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    for lvl in range(voc_depth):
        children = node_desc[lvl]  # [k^(l+1), 8]
        # gather each feature's k candidate children: indices node*k + j
        idx = node[:, None] * voc_k + jnp.arange(voc_k, dtype=jnp.int32)[None, :]
        cand = children[idx]  # [N, k, 8]
        x = desc[:, None, :] ^ cand
        d = jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)
        node = idx[jnp.arange(n), jnp.argmin(d, axis=1)]
    word = node
    w = jnp.where(valid, word_weight[word], 0.0)
    return word, w


def transform(voc: Vocabulary, desc: jnp.ndarray, valid: jnp.ndarray):
    """Descend all descriptors through the tree.

    Returns (word [N] int32, bow [n_words] float32 L1-normalized tf-idf
    vector) — the dense-array analog of DBoW2's ``BowVector``
    (``BowVector.h:56``, ``normalize`` ``:90``).
    """
    word, w = _descend(
        voc.node_desc, voc.word_weight, desc, valid, voc.k, voc.depth
    )
    bow = jnp.zeros((voc.n_words,), jnp.float32).at[word].add(w)
    norm = jnp.sum(jnp.abs(bow))
    bow = bow / jnp.where(norm > 0, norm, 1.0)
    return word, bow


def direct_index_nodes(voc: Vocabulary, word, levels_up: int = 2):
    """Direct-index node id of each word, ``levels_up`` levels above the
    leaves — the dense-array analog of DBoW2's ``FeatureVector`` node key
    (``FeatureVector.h:21``, populated by ``transform``'s ``levelsup``
    argument, ``TemplatedVocabulary.h:1220-1310``). The tree is complete,
    so the ancestor id is an integer divide."""
    lu = min(max(levels_up, 0), voc.depth)
    return word // (voc.k ** lu)


def save_vocabulary(voc: Vocabulary, path) -> None:
    """Persist as npz — the artifact role of DBoW2's vocabulary files
    (``TemplatedVocabulary.h:229-265`` save/load incl. the text format
    that ships pretrained ORB vocabularies)."""
    arrays = {
        f"level_{i}": np.asarray(d) for i, d in enumerate(voc.node_desc)
    }
    np.savez_compressed(
        path,
        word_weight=np.asarray(voc.word_weight),
        k=np.int64(voc.k),
        depth=np.int64(voc.depth),
        **arrays,
    )


def load_orbvoc_text(path) -> Vocabulary:
    """Import a DBoW2 text-format vocabulary (the file format that ships
    pretrained ORB vocabularies like ORBvoc.txt —
    ``TemplatedVocabulary.h:229-265`` ``loadFromTextFile``):

      line 0:  k L scoring weighting
      line i:  parent_id is_leaf b0 .. b31 weight     (node ids 1.., root 0)

    DBoW2 trees are RAGGED — nodes may have fewer than k children and
    leaves may sit above the bottom level. The dense complete-tree layout
    absorbs this exactly:

    - a node with fewer than k children has its remaining child slots
      filled with COPIES of its first child's descriptor. Descent argmin
      breaks ties toward the lowest index, so a padded copy can never win
      against the real child it duplicates — padded subtrees are
      unreachable and their leaves carry weight 0;
    - a leaf above the bottom level is extended by a single-child chain of
      its own descriptor down to the bottom, where it receives the leaf's
      word weight (descent follows the chain deterministically).

    Words therefore map 1:1 onto reachable dense leaves; BoW vectors and
    scores computed through :func:`transform` match DBoW2's descent on the
    original ragged tree node-for-node.
    """
    with open(path) as f:
        header = f.readline().split()
        if len(header) < 2:
            raise ValueError(f"{path}: bad ORBvoc header {header!r}")
        k, depth = int(header[0]), int(header[1])
        body = np.loadtxt(f, dtype=np.float64, ndmin=2)
    if body.shape[1] != 35:
        raise ValueError(
            f"{path}: expected 35 columns (parent is_leaf 32-byte-desc "
            f"weight), got {body.shape[1]}")
    n = body.shape[0]
    parent = body[:, 0].astype(np.int64)          # 0 = root; ids are 1..n
    weight = body[:, 34].astype(np.float32)
    descs = np.ascontiguousarray(
        body[:, 2:34].astype(np.uint8)).view(np.uint32)  # [n, 8]

    # children of each node id (0..n), preserving file order — DBoW2
    # appends children in read order
    order = np.argsort(parent, kind="stable")
    kids: list = [[] for _ in range(n + 1)]
    for row in order:
        kids[parent[row]].append(int(row) + 1)    # node id = row + 1

    levels = [np.zeros((k ** (l + 1), 8), np.uint32) for l in range(depth)]
    word_weight = np.zeros(k ** depth, np.float32)

    # stack entries: (node_id, level of the node's CHILDREN, dense index
    # of the node at its level). chain_id < 0 marks a self-chain
    # continuation carrying (descriptor row, leaf weight).
    stack = [(0, 0, 0)]
    while stack:
        nid, lvl, didx = stack.pop()
        ch = kids[nid]
        if not ch:
            # leaf above the bottom: chain its own descriptor down
            d = descs[nid - 1]
            w = weight[nid - 1]
            for l2 in range(lvl, depth):
                didx = didx * k
                levels[l2][didx] = d
            word_weight[didx] = w
            continue
        first_desc = descs[ch[0] - 1]
        for j in range(k):
            cid = ch[j] if j < len(ch) else None
            slot = didx * k + j
            levels[lvl][slot] = (descs[cid - 1] if cid is not None
                                 else first_desc)
            if cid is None:
                continue  # padded copy: unreachable, weight stays 0
            if lvl + 1 == depth:
                word_weight[slot] = weight[cid - 1]
            else:
                stack.append((cid, lvl + 1, slot))
    return Vocabulary(
        node_desc=tuple(jnp.asarray(d) for d in levels),
        word_weight=jnp.asarray(word_weight),
        k=k,
        depth=depth,
    )


def save_orbvoc_text(voc: Vocabulary, path) -> None:
    """Export in DBoW2's text format (``TemplatedVocabulary.h`` save
    counterpart), so vocabularies trained here load into stock DBoW2 /
    ORB-SLAM builds. The dense tree is complete, so the export is a
    breadth-first walk; internal nodes carry weight 0, leaves their idf
    weight. Scoring/weighting header fields are L1_NORM / TF_IDF (0 0),
    DBoW2's defaults for ORB vocabularies."""
    k, depth = voc.k, voc.depth
    lines = [f"{k} {depth} 0 0"]
    ww = np.asarray(voc.word_weight)
    for lvl in range(depth):
        descs = np.asarray(voc.node_desc[lvl]).view(np.uint8)
        is_leaf = 1 if lvl + 1 == depth else 0
        base_parent = ((k ** lvl - 1) // (k - 1)) if k > 1 else lvl
        for idx in range(descs.shape[0]):
            pid = 0 if lvl == 0 else base_parent + idx // k
            w = float(ww[idx]) if is_leaf else 0.0
            byte_str = " ".join(str(int(b)) for b in descs[idx])
            lines.append(f"{pid} {is_leaf} {byte_str} {w:.6f}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def load_vocabulary(path) -> Vocabulary:
    """Load a vocabulary artifact: DBoW2 text format (``.txt``) or this
    package's npz format."""
    if str(path).endswith(".txt"):
        return load_orbvoc_text(path)
    with np.load(path) as z:
        k = int(z["k"])
        depth = int(z["depth"])
        levels = tuple(
            jnp.asarray(z[f"level_{i}"].astype(np.uint32)) for i in range(depth)
        )
        for lvl, d in enumerate(levels):
            if d.shape != (k ** (lvl + 1), 8):
                raise ValueError(
                    f"vocabulary level {lvl} has shape {d.shape}, "
                    f"expected {(k ** (lvl + 1), 8)}"
                )
        return Vocabulary(
            node_desc=levels,
            word_weight=jnp.asarray(z["word_weight"].astype(np.float32)),
            k=k,
            depth=depth,
        )
