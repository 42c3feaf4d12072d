import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_tracking_tpu.config import CameraConfig, MatcherConfig, OrbConfig
from orb_slam_tracking_tpu.ops.hamming import (
    hamming_matrix,
    hamming_matrix_xor,
    popcount_rows,
    unpack_bits,
)
from orb_slam_tracking_tpu.ops.matcher import compact_matches, search_for_initialization

CAM = CameraConfig(
    fx=609.2855, fy=609.3422, cx=351.4274, cy=237.7324,
    k1=-0.3492, k2=0.1363, width=752, height=480,
)


def _rand_desc(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


def test_hamming_against_numpy(rng):
    d1 = _rand_desc(rng, 33)
    d2 = _rand_desc(rng, 47)
    D = np.asarray(hamming_matrix(jnp.asarray(d1), jnp.asarray(d2)))
    Dx = np.asarray(hamming_matrix_xor(jnp.asarray(d1), jnp.asarray(d2)))
    # numpy ground truth
    b1 = np.unpackbits(d1.view(np.uint8), axis=1)
    b2 = np.unpackbits(d2.view(np.uint8), axis=1)
    Dn = (b1[:, None, :] != b2[None, :, :]).sum(-1)
    np.testing.assert_array_equal(D, Dn)
    np.testing.assert_array_equal(Dx, Dn)


def test_popcount_and_unpack(rng):
    d = _rand_desc(rng, 16)
    p = np.asarray(popcount_rows(jnp.asarray(d)))
    np.testing.assert_array_equal(p, np.unpackbits(d.view(np.uint8), axis=1).sum(1))
    b = np.asarray(unpack_bits(jnp.asarray(d)))
    assert b.shape == (16, 256)
    np.testing.assert_array_equal(b.sum(1), p)


def _flip_bits(rng, desc, k):
    """flip k random bits in each descriptor row"""
    out = desc.copy()
    for r in range(out.shape[0]):
        for b in rng.choice(256, size=k, replace=False):
            out[r, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return out


def _match(desc1, xy1, desc2, xy2, cfg=None, ang1=None, ang2=None):
    n1, n2 = desc1.shape[0], desc2.shape[0]
    z1 = np.zeros(n1, np.int32)
    z2 = np.zeros(n2, np.int32)
    a1 = np.zeros(n1, np.float32) if ang1 is None else ang1
    a2 = np.zeros(n2, np.float32) if ang2 is None else ang2
    return search_for_initialization(
        jnp.asarray(desc1), jnp.asarray(xy1), jnp.asarray(z1), jnp.asarray(a1),
        jnp.ones(n1, bool),
        jnp.asarray(desc2), jnp.asarray(xy2), jnp.asarray(z2), jnp.asarray(a2),
        jnp.ones(n2, bool),
        cfg or MatcherConfig(),
    )


def test_synthetic_identity_matching(rng):
    n = 64
    d1 = _rand_desc(rng, n)
    d2 = _flip_bits(rng, d1, 10)  # ~10-bit noise, well under TH_LOW=50
    xy = rng.uniform(100, 400, (n, 2)).astype(np.float32)
    perm = rng.permutation(n)
    res = _match(d1, xy, d2[perm], xy[perm] + rng.normal(0, 3, (n, 2)).astype(np.float32))
    m = np.asarray(res.matches12)
    # random 256-bit descriptors are ~128 apart; 10-bit noise keeps the true
    # match unambiguous -> near-perfect identity recovery
    assert (m >= 0).sum() >= n - 2
    good = m >= 0
    # matched j must satisfy perm[j] == i, i.e. j = inv_perm[i]
    inv_perm = np.argsort(perm)
    np.testing.assert_array_equal(m[good], inv_perm[good])


def test_mutual_uniqueness(rng):
    # two F1 kps share the same nearest F2 kp; only the closer one keeps it
    d_target = _rand_desc(rng, 1)
    d1 = np.concatenate([_flip_bits(rng, d_target, 5), _flip_bits(rng, d_target, 15)])
    xy1 = np.array([[100.0, 100.0], [120.0, 100.0]], np.float32)
    far = _rand_desc(rng, 1)
    d2 = np.concatenate([d_target, far])
    xy2 = np.array([[110.0, 100.0], [500.0, 400.0]], np.float32)
    res = _match(d1, xy1, d2, xy2)
    m = np.asarray(res.matches12)
    assert m[0] == 0 and m[1] == -1


def test_window_gating(rng):
    d = _rand_desc(rng, 1)
    d1 = d
    d2 = _flip_bits(rng, d, 3)
    res = _match(d1, np.array([[100.0, 100.0]], np.float32),
                 d2, np.array([[250.0, 100.0]], np.float32))  # 150 px > window 100
    assert int(res.n_matches) == 0
    res = _match(d1, np.array([[100.0, 100.0]], np.float32),
                 d2, np.array([[180.0, 100.0]], np.float32))
    assert int(res.n_matches) == 1


def test_orientation_histogram_rejects_outliers(rng):
    n = 40
    d1 = _rand_desc(rng, n)
    d2 = _flip_bits(rng, d1, 5)
    xy = rng.uniform(150, 350, (n, 2)).astype(np.float32)
    ang1 = np.full(n, 10.0, np.float32)
    ang2 = np.full(n, 22.0, np.float32)  # coherent 12-deg rotation
    ang2[:3] = 200.0  # 3 outliers with wild rotation
    res = _match(d1, xy, d2, xy, ang1=ang1, ang2=ang2)
    m = np.asarray(res.matches12)
    assert (m[3:] >= 0).all()
    assert (m[:3] == -1).all()
    assert int(res.n_reject_orientation) == 3


def test_compact_matches():
    matches = jnp.asarray(np.array([-1, 5, -1, 2, 7, -1], np.int32))
    pairs, valid = compact_matches(matches, 4)
    p = np.asarray(pairs)[np.asarray(valid)]
    assert p.tolist() == [[1, 5], [3, 2], [4, 7]]


def test_reference_pair_matching(init_images):
    from orb_slam_tracking_tpu.geometry import camera
    from orb_slam_tracking_tpu.ops import orb_extract

    ocfg = OrbConfig(n_features=2000, max_keypoints=2048)
    k1 = orb_extract(jnp.asarray(init_images[0]), ocfg)
    k2 = orb_extract(jnp.asarray(init_images[1]), ocfg)
    un1 = camera.undistort_pixels(CAM, k1.xy)
    un2 = camera.undistort_pixels(CAM, k2.xy)
    res = search_for_initialization(
        k1.desc, un1, k1.octave, k1.angle_deg, k1.valid,
        k2.desc, un2, k2.octave, k2.angle_deg, k2.valid,
        MatcherConfig(),
    )
    n = int(res.n_matches)
    # the reference's init gate (tracking.cpp:105)
    assert n >= 100
    # displacement field must be coherent (rigid camera motion)
    m = np.asarray(res.matches12)
    mm = m >= 0
    p1 = np.asarray(un1)[mm]
    p2 = np.asarray(un2)[m[mm]]
    disp = p2 - p1
    med = np.median(disp, axis=0)
    mad = np.median(np.abs(disp - med), axis=0)
    assert (mad < 10).all()


def test_bow_node_restriction(rng):
    """match_descriptors_bow only pairs features under the same
    direct-index node, and the ratio test is confined to that node."""
    from orb_slam_tracking_tpu.ops.matcher import (
        match_descriptors, match_descriptors_bow)

    d1 = _rand_desc(rng, 40)
    # d2: exact copies of d1 (perfect matches) plus decoys
    d2 = np.concatenate([d1, _rand_desc(rng, 24)], axis=0)
    v1 = np.ones(40, bool)
    v2 = np.ones(64, bool)
    # half the true pairs share a node, half are split across nodes
    node1 = np.arange(40, dtype=np.int32) % 7
    node2 = np.concatenate([node1, np.full(24, 99, np.int32)])
    node2_split = node2.copy()
    node2_split[:20] = 55  # break node agreement for the first 20 pairs

    m_same = np.asarray(match_descriptors_bow(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(node1),
        jnp.asarray(d2), jnp.asarray(v2), jnp.asarray(node2)))
    # exact-duplicate descriptors have distance 0 and no same-node rival
    np.testing.assert_array_equal(m_same, np.arange(40))

    m_split = np.asarray(match_descriptors_bow(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(node1),
        jnp.asarray(d2), jnp.asarray(v2), jnp.asarray(node2_split)))
    # pairs whose node ids disagree can never match
    assert (m_split[:20] == -1).all()
    np.testing.assert_array_equal(m_split[20:], np.arange(20, 40))

    # node restriction rescues matches the global ratio test kills:
    # true matches 3 bits away, global decoys 4 bits away in a DIFFERENT
    # node — globally 3 < 0.75*4 fails the ratio, in-node it survives
    true2 = d1.copy()
    true2[:, 0] ^= np.uint32(0b111)
    decoys = d1.copy()
    decoys[:, 0] ^= np.uint32(0b1111000)
    d2b = np.concatenate([true2, decoys], axis=0)
    node2b = np.concatenate([node1, np.full(40, 99, np.int32)])
    v2b = np.ones(80, bool)
    m_glob = np.asarray(match_descriptors(
        jnp.asarray(d1), jnp.asarray(v1),
        jnp.asarray(d2b), jnp.asarray(v2b)))
    m_bow = np.asarray(match_descriptors_bow(
        jnp.asarray(d1), jnp.asarray(v1), jnp.asarray(node1),
        jnp.asarray(d2b), jnp.asarray(v2b), jnp.asarray(node2b)))
    assert (m_glob == -1).all()
    np.testing.assert_array_equal(m_bow, np.arange(40))
