"""Tensor-parallel matcher: element-exact vs the single-device matcher.

SURVEY §2.3 TP row: the Hamming contraction sharded over the map axis
must reproduce ``ops.matcher.match_descriptors`` exactly (same best/ratio/
threshold/mutual semantics, same tie-breaking) on the virtual 8-device
mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_tracking_tpu.ops.matcher import match_descriptors
from orb_slam_tracking_tpu.parallel.matcher_sharded import (
    make_tp_mesh, match_descriptors_tp,
)


def _random_world(rng, n_q, n_m, clone_frac=0.3):
    """Query set where a fraction are near-clones of map descriptors
    (realistic: matches exist), the rest random (no match)."""
    dm = rng.integers(0, 2 ** 32, (n_m, 8), dtype=np.uint64).astype(np.uint32)
    dq = rng.integers(0, 2 ** 32, (n_q, 8), dtype=np.uint64).astype(np.uint32)
    n_clone = int(n_q * clone_frac)
    src = rng.integers(0, n_m, n_clone)
    noisy = dm[src].copy()
    # flip a few bits so distances are small but nonzero
    for i in range(n_clone):
        w = rng.integers(0, 8)
        noisy[i, w] ^= np.uint32(1) << np.uint32(rng.integers(0, 32))
    dq[:n_clone] = noisy
    vq = rng.random(n_q) > 0.05
    vm = rng.random(n_m) > 0.05
    return dq, vq, dm, vm


@pytest.mark.parametrize("n_q,n_m", [(256, 1024), (100, 800)])
def test_tp_matches_dense_exactly(n_q, n_m):
    rng = np.random.default_rng(11)
    dq, vq, dm, vm = _random_world(rng, n_q, n_m)
    mesh = make_tp_mesh()
    got = np.asarray(match_descriptors_tp(
        mesh, jnp.asarray(dq), jnp.asarray(vq),
        jnp.asarray(dm), jnp.asarray(vm)))
    want = np.asarray(match_descriptors(
        jnp.asarray(dq), jnp.asarray(vq), jnp.asarray(dm), jnp.asarray(vm)))
    np.testing.assert_array_equal(got, want)
    assert (got >= 0).sum() > 20  # the clones actually matched


def test_tp_duplicate_map_descriptors_tie_break():
    """Duplicated map rows (equal distances across shards) must resolve to
    the same index as the dense argmin (lowest global index)."""
    rng = np.random.default_rng(3)
    dm = rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint64).astype(np.uint32)
    dm = np.tile(dm, (8, 1))                 # every descriptor 8x, crossing shards
    dq = dm[::16].copy()                     # exact hits
    vq = np.ones(len(dq), bool)
    vm = np.ones(len(dm), bool)
    mesh = make_tp_mesh()
    got = np.asarray(match_descriptors_tp(
        mesh, jnp.asarray(dq), jnp.asarray(vq),
        jnp.asarray(dm), jnp.asarray(vm)))
    want = np.asarray(match_descriptors(
        jnp.asarray(dq), jnp.asarray(vq), jnp.asarray(dm), jnp.asarray(vm)))
    np.testing.assert_array_equal(got, want)
