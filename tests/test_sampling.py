"""sample_distinct: distinctness, uniformity, range safety."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_tracking_tpu.geometry.sampling import sample_distinct


def test_all_rows_distinct():
    idx = np.asarray(
        sample_distinct(jax.random.PRNGKey(0), jnp.int32(57), 500, 8)
    )
    assert idx.shape == (500, 8)
    assert idx.min() >= 0 and idx.max() < 57
    for row in idx:
        assert len(set(row.tolist())) == 8


def test_uniform_marginals():
    # each index should appear with ~equal frequency (k/n per row)
    n, k, iters = 20, 6, 4000
    idx = np.asarray(
        sample_distinct(jax.random.PRNGKey(1), jnp.int32(n), iters, k)
    )
    counts = np.bincount(idx.ravel(), minlength=n)
    expected = iters * k / n
    assert (np.abs(counts - expected) < 0.15 * expected).all()


def test_small_n_stays_in_range():
    # degenerate n_valid < k: indices must stay in range (distinctness
    # is not guaranteed there by contract)
    idx = np.asarray(
        sample_distinct(jax.random.PRNGKey(2), jnp.int32(3), 100, 8)
    )
    assert idx.min() >= 0 and idx.max() <= 2


def test_exact_k_is_a_permutation():
    idx = np.asarray(
        sample_distinct(jax.random.PRNGKey(3), jnp.int32(8), 200, 8)
    )
    for row in idx:
        assert sorted(row.tolist()) == list(range(8))
