"""RANSAC minimal-set sampling without replacement.

The reference draws each minimal set with ``rand() % N`` retries until the
8 indices are distinct (``Initialization/Initializer.cpp:41-66``) — a
data-dependent loop. The TPU-native equivalent is the classic
reduced-range construction, vectorized over all hypotheses: the j-th draw
is uniform over ``n - j`` slots and is shifted past the previously chosen
(sorted) indices, yielding exactly-uniform distinct k-subsets in
O(k^2) static vector ops (k is 6 or 8 — 28 comparisons per set).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sample_distinct"]


def sample_distinct(key: jnp.ndarray, n_valid: jnp.ndarray, iters: int,
                    k: int) -> jnp.ndarray:
    """[iters, k] distinct indices uniform over [0, n_valid) per row.

    ``n_valid`` is a traced scalar. When ``n_valid < k`` (degenerate —
    callers gate on far larger minimums) indices are clipped into range
    and distinctness is no longer guaranteed.
    """
    u = jax.random.uniform(key, (iters, k))
    n = jnp.maximum(n_valid, k).astype(jnp.float32)
    chosen = jnp.zeros((iters, k), jnp.int32)
    for j in range(k):
        # uniform over the n - j not-yet-chosen slots
        d = jnp.floor(u[:, j] * (n - j)).astype(jnp.int32)
        d = jnp.minimum(d, (n - j).astype(jnp.int32) - 1)
        prev = jnp.sort(chosen[:, :j], axis=1) if j else chosen[:, :0]
        for i in range(j):
            d = d + (d >= prev[:, i]).astype(jnp.int32)
        chosen = chosen.at[:, j].set(d)
    return jnp.clip(chosen, 0, jnp.maximum(n_valid - 1, 0))
