"""Tensor-parallel descriptor matching: the Hamming bit-matmul sharded
over the map-point axis.

SURVEY.md §2.3's TP row: when the map grows past what one chip should
chew per frame (hundreds of thousands to millions of 256-bit
descriptors), shard the [N, 256] x [256, P] distance contraction across
the mesh. Each device holds a contiguous slice of the map descriptor
table and computes its local [N, P/D] distance block on its own MXU; the
only communication is the per-query top-2 merge — [N]-sized arrays riding
ICI, a ~P/N-fold reduction over gathering distances.

Semantics are IDENTICAL to ``ops.matcher.match_descriptors`` (best +
ratio + threshold + order-independent mutual resolution, the
``ORBmatcher.cpp:64-104`` SearchByBoW contract): verified element-exact
against the single-device matcher under test. Tie-breaking matches the
dense ``argmin`` (lowest global index wins) via lexicographic
(distance, index) merge keys.

Map-side column minima (for the mutual check) never leave their shard —
each device owns its map rows, so its column-best over the replicated
queries is already global.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.hamming import hamming_matrix_bf16

__all__ = ["make_tp_mesh", "match_descriptors_tp"]

# masked-distance sentinel; merge keys are dist * P + idx in int32, so
# (BIG + 1) * P must stay under 2^31 (asserted in match_descriptors_tp).
# Plain int, NOT jnp.int32: a module-level jnp constant would initialize
# the XLA backend at import time, breaking jax.distributed workers.
_BIG = 1 << 15


def make_tp_mesh(devices=None, axis: str = "tp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _local_top2(D: jnp.ndarray):
    """Per-row (best, best_idx, second) of a local distance block."""
    best = jnp.min(D, axis=1)
    best_j = jnp.argmin(D, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1)
    second = jnp.min(jnp.where(cols == best_j[:, None], _BIG, D), axis=1)
    return best, best_j, second


def match_descriptors_tp(
    mesh: Mesh,
    desc_q: jnp.ndarray,     # [N, 8] uint32 query descriptors (replicated)
    valid_q: jnp.ndarray,    # [N] bool
    desc_m: jnp.ndarray,     # [P, 8] uint32 map table (P % n_devices == 0)
    valid_m: jnp.ndarray,    # [P] bool
    ratio: float = 0.75,
    th: int = 50,
) -> jnp.ndarray:
    """Sharded ``match_descriptors``: returns matches [N] int32 (-1 none).

    ``desc_m``/``valid_m`` are sharded over the mesh axis; everything else
    is replicated. The caller may pass host arrays — they are placed with
    the right shardings here.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    N = desc_q.shape[0]
    P_total = desc_m.shape[0]
    assert P_total % n_dev == 0, "map capacity must divide the mesh"
    assert P_total <= (1 << 31) // (int(_BIG) + 2), \
        "merge keys would overflow int32 at this map capacity"
    per = P_total // n_dev

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    desc_m = jax.device_put(jnp.asarray(desc_m), shard)
    valid_m = jax.device_put(jnp.asarray(valid_m), shard)
    desc_q = jax.device_put(jnp.asarray(desc_q), repl)
    valid_q = jax.device_put(jnp.asarray(valid_q), repl)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def _match(dq, vq, dm, vm):
        shard_id = jax.lax.axis_index(axis)
        D = hamming_matrix_bf16(dq, dm)                     # [N, per]
        D = jnp.where(vq[:, None] & vm[None, :], D, _BIG)
        best, best_j, second = _local_top2(D)
        gbase = shard_id * per
        # lexicographic merge keys: distance then global index, so ties
        # resolve exactly like a dense argmin over the full row
        key_best = best * jnp.int32(P_total) + gbase + best_j
        # per-query top-2 merge across shards ([N]-sized collectives)
        all_best = jax.lax.all_gather(key_best, axis)       # [D, N]
        all_second = jax.lax.all_gather(second, axis)       # [D, N]
        gkey = jnp.min(all_best, axis=0)
        win = jnp.argmin(all_best, axis=0)                  # winning shard
        # global second-best distance: min over every shard's second and
        # every non-winning shard's best
        best_d = all_best // jnp.int32(P_total)
        second2 = jnp.min(
            jnp.where(jnp.arange(n_dev)[:, None] == win[None, :],
                      all_second, jnp.minimum(all_second, best_d)),
            axis=0,
        )
        gbest = gkey // jnp.int32(P_total)
        gbest_j = gkey % jnp.int32(P_total)
        accept = (gbest <= th) & (
            gbest.astype(jnp.float32) < ratio * second2.astype(jnp.float32)
        ) & vq
        # order-independent mutual resolution (same key trick as the
        # dense matcher): each map point keeps only its best query
        sentinel = jnp.int32(jnp.iinfo(jnp.int32).max)
        qrows = jnp.arange(N, dtype=jnp.int32)
        qkey = jnp.where(accept, gbest * jnp.int32(N) + qrows, sentinel)
        # scatter-min over the LOCAL shard's map rows only, then share
        local_j = gbest_j - gbase
        in_shard = (local_j >= 0) & (local_j < per)
        min_key_local = jnp.full((per,), sentinel, jnp.int32).at[
            jnp.where(in_shard, local_j, 0)
        ].min(jnp.where(in_shard, qkey, sentinel))
        min_key = jax.lax.all_gather(min_key_local, axis,
                                     tiled=True)            # [P_total]
        keep = accept & (qkey == min_key[gbest_j])
        return jnp.where(keep, gbest_j, -1)

    return _match(desc_q, valid_q, desc_m, valid_m)
