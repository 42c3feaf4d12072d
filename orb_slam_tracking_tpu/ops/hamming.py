"""Dense Hamming distance between packed 256-bit descriptor sets.

TPU-native replacement for the reference's per-candidate scalar SWAR
popcount loop (``DBoW2::FORB::distance``, ``Thirdparty/DBoW2/src/FORB.cpp:
77-115``, called from ``ORBmatcher.cpp:64``). Formulations:

1. ``hamming_matrix`` / ``hamming_matrix_bf16`` — MXU bit-matmul: unpack
   descriptors to {0,1} bf16 planes [N, 256] and use
   ``ham(a,b) = pop(a) + pop(b) - 2 a.b`` with f32 accumulation (exact).
   The [N1, 256] x [256, N2] contraction rides the systolic array, which
   beats any elementwise XOR/popcount formulation for all-pairs matching.
2. ``hamming_matrix_mxu`` — int8-plane variant of the same identity.
3. ``hamming_matrix_xor`` — XOR + ``lax.population_count`` reference
   implementation for validation (also fine for small candidate sets).

All return int32 distances in [0, 256].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "unpack_bits", "popcount_rows", "hamming_matrix", "hamming_matrix_bf16",
    "hamming_matrix_xor",
]


def unpack_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] uint32 -> [N, 256] int8 bit planes (little-endian per word,
    matching brief.pack_bits)."""
    n = desc.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(n, 256).astype(jnp.int8)


def popcount_rows(desc: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] uint32 -> [N] int32 total set bits."""
    return jnp.sum(jax.lax.population_count(desc).astype(jnp.int32), axis=-1)


def hamming_matrix(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs Hamming distance: [N1,8]x[N2,8] -> [N1,N2] int32.

    Dispatches to the bf16 bit-matmul, which is EXACT ({0,1} planes, f32
    accumulation, inner product <= 256) and rides the MXU natively.
    Measured at the tracking shape (8192 x 1024, v5e, chained timing):
    bf16 matmul ~0.03 ms vs 3.75 ms for the Pallas XOR+popcount tiles and
    the int8 contraction at ~0.03 ms — the systolic array crushes any
    elementwise XOR/popcount formulation for all-pairs matching
    (scripts/tpu_hamming_experiment.py).
    """
    return hamming_matrix_bf16(d1, d2)


def hamming_matrix_mxu(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """MXU bit-matmul formulation: ham(a,b) = pop(a) + pop(b) - 2 a.b."""
    b1 = unpack_bits(d1)
    b2 = unpack_bits(d2)
    inner = jax.lax.dot_general(
        b1,
        b2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    p1 = popcount_rows(d1)
    p2 = popcount_rows(d2)
    return p1[:, None] + p2[None, :] - 2 * inner


def hamming_matrix_bf16(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """bf16 bit-matmul: EXACT (bit planes are {0,1} -> exact in bf16; the
    inner product <= 256 accumulates in f32). One native MXU pass on
    v5e-class hardware, unlike the int8 contraction (no int MXU path) or
    any elementwise XOR+popcount formulation."""
    b1 = unpack_bits(d1).astype(jnp.bfloat16)
    b2 = unpack_bits(d2).astype(jnp.bfloat16)
    inner = jax.lax.dot_general(
        b1,
        b2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    p1 = popcount_rows(d1)
    p2 = popcount_rows(d2)
    return p1[:, None] + p2[None, :] - 2 * inner


def hamming_matrix_xor(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Validation-oriented XOR+popcount formulation (O(N1*N2*8) elementwise)."""
    x = d1[:, None, :] ^ d2[None, :, :]
    return jnp.sum(jax.lax.population_count(x).astype(jnp.int32), axis=-1)
