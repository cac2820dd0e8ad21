"""Pairwise Hamming distance on the MXU.

The reference computes brute-force Hamming matching with
``cv::BFMatcher(NORM_HAMMING)`` (src/CSRBAStereoSLAMEstimator.cpp:1447-1452) —
an N×M scalar popcount loop on CPU. On TPU the same computation is one small
integer matmul: with descriptors unpacked to {0,1} vectors a, b,

    hamming(a, b) = popcount(a) + popcount(b) - 2 * <a, b>

so the full N×M distance matrix is ``pa[:,None] + pb[None,:] - 2 A @ B^T``
with an exact int32-accumulated product that rides the systolic array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from srba_slam_tpu.ops import bits as bitops


def hamming_matrix_unpacked(a_bits: jax.Array, b_bits: jax.Array) -> jax.Array:
    """{0,1} int8 [N,256] x [M,256] -> int32 [N,M] exact Hamming distances."""
    dot = jax.lax.dot_general(
        a_bits,
        b_bits,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    pa = jnp.sum(a_bits.astype(jnp.int32), axis=-1)
    pb = jnp.sum(b_bits.astype(jnp.int32), axis=-1)
    return pa[:, None] + pb[None, :] - 2 * dot


def hamming_matrix(a_packed: jax.Array, b_packed: jax.Array) -> jax.Array:
    """uint32[N,8] x uint32[M,8] packed descriptors -> int32[N,M] distances."""
    return hamming_matrix_unpacked(
        bitops.unpack_bits(a_packed), bitops.unpack_bits(b_packed)
    )


def hamming_pairs(a_packed: jax.Array, b_packed: jax.Array) -> jax.Array:
    """Elementwise Hamming distance of aligned descriptor rows: [N,8]x[N,8] -> [N]."""
    return bitops.popcount_desc(jnp.bitwise_xor(a_packed, b_packed))
