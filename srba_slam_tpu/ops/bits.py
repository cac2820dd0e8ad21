"""Binary-descriptor bit manipulation.

Descriptors are 256-bit binary strings stored packed as ``uint32[N, 8]``
(little-endian: global bit ``i`` lives in word ``i // 32`` at position
``i % 32``). This matches the reference's byte-LSB-first bit order
(src/CBoWManager.h:95-109: bit ``m + k*8`` is ``(byte[k] >> m) & 1``) when the
32 descriptor bytes are packed into words little-endian, so vocabularies and
descriptor dumps are interchangeable bit-for-bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BITS = 256
WORDS = BITS // 32


def unpack_bits(packed: jax.Array, dtype=jnp.int8) -> jax.Array:
    """uint32[..., W] -> {0,1} [..., W*32] in the global bit order above."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 32).astype(dtype)


def pack_bits(bits: jax.Array) -> jax.Array:
    """{0,1} [..., W*32] -> uint32[..., W]."""
    n_words = bits.shape[-1] // 32
    b = bits.reshape(*bits.shape[:-1], n_words, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def pack_bytes_to_words(desc_bytes: jax.Array) -> jax.Array:
    """uint8[..., 32] descriptor bytes -> uint32[..., 8] words (little-endian)."""
    n_words = desc_bytes.shape[-1] // 4
    b = desc_bytes.reshape(*desc_bytes.shape[:-1], n_words, 4).astype(jnp.uint32)
    shifts = jnp.arange(4, dtype=jnp.uint32) * 8
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)


def words_to_bytes(packed: jax.Array) -> jax.Array:
    """uint32[..., W] -> uint8[..., W*4] (little-endian), reference cv::Mat row layout."""
    shifts = jnp.arange(4, dtype=jnp.uint32) * 8
    by = (packed[..., :, None] >> shifts) & jnp.uint32(0xFF)
    return by.reshape(*packed.shape[:-1], packed.shape[-1] * 4).astype(jnp.uint8)


def popcount32(x: jax.Array) -> jax.Array:
    """Per-element popcount of a uint32 array (classic SWAR bit-twiddle)."""
    x = x.astype(jnp.uint32)
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def popcount_desc(packed: jax.Array) -> jax.Array:
    """Total set bits per descriptor: uint32[..., W] -> int32[...]."""
    return jnp.sum(popcount32(packed), axis=-1)
