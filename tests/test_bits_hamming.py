import numpy as np
import jax.numpy as jnp

from srba_slam_tpu.ops import bits as bitops
from srba_slam_tpu.ops.hamming import hamming_matrix, hamming_matrix_unpacked, hamming_pairs


def _rand_packed(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, size=(n, 8), dtype=np.uint64).astype(np.uint32))


def test_pack_unpack_roundtrip(rng):
    d = _rand_packed(rng, 32)
    assert jnp.all(bitops.pack_bits(bitops.unpack_bits(d)) == d)


def test_byte_order_matches_reference(rng):
    # reference bit order (CBoWManager.h:95-109): bit m+k*8 = (byte[k] >> m) & 1
    by = rng.integers(0, 256, size=(4, 32), dtype=np.uint8)
    packed = bitops.pack_bytes_to_words(jnp.asarray(by))
    bits = np.asarray(bitops.unpack_bits(packed))
    for i in range(4):
        for k in range(0, 32, 7):
            for m in range(8):
                assert bits[i, m + k * 8] == (int(by[i, k]) >> m) & 1
    # and back to bytes
    assert np.array_equal(np.asarray(bitops.words_to_bytes(packed)), by)


def test_popcount(rng):
    d = _rand_packed(rng, 64)
    ref = np.array([bin(int(w)).count("1") for w in np.asarray(d).reshape(-1)]).reshape(64, 8)
    np.testing.assert_array_equal(np.asarray(bitops.popcount32(d)), ref)
    np.testing.assert_array_equal(np.asarray(bitops.popcount_desc(d)), ref.sum(-1))


def test_hamming_matrix_exact(rng):
    a, b = _rand_packed(rng, 40), _rand_packed(rng, 50)
    an, bn = np.asarray(bitops.unpack_bits(a)), np.asarray(bitops.unpack_bits(b))
    ref = (an[:, None, :] != bn[None, :, :]).sum(-1)
    got = np.asarray(hamming_matrix(a, b))
    np.testing.assert_array_equal(got, ref)
    got2 = np.asarray(hamming_matrix_unpacked(jnp.asarray(an, jnp.int8), jnp.asarray(bn, jnp.int8)))
    np.testing.assert_array_equal(got2, ref)


def test_hamming_pairs(rng):
    a, b = _rand_packed(rng, 30), _rand_packed(rng, 30)
    an, bn = np.asarray(bitops.unpack_bits(a)), np.asarray(bitops.unpack_bits(b))
    np.testing.assert_array_equal(np.asarray(hamming_pairs(a, b)), (an != bn).sum(-1))


def test_hamming_identity(rng):
    a = _rand_packed(rng, 16)
    d = np.asarray(hamming_matrix(a, a))
    assert np.all(np.diag(d) == 0)
    assert np.all(d >= 0) and np.all(d <= 256)
