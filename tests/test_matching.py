import numpy as np
import jax.numpy as jnp

from srba_slam_tpu.ops import bits as bitops
from srba_slam_tpu.ops.matching import masked_best_match, stereo_match, interframe_match


def _rand_packed(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, size=(n, 8), dtype=np.uint64).astype(np.uint32))


def _flip_bits(rng, desc, k):
    """Flip k random bits of each descriptor row."""
    bits = np.asarray(bitops.unpack_bits(desc)).copy()
    for i in range(bits.shape[0]):
        idx = rng.choice(256, size=k, replace=False)
        bits[i, idx] ^= 1
    return bitops.pack_bits(jnp.asarray(bits))


def test_masked_best_match_basic():
    dist = jnp.asarray([[5, 1, 9], [2, 8, 3]], jnp.int32)
    gate = jnp.ones((2, 3), bool)
    r = masked_best_match(dist, gate, 60)
    assert list(np.asarray(r.idx)) == [1, 0]
    assert list(np.asarray(r.valid)) == [True, True]


def test_masked_best_match_gate_and_threshold():
    dist = jnp.asarray([[5, 1], [2, 70]], jnp.int32)
    gate = jnp.asarray([[True, False], [False, True]])
    r = masked_best_match(dist, gate, 60)
    assert np.asarray(r.valid).tolist() == [True, False]  # 70 > 60 rejected
    assert int(r.idx[0]) == 0


def test_masked_best_match_uniqueness():
    # both rows prefer column 0; row 1 has smaller distance and must win
    dist = jnp.asarray([[4, 50], [2, 50]], jnp.int32)
    gate = jnp.ones((2, 2), bool)
    r = masked_best_match(dist, gate, 60, unique=True)
    assert np.asarray(r.valid).tolist() == [False, True]
    r2 = masked_best_match(dist, gate, 60, unique=False)
    assert np.asarray(r2.valid).tolist() == [True, True]


def test_stereo_match_recovers_shifted_features(rng):
    n = 64
    desc = _rand_packed(rng, n)
    noisy = _flip_bits(rng, desc, 5)
    ys = jnp.asarray(rng.integers(20, 300, n), jnp.int32)
    xs = jnp.asarray(rng.integers(100, 1000, n), jnp.int32)
    disp = jnp.asarray(rng.integers(5, 60, n), jnp.int32)
    perm = rng.permutation(n)
    r = stereo_match(
        desc, noisy[perm],
        ys, xs, ys[perm], (xs - disp)[perm],
        jnp.ones(n, bool), jnp.ones(n, bool),
        max_y_diff=2.0, orb_max_distance=60,
    )
    idx, valid = np.asarray(r.idx), np.asarray(r.valid)
    assert valid.sum() >= n - 2  # near-perfect recovery
    inv = np.argsort(perm)
    assert (idx[valid] == inv[valid]).all()


def test_stereo_match_rejects_negative_disparity(rng):
    n = 8
    desc = _rand_packed(rng, n)
    ys = jnp.zeros(n, jnp.int32) + 50
    xs = jnp.arange(n, dtype=jnp.int32) * 10 + 100
    # right features to the RIGHT of left ones -> negative disparity -> reject
    r = stereo_match(desc, desc, ys, xs, ys, xs + 5,
                     jnp.ones(n, bool), jnp.ones(n, bool))
    assert not np.asarray(r.valid).any()


def test_interframe_match(rng):
    n = 32
    desc = _rand_packed(rng, n)
    noisy = _flip_bits(rng, desc, 8)
    perm = rng.permutation(n)
    r = interframe_match(desc, noisy[perm], jnp.ones(n, bool), jnp.ones(n, bool))
    idx, valid = np.asarray(r.idx), np.asarray(r.valid)
    inv = np.argsort(perm)
    assert valid.sum() >= n - 2
    assert (idx[valid] == inv[valid]).all()
