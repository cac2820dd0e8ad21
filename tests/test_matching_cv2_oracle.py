"""cv2 oracle for brute-force Hamming descriptor matching.

Certifies the MXU Hamming-distance matrix + masked argmin matcher
(ops/hamming.py, ops/matching.py) against ``cv2.BFMatcher(NORM_HAMMING)`` —
the matcher behind the reference's forced brute-force inter-frame matching
(ifmDescBF, reference src/CSRBAStereoSLAMEstimator.cpp:1137) and the DA
cascade's BFMatcher call (src/CSRBAStereoSLAMEstimator.cpp:1447-1452).

Pins EXACT argmin parity: every distance in the full N x M matrix matches
cv2's integer Hamming distance, every best-match (index AND distance)
matches ``BFMatcher.match``, and the crossCheck variant matches our strict
mutual-best mode.
"""

import cv2
import numpy as np

import jax.numpy as jnp

from srba_slam_tpu.ops.bits import pack_bytes_to_words
from srba_slam_tpu.ops.hamming import hamming_matrix
from srba_slam_tpu.ops.matching import masked_best_match


def _random_descs(rng, n):
    """ORB-like 256-bit descriptors as cv2 uint8[N,32] + packed uint32[N,8]."""
    raw = rng.integers(0, 256, (n, 32), dtype=np.uint8)
    packed = np.asarray(pack_bytes_to_words(jnp.asarray(raw)))
    return raw, packed


def test_full_distance_matrix_exact():
    rng = np.random.default_rng(0)
    qa, qp = _random_descs(rng, 200)
    ta, tp = _random_descs(rng, 300)
    ours = np.asarray(hamming_matrix(jnp.asarray(qp), jnp.asarray(tp)))
    # integer ground truth via numpy popcount on the xor
    x = np.bitwise_xor(qa[:, None, :], ta[None, :, :])
    gt = np.unpackbits(x, axis=-1).sum(-1)
    np.testing.assert_array_equal(ours.astype(np.int32), gt)


def test_best_match_parity_with_bfmatcher():
    rng = np.random.default_rng(1)
    qa, qp = _random_descs(rng, 256)
    ta, tp = _random_descs(rng, 256)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=False)
    matches = bf.match(qa, ta)
    cv_by_q = {m.queryIdx: m for m in matches}
    dist = hamming_matrix(jnp.asarray(qp), jnp.asarray(tp))
    gate = jnp.ones(dist.shape, bool)
    res = masked_best_match(dist, gate, max_dist=256.0, unique=False)
    idx = np.asarray(res.idx)
    d = np.asarray(res.dist)
    assert len(cv_by_q) == len(qa)
    for q, m in cv_by_q.items():
        assert d[q] == m.distance, (q, d[q], m.distance)
        # equal-distance ties: both pick SOME argmin; distances already
        # pinned equal, so only require ours attains the oracle's minimum
        if idx[q] != m.trainIdx:
            x = np.bitwise_xor(qa[q], ta[idx[q]])
            assert np.unpackbits(x).sum() == m.distance


def test_crosscheck_parity_with_mutual_best():
    """BFMatcher(crossCheck=True) returns pairs that are each other's best;
    our ``mutual=True`` mode must accept exactly those (modulo equal-distance
    ties, which both sides resolve arbitrarily — excluded from the pin)."""
    rng = np.random.default_rng(2)
    qa, qp = _random_descs(rng, 200)
    ta, tp = _random_descs(rng, 200)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    matches = bf.match(qa, ta)
    cv_pairs = {(m.queryIdx, m.trainIdx) for m in matches}
    dist = np.asarray(hamming_matrix(jnp.asarray(qp), jnp.asarray(tp)))
    res = masked_best_match(jnp.asarray(dist), jnp.ones(dist.shape, bool),
                            max_dist=256.0, unique=False, mutual=True)
    ours = {(q, int(res.idx[q])) for q in range(len(qa))
            if bool(res.valid[q])}
    # drop tie-ambiguous rows/cols from the comparison
    def unambiguous(q, t):
        row = dist[q]
        col = dist[:, t]
        return (np.sum(row == row.min()) == 1
                and np.sum(col == col.min()) == 1)
    cv_u = {p for p in cv_pairs if unambiguous(*p)}
    ours_u = {p for p in ours if unambiguous(*p)}
    assert cv_u == ours_u
    assert len(cv_u) > 50, "oracle too thin"
