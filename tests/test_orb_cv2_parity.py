"""Bit-exact descriptor parity with OpenCV's ORB (the BASELINE.json north
star). Requires cv2 (present in this image); skipped gracefully elsewhere."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from srba_slam_tpu.ops.bits import words_to_bytes
from srba_slam_tpu.ops.orb import describe


def _hamming_to_cv(ours_words, desc_cv):
    ob = np.asarray(words_to_bytes(ours_words))
    return [int(np.unpackbits(ob[i] ^ desc_cv[i]).sum()) for i in range(len(desc_cv))]


def test_upright_descriptors_bit_exact(rng):
    img8 = rng.integers(0, 256, (200, 320), dtype=np.uint8)
    ys = rng.integers(40, 160, 30).astype(np.int32)
    xs = rng.integers(40, 280, 30).astype(np.int32)
    kps = [cv2.KeyPoint(float(x), float(y), 31.0, 0.0, 0, 0)
           for y, x in zip(ys, xs)]
    kps, desc_cv = cv2.ORB_create().compute(img8, kps)
    ours, _ = describe(jnp.asarray(img8, jnp.float32), jnp.asarray(ys),
                       jnp.asarray(xs), jnp.ones(30, bool),
                       oriented=False, pattern="opencv")
    d = _hamming_to_cv(ours, desc_cv)
    assert max(d) == 0, d


def test_oriented_descriptors_and_angles_match_cv2(rng):
    img8 = rng.integers(0, 256, (240, 320), dtype=np.uint8)
    orb = cv2.ORB_create(nfeatures=60)
    kps, _ = orb.detectAndCompute(img8, None)
    kps = [k for k in kps if k.octave == 0][:40]
    kps, desc_cv = orb.compute(img8, kps)
    assert len(kps) >= 10
    ys = np.array([int(round(k.pt[1])) for k in kps], np.int32)
    xs = np.array([int(round(k.pt[0])) for k in kps], np.int32)
    th_cv = np.array([np.deg2rad(k.angle) for k in kps], np.float32)
    ours, th = describe(jnp.asarray(img8, jnp.float32), jnp.asarray(ys),
                        jnp.asarray(xs), jnp.ones(len(kps), bool),
                        oriented=True, pattern="opencv")
    ang = np.rad2deg(np.abs(np.angle(np.exp(1j * (np.asarray(th) - th_cv)))))
    assert ang.max() < 0.05, ang.max()   # IC_Angle umax-disc parity
    d = _hamming_to_cv(ours, desc_cv)
    assert max(d) == 0, d


def test_fast_corner_set_identical_to_cv2(rng):
    img8 = rng.integers(0, 256, (120, 160), dtype=np.uint8)
    from srba_slam_tpu.ops.fast import fast_score_map

    for th in (15, 30):
        det = cv2.FastFeatureDetector_create(
            threshold=th, nonmaxSuppression=False,
            type=cv2.FastFeatureDetector_TYPE_9_16)
        cv_set = {(int(k.pt[1]), int(k.pt[0])) for k in det.detect(img8, None)}
        s = np.asarray(fast_score_map(jnp.asarray(img8, jnp.float32),
                                      float(th), margin=0))
        ours = set(zip(*np.nonzero(s)))
        interior = lambda pts: {(y, x) for (y, x) in pts
                                if 3 <= y < 117 and 3 <= x < 157}
        assert interior(ours) == interior(cv_set)
