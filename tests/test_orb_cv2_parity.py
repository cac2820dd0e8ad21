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


def test_ransac_inliers_agree_with_cv2(rng):
    """Behavioral check of the batched fundamental-matrix RANSAC against
    cv2.findFundamentalMat on the same correspondences."""
    import jax

    from srba_slam_tpu.ops.ransac import ransac_fundamental
    from srba_slam_tpu.utils import se3_np
    from srba_slam_tpu.utils.camera import StereoCamera

    cam = StereoCamera.kitti()
    n = 160
    pts = np.stack([rng.uniform(-10, 10, n), rng.uniform(-3, 3, n),
                    rng.uniform(6, 40, n)], -1)
    pose = np.array([0.02, -0.05, 0.01, 0.4, 0.1, 1.5])
    x1 = cam.cx_l + cam.fx_l * pts[:, 0] / pts[:, 2]
    y1 = cam.cy_l + cam.fy_l * pts[:, 1] / pts[:, 2]
    pc2 = np.stack([se3_np.transform_point(se3_np.inverse(pose), p) for p in pts])
    x2 = cam.cx_l + cam.fx_l * pc2[:, 0] / pc2[:, 2]
    y2 = cam.cy_l + cam.fy_l * pc2[:, 1] / pc2[:, 2]
    out = rng.choice(n, n // 5, replace=False)
    # shift perpendicular to the (near-horizontal) epipolar lines so the
    # planted outliers genuinely violate the constraint
    y2[out] += rng.uniform(25, 80, len(out)) * rng.choice([-1, 1], len(out))
    is_out = np.zeros(n, bool); is_out[out] = True

    inl, count, F = ransac_fundamental(
        jnp.asarray(x1, jnp.float32), jnp.asarray(y1, jnp.float32),
        jnp.asarray(x2, jnp.float32), jnp.asarray(y2, jnp.float32),
        jnp.ones(n, bool), jax.random.PRNGKey(0), threshold=2.0)
    ours = np.asarray(inl)

    p1 = np.stack([x1, y1], -1).astype(np.float32)
    p2 = np.stack([x2, y2], -1).astype(np.float32)
    _, mask = cv2.findFundamentalMat(p1, p2, cv2.FM_RANSAC, 2.0, 0.99)
    cv = mask.ravel().astype(bool)
    # both reject the planted outliers and keep the vast majority of inliers
    assert ours[is_out].mean() < 0.1 and cv[is_out].mean() < 0.1
    agree = (ours == cv).mean()
    assert agree > 0.9, agree


def test_upright_general_path_matches_fast_path():
    """patch_safe=False (the documented escape hatch for keypoints near the
    border) must keep the UPRIGHT contract: for interior keypoints the
    general gather path and the block-gather fast path are bit-identical,
    and the pattern is NOT steered by the computed orientation (regression:
    the theta-zeroing branch was lost when the fast path landed)."""
    import numpy as np
    import jax.numpy as jnp

    from srba_slam_tpu.ops.orb import describe

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (120, 160)).astype(np.float32)
    ys = np.array([30, 40, 60, 80, 90], np.int32)
    xs = np.array([40, 100, 70, 30, 120], np.int32)
    valid = np.ones(5, bool)
    d_fast, _t0 = describe(jnp.asarray(img), jnp.asarray(ys), jnp.asarray(xs),
                           jnp.asarray(valid), oriented=False,
                           patch_safe=True)
    d_gen, _t1 = describe(jnp.asarray(img), jnp.asarray(ys), jnp.asarray(xs),
                          jnp.asarray(valid), oriented=False,
                          patch_safe=False)
    np.testing.assert_array_equal(np.asarray(d_fast), np.asarray(d_gen))
    # and the oriented path differs (so the upright check is not vacuous)
    d_or, _t2 = describe(jnp.asarray(img), jnp.asarray(ys), jnp.asarray(xs),
                         jnp.asarray(valid), oriented=True, patch_safe=False)
    assert (np.asarray(d_or) != np.asarray(d_gen)).any()
