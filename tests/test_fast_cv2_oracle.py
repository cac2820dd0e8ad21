"""cv2 oracle for the FAST-9/16 corner detector.

Certifies the tensorized whole-image FAST program (ops/fast.py) against
OpenCV's ``cv2.FastFeatureDetector`` (TYPE_9_16) — the detector inside the
reference's stereo-vo engine (forced ORB/FAST detection, reference
src/CSRBAStereoSLAMEstimator.cpp:1135 and the SRBA_DETECT fast threshold;
the stereo-vo contract). Two pins:

* the corner SET is bit-exact at any threshold (same strict > t arc test
  over the same Bresenham circle), and
* the score map equals OpenCV's nonmax ``response`` + 1 for every surviving
  keypoint (OpenCV's cornerScore returns "largest threshold still a corner"
  MINUS one; ours returns the largest contrast bound itself — a constant
  offset, pinned exactly so any drift in either convention fails loudly).
"""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from srba_slam_tpu.ops.fast import fast_score_map

MARGIN = 16


def _interior(h, w):
    def ok(y, x):
        return MARGIN <= y < h - MARGIN and MARGIN <= x < w - MARGIN
    return ok


def _images():
    rng = np.random.default_rng(3)
    blurred = cv2.GaussianBlur(
        rng.integers(0, 256, (160, 240)).astype(np.uint8), (5, 5), 1.2)
    # a rendered SLAM frame: realistic gradients and texture statistics
    from srba_slam_tpu.utils.camera import StereoCamera
    from srba_slam_tpu.utils.framesource import SyntheticSource

    cam = StereoCamera(
        fx_l=180.0, fy_l=180.0, cx_l=160.0, cy_l=100.0,
        fx_r=180.0, fy_r=180.0, cx_r=160.0, cy_r=100.0,
        baseline=0.54, width=320, height=200,
    )
    left, _right = next(iter(SyntheticSource(cam, n_frames=1, seed=5)))
    rendered = np.asarray(left, np.uint8)
    return [("blurred-noise", blurred), ("rendered", rendered)]


@pytest.mark.parametrize("threshold", [10, 20, 40])
def test_corner_set_bit_exact(threshold):
    for name, img in _images():
        h, w = img.shape
        det = cv2.FastFeatureDetector_create(
            threshold=threshold, nonmaxSuppression=False,
            type=cv2.FastFeatureDetector_TYPE_9_16)
        ok = _interior(h, w)
        cv = {(int(k.pt[1]), int(k.pt[0])) for k in det.detect(img)}
        cv = {p for p in cv if ok(*p)}
        score = np.asarray(fast_score_map(
            jnp.asarray(img, jnp.float32), float(threshold), margin=MARGIN))
        ours = set(zip(*np.nonzero(score > 0)))
        assert len(cv) > 50, f"{name}: oracle too thin at t={threshold}"
        assert ours == cv, (
            f"{name} t={threshold}: {len(ours ^ cv)} disagreeing pixels "
            f"of {len(cv)}")


def test_scores_match_cv2_response():
    threshold = 20
    for name, img in _images():
        h, w = img.shape
        det = cv2.FastFeatureDetector_create(
            threshold=threshold, nonmaxSuppression=True,
            type=cv2.FastFeatureDetector_TYPE_9_16)
        ok = _interior(h, w)
        score = np.asarray(fast_score_map(
            jnp.asarray(img, jnp.float32), float(threshold), margin=MARGIN))
        kps = [k for k in det.detect(img) if ok(int(k.pt[1]), int(k.pt[0]))]
        assert len(kps) > 30, f"{name}: oracle too thin"
        for k in kps:
            y, x = int(k.pt[1]), int(k.pt[0])
            assert score[y, x] == k.response + 1.0, (
                f"{name}: score mismatch at ({y},{x}): "
                f"{score[y, x]} vs cv2 {k.response}")
