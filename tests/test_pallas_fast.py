import numpy as np
import jax
import jax.numpy as jnp

from srba_slam_tpu.ops.fast import fast_score_map
from srba_slam_tpu.ops.nms import local_max_suppress
from srba_slam_tpu.ops.pallas_fast import fast_nms_pallas, fast_score_map_pallas


def test_pallas_fast_matches_xla(rng):
    # interpret mode on CPU; the compiled kernel is exercised on real TPU by
    # bench/e2e runs (verified bit-exact there too)
    img = jnp.asarray(rng.uniform(0, 255, (200, 320)).astype(np.float32))
    ref = fast_score_map(img, 12.0, margin=16)
    got = fast_score_map_pallas(img, 12.0, margin=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_pallas_fast_unaligned_shape(rng):
    # height not a multiple of tile_h, width not a multiple of 128
    img = jnp.asarray(rng.uniform(0, 255, (123, 300)).astype(np.float32))
    ref = fast_score_map(img, 8.0, margin=16)
    got = fast_score_map_pallas(img, 8.0, margin=16, tile_h=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_fused_fast_nms_matches_xla(rng):
    """The batched fused detect+NMS kernel is bit-exact vs the two-stage XLA
    pipeline (incl. the row-major-index NMS tiebreak) on integer-valued
    images at an unaligned geometry."""
    imgs = jnp.asarray(
        rng.integers(0, 255, (3, 123, 300)).astype(np.float32))
    ref = jax.vmap(lambda im: local_max_suppress(
        fast_score_map(im, 12.0, margin=16), radius=2))(imgs)
    got = fast_nms_pallas(imgs, 12.0, margin=16, tile_h=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_fused_fast_nms_kitti_geometry(rng):
    """Bench geometry (370x1226), default tile, threshold on plateaus: the
    keyed tiebreak must pick the lexically-first pixel of every plateau."""
    imgs = np.zeros((2, 370, 1226), np.float32)
    # plateau of identical corners (quantized noise creates score ties)
    imgs[:] = rng.integers(0, 8, (2, 370, 1226)).astype(np.float32) * 30.0
    imgs = jnp.asarray(imgs)
    ref = jax.vmap(lambda im: local_max_suppress(
        fast_score_map(im, 20.0, margin=16), radius=2))(imgs)
    got = fast_nms_pallas(imgs, 20.0, margin=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_orb_bitplanes_matches_describe(rng):
    """Image-wide bit-plane descriptors are bit-identical to the per-keypoint
    block-gather fast path at every margin-safe keypoint."""
    from srba_slam_tpu.ops.orb import describe, gauss_blur7
    from srba_slam_tpu.ops.pallas_fast import orb_descriptors_pallas

    n, h, w, k = 2, 123, 300, 64
    imgs = jnp.asarray(rng.integers(0, 255, (n, h, w)).astype(np.float32))
    ys = jnp.asarray(rng.integers(16, h - 16, (n, k)).astype(np.int32))
    xs = jnp.asarray(rng.integers(16, w - 16, (n, k)).astype(np.int32))
    valid = jnp.asarray(rng.random((n, k)) < 0.9)

    ref = jax.vmap(lambda im, y, x, v: describe(
        im, y, x, v, oriented=False, patch_safe=True)[0])(imgs, ys, xs, valid)
    blurred = jax.vmap(gauss_blur7)(imgs)
    got = orb_descriptors_pallas(blurred, ys, xs, valid, tile_h=32,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
