import numpy as np
import jax.numpy as jnp

from srba_slam_tpu.ops.fast import fast_score_map
from srba_slam_tpu.ops.pallas_fast import fast_score_map_pallas


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
