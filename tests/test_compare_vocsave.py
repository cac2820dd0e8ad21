import numpy as np
import jax.numpy as jnp

from srba_slam_tpu.config import VOOptions
from srba_slam_tpu.models.bow import Vocabulary
from srba_slam_tpu.utils.checkpoint import load_state, save_state
from srba_slam_tpu.utils.compare import (
    compare_estimator_state, compare_keypoint_lists, compare_options,
)
from srba_slam_tpu.utils.framesource import SyntheticSource

from tests.test_estimator import make_estimator, small_cam


def test_vocabulary_native_save_load(tmp_path, rng):
    train = rng.integers(0, 2**32, (800, 8), dtype=np.uint64).astype(np.uint32)
    voc = Vocabulary.train(train, k=4, L=2, seed=0)
    p = str(tmp_path / "voc.npz")
    voc.save(p)
    voc2 = Vocabulary.load(p)
    assert voc2.n_words == voc.n_words and voc2.k == voc.k
    np.testing.assert_array_equal(voc2.leaf_bits, voc.leaf_bits)
    np.testing.assert_array_equal(voc2.weights, voc.weights)


def test_compare_options_diff():
    a, b = VOOptions(), VOOptions(fast_th=33)
    assert compare_options(a, a) == []
    diffs = compare_options(a, b)
    assert len(diffs) == 1 and "fast_th" in diffs[0]


def test_compare_keypoints():
    ys = jnp.asarray([1, 2, 3])
    xs = jnp.asarray([4, 5, 6])
    v = jnp.asarray([True, True, False])
    assert compare_keypoint_lists(ys, xs, v, ys, xs, v)
    assert not compare_keypoint_lists(ys, xs, v, ys, xs + 1, v)


def test_checkpoint_state_roundtrip_validates(tmp_path):
    cam = small_cam()
    frames = list(SyntheticSource(cam, n_frames=15, seed=11, step=0.12))
    est = make_estimator()
    for l, r in frames:
        est.step(l, r)
    ckpt = str(tmp_path / "s.npz")
    save_state(est, ckpt)
    est2 = make_estimator()
    load_state(est2, ckpt)
    assert compare_estimator_state(est, est2) == []
