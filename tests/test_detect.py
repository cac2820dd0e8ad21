import numpy as np
import jax.numpy as jnp

from srba_slam_tpu.ops.fast import fast_score_map
from srba_slam_tpu.ops.nms import local_max_suppress, grid_topk
from srba_slam_tpu.ops.orb import describe, box_blur5
from srba_slam_tpu.ops.hamming import hamming_pairs


def _corner_image(h=128, w=128):
    """Dark background with a bright square: 4 ideal corners."""
    img = np.full((h, w), 30.0, np.float32)
    img[40:90, 50:100] = 200.0
    return img


def test_fast_detects_square_corners():
    img = _corner_image()
    score = np.asarray(fast_score_map(jnp.asarray(img), 20.0, margin=16))
    assert score.max() > 20.0
    ys, xs = np.nonzero(score)
    corners = np.array([[40, 50], [40, 99], [89, 50], [89, 99]])
    for cy, cx in corners:
        d = np.abs(ys - cy) + np.abs(xs - cx)
        assert d.min() <= 3, f"no response near corner ({cy},{cx})"
    # no response in flat interior
    assert score[60:70, 70:80].max() == 0.0


def test_fast_threshold_monotonic():
    img = _corner_image()
    lo = np.asarray(fast_score_map(jnp.asarray(img), 10.0))
    hi = np.asarray(fast_score_map(jnp.asarray(img), 60.0))
    assert (lo > 0).sum() >= (hi > 0).sum()


def test_fast_margin():
    img = np.asarray(
        np.random.default_rng(0).uniform(0, 255, (64, 64)), np.float32
    )
    score = np.asarray(fast_score_map(jnp.asarray(img), 10.0, margin=16))
    assert score[:16, :].max() == 0 and score[-16:, :].max() == 0
    assert score[:, :16].max() == 0 and score[:, -16:].max() == 0


def test_nms_keeps_single_peak():
    score = np.zeros((64, 64), np.float32)
    score[20, 20] = 5.0
    score[20, 21] = 4.0  # neighbour must be suppressed
    score[40, 40] = 3.0
    out = np.asarray(local_max_suppress(jnp.asarray(score), radius=2))
    assert out[20, 20] == 5.0 and out[20, 21] == 0.0 and out[40, 40] == 3.0


def test_nms_plateau_single_survivor():
    score = np.zeros((32, 32), np.float32)
    score[10:12, 10:12] = 7.0  # 2x2 plateau
    out = np.asarray(local_max_suppress(jnp.asarray(score), radius=2))
    assert (out > 0).sum() == 1


def test_grid_topk_capacity_and_order(rng):
    score = np.zeros((100, 100), np.float32)
    pts = [(10, 10, 9.0), (30, 60, 8.0), (70, 20, 7.0), (90, 90, 6.0)]
    for y, x, s in pts:
        score[y, x] = s
    ys, xs, sc, valid = grid_topk(jnp.asarray(score), cell=5, k=8)
    ys, xs, sc, valid = map(np.asarray, (ys, xs, sc, valid))
    assert valid.sum() == 4
    assert list(sc[:4]) == [9.0, 8.0, 7.0, 6.0]
    assert (ys[0], xs[0]) == (10, 10)
    assert not valid[4:].any()


def test_grid_topk_min_distance():
    # two strong points in the same cell: only one survives
    score = np.zeros((50, 50), np.float32)
    score[10, 10] = 5.0
    score[11, 11] = 4.0
    ys, xs, sc, valid = map(np.asarray, grid_topk(jnp.asarray(score), cell=5, k=4))
    assert valid.sum() == 1 and sc[0] == 5.0


def test_descriptor_deterministic_and_rotation_robust(rng):
    img = np.asarray(rng.uniform(0, 255, (128, 128)), np.float32)
    ys = jnp.asarray([40, 60, 80], jnp.int32)
    xs = jnp.asarray([50, 70, 40], jnp.int32)
    valid = jnp.asarray([True, True, True])
    d1, t1 = describe(jnp.asarray(img), ys, xs, valid)
    d2, t2 = describe(jnp.asarray(img), ys, xs, valid)
    assert jnp.all(d1 == d2)
    assert d1.shape == (3, 8) and d1.dtype == jnp.uint32
    # descriptors of distinct random patches should differ a lot
    h01 = int(hamming_pairs(d1[0:1], d1[1:2])[0])
    assert 60 < h01 < 200


def test_descriptor_rotation_invariance():
    # rotate a textured patch by 90 deg; descriptor should stay close
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 255, (64, 64)).astype(np.float32)
    base = np.asarray(box_blur5(jnp.asarray(base)))  # smooth texture
    rot = np.rot90(base, k=1).copy()
    c = 32
    d0, _ = describe(jnp.asarray(base), jnp.asarray([c]), jnp.asarray([c]),
                     jnp.asarray([True]))
    d1, _ = describe(jnp.asarray(rot), jnp.asarray([c - 1]), jnp.asarray([c]),
                     jnp.asarray([True]))
    dist_rot = int(hamming_pairs(d0, d1)[0])
    # a random unrelated descriptor pair sits near 128; steered BRIEF should
    # be clearly below that under pure rotation
    assert dist_rot < 95, dist_rot


def test_descriptor_invalid_rows_zeroed():
    img = jnp.zeros((64, 64), jnp.float32)
    d, _ = describe(img, jnp.asarray([32, 32]), jnp.asarray([32, 40]),
                    jnp.asarray([True, False]))
    assert jnp.all(d[1] == 0)
