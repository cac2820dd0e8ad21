import numpy as np
import jax
import jax.numpy as jnp

from srba_slam_tpu.ops.ransac import ransac_fundamental
from srba_slam_tpu.utils import se3_np
from srba_slam_tpu.utils.camera import StereoCamera

CAM = StereoCamera.kitti()


def _two_view(rng, n=128, outlier_frac=0.0, noise=0.0):
    """Project a 3D cloud into two cameras with relative motion."""
    pts = np.stack([
        rng.uniform(-10, 10, n), rng.uniform(-3, 3, n), rng.uniform(6, 40, n)
    ], -1)
    pose = np.array([0.02, -0.05, 0.01, 0.4, 0.1, 1.5])  # cam2 in world
    x1 = CAM.cx_l + CAM.fx_l * pts[:, 0] / pts[:, 2]
    y1 = CAM.cy_l + CAM.fy_l * pts[:, 1] / pts[:, 2]
    pc2 = np.stack([se3_np.transform_point(se3_np.inverse(pose), p) for p in pts])
    x2 = CAM.cx_l + CAM.fx_l * pc2[:, 0] / pc2[:, 2]
    y2 = CAM.cy_l + CAM.fy_l * pc2[:, 1] / pc2[:, 2]
    x1 += rng.normal(0, noise, n); y1 += rng.normal(0, noise, n)
    x2 += rng.normal(0, noise, n); y2 += rng.normal(0, noise, n)
    n_out = int(n * outlier_frac)
    is_out = np.zeros(n, bool)
    if n_out:
        sel = rng.choice(n, n_out, replace=False)
        x2[sel] += rng.uniform(25, 120, n_out) * rng.choice([-1, 1], n_out)
        y2[sel] += rng.uniform(25, 120, n_out) * rng.choice([-1, 1], n_out)
        is_out[sel] = True
    return map(jnp.asarray, (x1, y1, x2, y2)), is_out


def test_clean_data_all_inliers(rng):
    (x1, y1, x2, y2), _ = _two_view(rng)
    inl, count, F = ransac_fundamental(
        x1, y1, x2, y2, jnp.ones(128, bool), jax.random.PRNGKey(0), threshold=2.0
    )
    assert int(count) >= 120


def test_rejects_outliers(rng):
    (x1, y1, x2, y2), is_out = _two_view(rng, outlier_frac=0.3, noise=0.3)
    inl, count, F = ransac_fundamental(
        x1, y1, x2, y2, jnp.ones(128, bool), jax.random.PRNGKey(1), threshold=2.0
    )
    inl = np.asarray(inl)
    # the vast majority of true inliers kept, outliers rejected
    assert inl[~is_out].mean() > 0.9
    assert inl[is_out].mean() < 0.1


def test_respects_valid_mask(rng):
    (x1, y1, x2, y2), _ = _two_view(rng)
    # poison half the entries but mark them invalid
    x2 = x2.at[64:].add(500.0)
    valid = jnp.arange(128) < 64
    inl, count, F = ransac_fundamental(
        x1, y1, x2, y2, valid, jax.random.PRNGKey(2), threshold=2.0
    )
    assert int(count) >= 58
    assert not np.asarray(inl)[64:].any()


def test_deterministic_given_key(rng):
    (x1, y1, x2, y2), _ = _two_view(rng, outlier_frac=0.2)
    key = jax.random.PRNGKey(3)
    r1 = ransac_fundamental(x1, y1, x2, y2, jnp.ones(128, bool), key)
    r2 = ransac_fundamental(x1, y1, x2, y2, jnp.ones(128, bool), key)
    np.testing.assert_array_equal(np.asarray(r1[0]), np.asarray(r2[0]))
