import numpy as np
import jax.numpy as jnp

from srba_slam_tpu.ops.robust_lm import solve_pose, stereo_residuals
from srba_slam_tpu.utils import se3
from srba_slam_tpu.utils.camera import StereoCamera


CAM = StereoCamera.kitti()


def _make_problem(rng, n=200, pose=None, noise=0.0, outlier_frac=0.0):
    pts = np.stack([
        rng.uniform(-10, 10, n), rng.uniform(-2, 2, n), rng.uniform(5, 40, n)
    ], axis=-1).astype(np.float32)
    if pose is None:
        pose = np.array([0.01, -0.02, 0.005, 0.3, -0.1, 0.8], np.float32)
    R, t = se3.exp(jnp.asarray(pose))
    r, x = stereo_residuals(R, t, jnp.asarray(pts), jnp.zeros((n, 3)), CAM)
    # with obs=0 the "residual" returned IS the projection of the
    # transformed points, so the synthetic observations are +r
    obs = np.array(r)
    obs += rng.normal(0, noise, obs.shape)
    n_out = int(n * outlier_frac)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        obs[idx] += rng.uniform(30, 120, (n_out, 3)) * rng.choice([-1, 1], (n_out, 3))
    return jnp.asarray(pts), jnp.asarray(obs.astype(np.float32)), jnp.asarray(pose)


def test_exact_recovery(rng):
    pts, obs, pose = _make_problem(rng)
    res = solve_pose(pts, obs, jnp.ones(pts.shape[0], bool), CAM)
    assert bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(pose), atol=1e-4)
    assert float(res.mean_residual) < 1e-2


def test_recovery_with_noise(rng):
    pts, obs, pose = _make_problem(rng, noise=0.3)
    res = solve_pose(pts, obs, jnp.ones(pts.shape[0], bool), CAM)
    assert bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(pose), atol=5e-3)


def test_recovery_with_outliers(rng):
    pts, obs, pose = _make_problem(rng, noise=0.3, outlier_frac=0.25)
    res = solve_pose(pts, obs, jnp.ones(pts.shape[0], bool), CAM)
    assert bool(res.valid)
    # outliers must be rejected and pose still accurate
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(pose), atol=1e-2)
    assert int(res.num_inliers) >= 140


def test_respects_valid_mask(rng):
    pts, obs, pose = _make_problem(rng)
    # poison the masked-out entries with garbage
    obs = obs.at[100:].set(1e5)
    valid = jnp.arange(pts.shape[0]) < 100
    res = solve_pose(pts, obs, valid, CAM)
    assert bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(pose), atol=1e-3)
    assert not np.asarray(res.inliers)[100:].any()


def test_too_few_inliers_invalid(rng):
    pts, obs, pose = _make_problem(rng, n=8)
    valid = jnp.arange(8) < 3  # below min_inliers=5
    res = solve_pose(pts, obs, valid, CAM)
    assert not bool(res.valid)


def test_initial_pose_used(rng):
    big = np.array([0.05, 0.1, -0.08, 2.0, 0.5, 4.0], np.float32)
    pts, obs, pose = _make_problem(rng, pose=big)
    res = solve_pose(pts, obs, jnp.ones(pts.shape[0], bool), CAM,
                     initial_pose=jnp.asarray(big * 0.9))
    assert bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.pose), big, atol=1e-3)


def test_identity_motion(rng):
    pts, obs, _ = _make_problem(rng, pose=np.zeros(6, np.float32))
    res = solve_pose(pts, obs, jnp.ones(pts.shape[0], bool), CAM)
    assert bool(res.valid)
    np.testing.assert_allclose(np.asarray(res.pose), 0.0, atol=1e-5)
