import numpy as np
import jax.numpy as jnp

from srba_slam_tpu.ops.rectify import build_maps, rectify_pair, remap_bilinear
from srba_slam_tpu.utils import se3_np
from srba_slam_tpu.utils.evaluation import ate_rmse, load_kf_poses, rpe_translation


def test_identity_maps_are_identity(rng):
    img = jnp.asarray(rng.uniform(0, 255, (48, 64)).astype(np.float32))
    maps = build_maps(64, 48, fx=50.0, fy=50.0, cx=32.0, cy=24.0)
    out = remap_bilinear(img, maps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_undistortion_inverts_distortion(rng):
    # render a grid of dots through a distorting camera, rectify, and check
    # the dots land at their ideal pinhole positions
    fx = fy = 80.0
    cx, cy = 64.0, 48.0
    k1 = -0.25
    maps = build_maps(128, 96, fx, fy, cx, cy, dist=(k1, 0, 0, 0, 0))
    # distorted image: dot at the DISTORTED projection of ideal point (x, y)
    img = np.zeros((96, 128), np.float32)
    ideal_px = []
    for gx in np.linspace(-0.5, 0.5, 5):
        for gy in np.linspace(-0.35, 0.35, 4):
            r2 = gx * gx + gy * gy
            rad = 1 + k1 * r2
            ud = gx * rad * fx + cx
            vd = gy * rad * fy + cy
            iu, iv = int(round(ud)), int(round(vd))
            img[iv - 1 : iv + 2, iu - 1 : iu + 2] = 255.0
            ideal_px.append((gx * fx + cx, gy * fy + cy))
    out = np.asarray(remap_bilinear(jnp.asarray(img), maps))
    for (u, v) in ideal_px:
        iu, iv = int(round(u)), int(round(v))
        patch = out[max(iv - 2, 0) : iv + 3, max(iu - 2, 0) : iu + 3]
        assert patch.max() > 100.0, (u, v)


def test_rectify_pair_shapes(rng):
    img = jnp.asarray(rng.uniform(0, 255, (48, 64)).astype(np.float32))
    maps = build_maps(64, 48, 50.0, 50.0, 32.0, 24.0)
    l, r = rectify_pair(img, img, maps, maps)
    assert l.shape == r.shape == (48, 64)


def test_ate_alignment_invariance(rng):
    gt = np.cumsum(rng.normal(0, 0.3, (50, 3)), axis=0)
    # estimated = gt under a rigid transform + small noise
    R, _ = se3_np.exp(np.array([0.1, -0.2, 0.3, 0, 0, 0]))
    est = gt @ R.T + np.array([5.0, -2.0, 1.0]) + rng.normal(0, 0.01, (50, 3))
    assert ate_rmse(est, gt, align=True) < 0.05
    assert ate_rmse(est, gt, align=False) > 1.0


def test_rpe(rng):
    gt = np.cumsum(rng.normal(0, 0.3, (30, 3)), axis=0)
    est = gt + rng.normal(0, 0.01, gt.shape)
    assert rpe_translation(est, gt, delta=1) < 0.05


def test_load_kf_poses_roundtrip(tmp_path):
    p = tmp_path / "out_kf_poses.txt"
    p.write_text("0 1.0 2.0 3.0 0.1 0.2 0.3\n1 4.0 5.0 6.0 0 0 0\n")
    xyz = load_kf_poses(str(p))
    np.testing.assert_array_equal(xyz, [[1, 2, 3], [4, 5, 6]])
