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


def test_evaluate_files_kitti_gt(tmp_path):
    """The standalone ATE tool (python -m srba_slam_tpu.utils.evaluation):
    out_kf_poses.txt + kf_frames.txt sidecar vs a per-frame KITTI-format
    poses.txt — the one-command ATE check of BASELINE.json's criterion."""
    from srba_slam_tpu.utils.evaluation import evaluate_files, main

    rng = np.random.default_rng(3)
    n_frames, kf_frames = 40, [0, 5, 11, 18, 26, 33, 39]
    gt = np.cumsum(rng.normal(0, 0.3, (n_frames, 3)), axis=0)
    # KITTI poses.txt: flattened 3x4 [R|t] per frame (identity rotations)
    kitti = np.zeros((n_frames, 12))
    kitti[:, 0] = kitti[:, 5] = kitti[:, 10] = 1.0
    kitti[:, (3, 7, 11)] = gt
    np.savetxt(tmp_path / "poses.txt", kitti)
    # estimated trajectory = gt at the KF frames under a rigid transform
    R, _ = se3_np.exp(np.array([0.05, -0.1, 0.2, 0, 0, 0]))
    est_xyz = gt[kf_frames] @ R.T + np.array([2.0, 1.0, -3.0])
    with open(tmp_path / "out_kf_poses.txt", "w") as f:
        for i, p in enumerate(est_xyz):
            f.write(f"{i} {p[0]} {p[1]} {p[2]} 0 0 0\n")
    with open(tmp_path / "kf_frames.txt", "w") as f:
        for i, fr in enumerate(kf_frames):
            f.write(f"{i} {fr}\n")
    out = evaluate_files(str(tmp_path / "out_kf_poses.txt"),
                         str(tmp_path / "poses.txt"))  # sidecar auto-found
    assert out["n"] == len(kf_frames)
    assert out["ate_rmse"] < 1e-6  # rigid transform aligns out exactly
    # CLI entry prints one JSON line
    import contextlib
    import io
    import json

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main([str(tmp_path / "out_kf_poses.txt"),
                     str(tmp_path / "poses.txt")]) == 0
    rec = json.loads(buf.getvalue())
    assert rec["n_poses"] == len(kf_frames)
    # keyframe-indexed (7-column) ground truth needs no sidecar
    np.savetxt(tmp_path / "gt7.txt",
               np.hstack([np.arange(len(est_xyz))[:, None], est_xyz,
                          np.zeros((len(est_xyz), 3))]))
    out7 = evaluate_files(str(tmp_path / "out_kf_poses.txt"),
                          str(tmp_path / "gt7.txt"))
    assert out7["ate_rmse"] < 1e-9


def _distort_frames(frames, fx, fy, cx, cy, k1):
    """Synthesize raw-camera captures: for each DISTORTED pixel, Newton-invert
    the radial model to find the ideal ray and sample the clean render there."""
    h, w = frames[0][0].shape
    us, vs = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    xd = (us - cx) / fx
    yd = (vs - cy) / fy
    x, y = xd.copy(), yd.copy()
    for _ in range(10):
        rad = 1.0 + k1 * (x * x + y * y)
        x, y = xd / rad, yd / rad
    mu = np.clip(x * fx + cx, 0, w - 1.001)
    mv = np.clip(y * fy + cy, 0, h - 1.001)
    u0 = np.floor(mu).astype(np.int64); v0 = np.floor(mv).astype(np.int64)
    fu = mu - u0; fv = mv - v0

    def warp(img):
        img = np.asarray(img, np.float64)
        return (img[v0, u0] * (1 - fv) * (1 - fu)
                + img[v0, np.minimum(u0 + 1, w - 1)] * (1 - fv) * fu
                + img[np.minimum(v0 + 1, h - 1), u0] * fv * (1 - fu)
                + img[np.minimum(v0 + 1, h - 1), np.minimum(u0 + 1, w - 1)]
                * fv * fu).astype(np.float32)

    return [(warp(l), warp(r)) for (l, r) in frames]


def test_rectify_wired_into_pipeline(rng):
    """RECTIFY stage wiring (≙ stereo-vo rectification for
    rectified_images=false rigs): a distorted-camera sequence breaks the
    unrectified pipeline's trajectory; with the undistortion maps built from
    the configured dist coefficients it matches the clean-camera baseline."""
    from srba_slam_tpu.config import (GeneralOptions, SRBAStereoSLAMOptions,
                                      VOOptions)
    from srba_slam_tpu.models.estimator import SRBAStereoSLAMEstimator
    from srba_slam_tpu.utils.camera import StereoCamera
    from srba_slam_tpu.utils.framesource import SyntheticSource

    cam = StereoCamera(
        fx_l=180.0, fy_l=180.0, cx_l=160.0, cy_l=100.0,
        fx_r=180.0, fy_r=180.0, cx_r=160.0, cy_r=100.0,
        baseline=0.54, width=320, height=200,
    )
    src = SyntheticSource(cam, n_frames=12, seed=11, step=0.12)
    clean = list(src)
    k1 = -0.22
    distorted = _distort_frames(clean, cam.fx_l, cam.fy_l, cam.cx_l,
                                cam.cy_l, k1)
    gt = src.gt_poses

    def run(frames, rectify):
        opts = SRBAStereoSLAMOptions(
            orb_adaptive_fast_th=True,
            camera=cam, n_feats=256, detect_fast_th=12,
            adaptive_th_min_matches=40, max_translation=0.5,
            max_rotation=10.0, updated_matches_th=40, vo_id_tracking_th=30,
            srba_submap_size=5, srba_max_optimize_depth=3,
            da_filter_by_direction=False, residual_th=10.0,
            camera_dist_l=[k1, 0, 0, 0, 0] if rectify else [0.0] * 5,
            camera_dist_r=[k1, 0, 0, 0, 0] if rectify else [0.0] * 5,
        )
        vo = VOOptions(fast_th=12, n_feats=256,
                       rectified_images=not rectify)
        est = SRBAStereoSLAMEstimator(GeneralOptions(), opts, vo,
                                      capacity=256, max_kfs=32)
        est.initialize()
        log = est.perform_stereo_slam(frames)
        est.finalize()
        kf_frames = [r.frame_idx for r in log if r.inserted_kf is not None]
        err = ate_rmse(est.final_poses_cam[:, 3:], gt[kf_frames][:, 3:],
                       align=True)
        return est, err

    est_clean, ate_clean = run(clean, rectify=False)
    assert est_clean.vo.rect_maps is None
    est_rect, ate_rect = run(distorted, rectify=True)
    assert est_rect.vo.rect_maps is not None
    est_raw, ate_raw = run(distorted, rectify=False)

    assert ate_clean < 0.05, ate_clean
    # rectified pipeline on distorted input recovers the clean baseline
    assert ate_rect < max(2.5 * ate_clean, 0.06), (ate_rect, ate_clean)
    # running distorted pixels unrectified visibly damages the trajectory
    assert ate_raw > 2.0 * ate_rect, (ate_raw, ate_rect)
