import numpy as np
import jax.numpy as jnp

from srba_slam_tpu.ops.window_ba import BAWindow, optimize_window
from srba_slam_tpu.utils import se3_np
from srba_slam_tpu.utils.camera import StereoCamera

CAM = StereoCamera.kitti()


def _make_window(rng, n_cams=4, n_lms=60, C=8, L=128, O=512,
                 pose_noise=0.02, lm_noise=0.05, px_noise=0.0):
    """Cameras on a line looking +z at a landmark cloud; each camera observes
    every landmark (if in front). Returns (window, gt_cam, gt_lm)."""
    gt_cam = np.zeros((n_cams, 6), np.float64)
    for i in range(1, n_cams):
        gt_cam[i] = gt_cam[i - 1] + np.array(
            [0.002 * rng.normal(), 0.002 * rng.normal(), 0.002 * rng.normal(),
             0.1 * rng.normal(), 0.05 * rng.normal(), 0.8]
        )
    lms_world = np.stack([
        rng.uniform(-8, 8, n_lms), rng.uniform(-2, 2, n_lms),
        rng.uniform(8, 30, n_lms) + 0.8 * (n_cams - 1),
    ], -1)
    lm_base = rng.integers(0, n_cams, n_lms)
    # landmark in base frame
    lm_pos = np.stack([
        se3_np.transform_point(se3_np.inverse(gt_cam[b]), p)
        for b, p in zip(lm_base, lms_world)
    ])
    obs_cam, obs_lm, obs_px = [], [], []
    for c in range(n_cams):
        for l in range(n_lms):
            pc = se3_np.transform_point(se3_np.inverse(gt_cam[c]), lms_world[l])
            if pc[2] < 1.0:
                continue
            ul = CAM.cx_l + CAM.fx_l * pc[0] / pc[2]
            vl = CAM.cy_l + CAM.fy_l * pc[1] / pc[2]
            ur = CAM.cx_r + CAM.fx_r * (pc[0] - CAM.baseline) / pc[2]
            obs_cam.append(c)
            obs_lm.append(l)
            obs_px.append([ul, vl, ur])
    obs_px = np.asarray(obs_px) + rng.normal(0, px_noise, (len(obs_px), 3))

    cam_pose = np.zeros((C, 6), np.float32)
    cam_pose[:n_cams] = gt_cam
    # perturb all but root
    cam_pose[1:n_cams] += rng.normal(0, pose_noise, (n_cams - 1, 6))
    lm_arr = np.zeros((L, 3), np.float32)
    lm_arr[:n_lms] = lm_pos + rng.normal(0, lm_noise, (n_lms, 3))
    lm_base_arr = np.zeros(L, np.int32)
    lm_base_arr[:n_lms] = lm_base
    oc = np.zeros(O, np.int32)
    ol = np.zeros(O, np.int32)
    op = np.zeros((O, 3), np.float32)
    ov = np.zeros(O, bool)
    n_o = len(obs_cam)
    oc[:n_o] = obs_cam
    ol[:n_o] = obs_lm
    op[:n_o] = obs_px
    ov[:n_o] = True
    win = BAWindow(
        cam_pose=jnp.asarray(cam_pose),
        cam_valid=jnp.asarray(np.arange(C) < n_cams),
        lm_pos=jnp.asarray(lm_arr),
        lm_base=jnp.asarray(lm_base_arr),
        lm_valid=jnp.asarray(np.arange(L) < n_lms),
        obs_cam=jnp.asarray(oc),
        obs_lm=jnp.asarray(ol),
        obs_px=jnp.asarray(op),
        obs_valid=jnp.asarray(ov),
    )
    return win, gt_cam, lm_pos


def test_ba_converges_to_ground_truth(rng):
    win, gt_cam, gt_lm = _make_window(rng)
    res = optimize_window(win, CAM, kernel_param=1.5, max_iters=15)
    assert float(res.cost_final) < float(res.cost_init) * 1e-3
    assert float(res.obs_rmse) < 0.05
    est = np.asarray(res.cam_pose)[: len(gt_cam)]
    np.testing.assert_allclose(est, gt_cam, atol=5e-3)


def test_ba_with_pixel_noise(rng):
    win, gt_cam, gt_lm = _make_window(rng, px_noise=0.5)
    res = optimize_window(win, CAM, max_iters=15)
    est = np.asarray(res.cam_pose)[: len(gt_cam)]
    # translations within a few cm despite 0.5px noise
    np.testing.assert_allclose(est[:, 3:], gt_cam[:, 3:], atol=0.05)
    assert float(res.obs_rmse) < 1.0


def test_ba_root_is_fixed(rng):
    win, gt_cam, _ = _make_window(rng)
    res = optimize_window(win, CAM, max_iters=8)
    np.testing.assert_array_equal(np.asarray(res.cam_pose)[0], np.asarray(win.cam_pose)[0])


def test_ba_robust_to_outlier_observations(rng):
    win, gt_cam, _ = _make_window(rng, px_noise=0.3)
    op = np.asarray(win.obs_px).copy()
    ov = np.asarray(win.obs_valid)
    n_o = int(ov.sum())
    bad = rng.choice(n_o, n_o // 10, replace=False)
    op[bad] += rng.uniform(40, 150, (len(bad), 3))
    win = win._replace(obs_px=jnp.asarray(op))
    res = optimize_window(win, CAM, kernel_param=1.5, max_iters=15)
    est = np.asarray(res.cam_pose)[: len(gt_cam)]
    np.testing.assert_allclose(est[:, 3:], gt_cam[:, 3:], atol=0.08)


def test_ba_ignores_padding(rng):
    win, gt_cam, _ = _make_window(rng)
    # poison padded entries; result must be unchanged
    op = np.asarray(win.obs_px).copy()
    ov = np.asarray(win.obs_valid)
    op[~ov] = 1e6
    lm = np.asarray(win.lm_pos).copy()
    lm[int(win.lm_valid.sum()):] = 1e6
    win2 = win._replace(obs_px=jnp.asarray(op), lm_pos=jnp.asarray(lm))
    r1 = optimize_window(win, CAM, max_iters=6)
    r2 = optimize_window(win2, CAM, max_iters=6)
    np.testing.assert_allclose(
        np.asarray(r1.cam_pose), np.asarray(r2.cam_pose), atol=1e-5
    )
