"""Trajectory evaluation: ATE / RPE against ground truth.

The reference only *emits* ``out_kf_poses.txt`` for external evaluation
(src/CSRBAStereoSLAMEstimator.cpp:977-987); the metric named in BASELINE.json
(ATE RMSE on KITTI) needs in-repo tooling, so it lives here: Umeyama/Horn
SE(3) alignment + absolute trajectory error and relative pose error, plus a
loader for the ``kf x y z yaw pitch roll`` trajectory format.
"""

from __future__ import annotations

import numpy as np


def load_kf_poses(path: str) -> np.ndarray:
    """Read an out_kf_poses.txt file -> positions [N, 3]."""
    rows = np.loadtxt(path).reshape(-1, 7)
    return rows[:, 1:4]


def align_se3(est: np.ndarray, gt: np.ndarray):
    """Horn/Umeyama closed-form rigid alignment (no scale): returns (R, t)
    minimizing || (R est + t) - gt ||."""
    mu_e = est.mean(0)
    mu_g = gt.mean(0)
    H = (est - mu_e).T @ (gt - mu_g)
    U, _, Vt = np.linalg.svd(H)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ S @ U.T
    t = mu_g - R @ mu_e
    return R, t


def ate_rmse(est_xyz: np.ndarray, gt_xyz: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error RMSE (positions, optional SE(3) alignment)."""
    est = np.asarray(est_xyz, np.float64)
    gt = np.asarray(gt_xyz, np.float64)
    assert est.shape == gt.shape
    if align and len(est) >= 3:
        R, t = align_se3(est, gt)
        est = est @ R.T + t
    return float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=1))))


def rpe_translation(est_xyz: np.ndarray, gt_xyz: np.ndarray, delta: int = 1):
    """Relative pose error over `delta`-step windows (translation drift)."""
    est = np.asarray(est_xyz, np.float64)
    gt = np.asarray(gt_xyz, np.float64)
    d_est = est[delta:] - est[:-delta]
    d_gt = gt[delta:] - gt[:-delta]
    err = np.linalg.norm(d_est - d_gt, axis=1)
    return float(np.sqrt(np.mean(err**2)))
