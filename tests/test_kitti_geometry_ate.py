"""Trajectory-quality regression at the reference's canonical benchmark
geometry: 1226x370 px, KITTI calibration, 500-feature budget, 0.8 m/frame —
exactly the workload bench.py measures throughput on (≙ the KITTI seq-00
run config, reference demo/config_imgdir_kitti_srba.ini:84-155). Drives the
batched pipeline over 60 frames (48 m) of the synthetic ground-plane world
and gates the SE(3)-aligned ATE-RMSE of the keyframe trajectory.

Measured values (CPU, 8-bit frames, street scene): ~12 keyframes, ATE
~0.02-0.1 m over a 48 m path (~0.1-0.2%).
"""

import numpy as np
import pytest

from srba_slam_tpu.config import GeneralOptions, SRBAStereoSLAMOptions, VOOptions
from srba_slam_tpu.models.estimator import SRBAStereoSLAMEstimator
from srba_slam_tpu.utils.camera import StereoCamera
from srba_slam_tpu.utils.evaluation import ate_rmse
from srba_slam_tpu.utils.framesource import SyntheticSource


@pytest.mark.slow
def test_kitti_geometry_trajectory_ate():
    cam = StereoCamera.kitti()
    src = SyntheticSource(cam, n_frames=60, seed=11, step=0.8, scene="street")
    frames = list(src)
    opts = SRBAStereoSLAMOptions(
        orb_adaptive_fast_th=True,
        camera=cam, n_feats=500, detect_fast_th=20,
        adaptive_th_min_matches=100, max_translation=2.0, max_rotation=25.0,
        updated_matches_th=60, vo_id_tracking_th=40,
        srba_submap_size=10, srba_max_tree_depth=4, srba_max_optimize_depth=5,
        srba_kernel_param=1.5, da_filter_by_direction=True,  # reference
        # parity: the canonical KITTI config enables the direction filter
        # (demo/config_imgdir_kitti_srba.ini:124); round-3 fixed the
        # binning to the reference's stacked-image slope so it no longer
        # starves forward motion
        residual_th=30.0,
    )
    est = SRBAStereoSLAMEstimator(
        GeneralOptions(), opts, VOOptions(fast_th=20, n_feats=500),
        capacity=512, max_kfs=128,
    )
    est.initialize()
    est.perform_stereo_slam_batched(frames, batch=15)
    est.rba.flush()

    n = est.store.n_kfs
    assert n >= 10, n  # ~4 m keyframe spacing over 48 m
    kf_frames = [r.frame_idx for r in est.step_log if r.inserted_kf is not None]
    gt = src.gt_poses[kf_frames][:, 3:]
    ate = ate_rmse(est.rba.kf_global[:n, 3:], gt, align=True)
    assert ate < 0.5, ate  # ~1% of the 48 m path

    est.finalize()
    ate_post = ate_rmse(est.final_poses_cam[:, 3:], gt, align=True)
    assert ate_post < 0.5, ate_post
