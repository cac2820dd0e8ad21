"""Long-trajectory + loop-closure regression with an ATE gate.

A 220-frame, 2.25-lap closed circuit over the textured ground plane
(~26 m path, ~28 keyframes, 5+ submaps): the batched pipeline must confirm
at least two DISTINCT loop-closure events (lap-1 closure + lap-2
re-crossing), create geometric long-range edges, and keep the aligned
ATE-RMSE under the gate. Pins the submap edge-creation policy, the
BoW+DA loop-closure path (with spanning-tree pose seeding), the geometric
LC-edge initialization, and the windowed BA write-back end to end.

Measured values (CPU, 8-bit frames, this config): best LC edges within
0.15-0.25 m of ground truth, ATE under the 0.55 m gate, ~50 s wall.
"""

import numpy as np
import pytest

from srba_slam_tpu.config import GeneralOptions, SRBAStereoSLAMOptions, VOOptions
from srba_slam_tpu.models.estimator import SRBAStereoSLAMEstimator
from srba_slam_tpu.utils import se3_np
from srba_slam_tpu.utils.camera import StereoCamera
from srba_slam_tpu.utils.evaluation import ate_rmse
from srba_slam_tpu.utils.framesource import SyntheticSource


@pytest.mark.slow
def test_circuit_loop_closure_ate():
    cam = StereoCamera(
        fx_l=160.0, fy_l=160.0, cx_l=128.0, cy_l=72.0,
        fx_r=160.0, fy_r=160.0, cx_r=128.0, cy_r=72.0,
        baseline=0.5, width=256, height=144,
    )
    # 2.25 laps: the second lap re-enters already-closed territory, so the
    # pipeline must confirm (at least) two distinct loop-closure events —
    # once when lap 1 closes, once when lap 2 re-crosses the start area
    src = SyntheticSource(cam, n_frames=220, seed=5, step=0.12, loop=True,
                          scene="ground", laps=2.25)
    frames = list(src)
    opts = SRBAStereoSLAMOptions(
        orb_adaptive_fast_th=True,
        camera=cam, n_feats=192, detect_fast_th=10,
        adaptive_th_min_matches=40, max_translation=0.8, max_rotation=15.0,
        updated_matches_th=35, vo_id_tracking_th=30, srba_submap_size=5,
        srba_max_tree_depth=4, srba_max_optimize_depth=4,
        da_filter_by_direction=False, residual_th=10.0, lc_distance=4,
        # DEFAULT vocabulary (voc_train_frames=8): the tiled ground plane is
        # REPEATING texture, and the richer multi-frame vocabulary retrieves
        # more same-texture candidates whose aliased DA consensuses would
        # seed geometrically wrong long-range edges (~1-1.8 m). Until round
        # 5 this test had to pin voc_train_frames=1; the loop-closure
        # validator (SRBAParams.lc_validate: odometry-consistency gate +
        # post-solve rollback + odometry-seeded recovery) now defends the
        # default configuration on this degenerate world, which is exactly
        # what this test pins.
    )
    est = SRBAStereoSLAMEstimator(
        GeneralOptions(), opts, VOOptions(fast_th=10, n_feats=192),
        capacity=192, max_kfs=96,
    )
    est.initialize()
    est.perform_stereo_slam_batched(frames, batch=10)
    est.rba.flush()

    log = est.step_log
    kf_frames = [r.frame_idx for r in log if r.inserted_kf is not None]
    gtp = src.gt_poses
    n = est.store.n_kfs

    # scale: hundreds of frames, multiple submaps
    assert n >= 25, n
    assert n // opts.srba_submap_size >= 5, "expected >= 5 submaps"

    # at least two confirmed loop closures
    lcs = [r for r in log if r.loop_closure_with is not None]
    assert len(lcs) >= 2, [(r.frame_idx, r.loop_closure_with) for r in lcs]

    # long-range (loop-closure) edges exist and are geometric, not
    # drift-consistent: compare each against the ground-truth relative pose
    r = est.rba
    long_edges = []
    for e in range(r.n_edges):
        u, v = int(r.edge_u[e]), int(r.edge_v[e])
        if abs(u - v) > 6:
            gt_rel = se3_np.relative(gtp[kf_frames[v]], gtp[kf_frames[u]])
            long_edges.append(np.linalg.norm(r.edge_pose[e][3:] - gt_rel[3:]))
    assert len(long_edges) >= 2, long_edges
    # at least two closures must be geometric-quality (a drift-consistent
    # seed would be off by the accumulated loop drift, ~1 m+); weaker
    # cross-circle edges from partially-shared ground features are fine —
    # the robust kernel + the ATE gate below arbitrate those
    assert sorted(long_edges)[1] < 0.5, long_edges

    # ATE gate (aligned, keyframe-associated ground truth); circuit is
    # ~6.7 m across / ~26 m long
    gt = gtp[kf_frames][:, 3:]
    ate_pre = ate_rmse(r.kf_global[:n, 3:], gt, align=True)
    est.finalize()
    ate_post = ate_rmse(est.final_poses_cam[:, 3:], gt, align=True)
    assert ate_pre < 0.55, ate_pre
    assert ate_post < 0.55, ate_post
