"""Behavioral tests for the previously parse-only config keys: from_step,
save_state_to_file / load_state_from_file / state_file,
srba_use_robust_kernel_stage1, ransac_fit_prob, pause_at_each_iteration
(≙ reference src/srba-stereo-slam_utils.h:92-106, 157-165, 276;
src/CSRBAStereoSLAMEstimator.cpp:56-70, 1159, 2043)."""

import os

import numpy as np
import pytest

from srba_slam_tpu.config import (
    GeneralOptions, IniFile, SRBAStereoSLAMOptions, VOOptions,
)
from srba_slam_tpu.models.estimator import SRBAStereoSLAMEstimator
from srba_slam_tpu.ops.ransac import hypotheses_for_prob
from srba_slam_tpu.utils.camera import StereoCamera
from srba_slam_tpu.utils.framesource import SyntheticSource


def small_cam():
    return StereoCamera(
        fx_l=180.0, fy_l=180.0, cx_l=160.0, cy_l=100.0,
        fx_r=180.0, fy_r=180.0, cx_r=160.0, cy_r=100.0,
        baseline=0.54, width=320, height=200,
    )


def make_estimator(**gen_kw):
    cam = small_cam()
    opts = SRBAStereoSLAMOptions(
        camera=cam, n_feats=256, detect_fast_th=12,
        adaptive_th_min_matches=40, max_translation=0.5, max_rotation=10.0,
        updated_matches_th=40, vo_id_tracking_th=30, srba_submap_size=5,
        srba_max_optimize_depth=3, da_filter_by_direction=False,
        residual_th=10.0,
    )
    est = SRBAStereoSLAMEstimator(
        GeneralOptions(**gen_kw), opts, VOOptions(fast_th=12, n_feats=256),
        capacity=256, max_kfs=64,
    )
    est.initialize()
    return est


def test_state_file_mutual_exclusion():
    """≙ utils.h:157-165: save_state_to_file forces load_state_from_file off."""
    cfg = IniFile(
        "[APP_OPTIONS]\nsave_state_to_file=true\nload_state_from_file=true\n"
        "state_file=/tmp/x.npz\n", is_text=True)
    gen = GeneralOptions.from_config(cfg)
    assert gen.save_state_to_file is True
    assert gen.load_state_from_file is False
    cfg2 = IniFile(
        "[APP_OPTIONS]\nsave_state_to_file=false\nload_state_from_file=true\n",
        is_text=True)
    gen2 = GeneralOptions.from_config(cfg2)
    assert gen2.load_state_from_file is True


def test_from_step_skips_frames():
    """≙ the from_step skip loop (reference .cpp:64-70): the first processed
    frame is frame ``from_step``; skipped frames still advance the counter so
    to_step stays absolute."""
    src = list(SyntheticSource(small_cam(), n_frames=10, seed=11, step=0.12))
    est = make_estimator(from_step=4)
    log = est.perform_stereo_slam(iter(src))
    assert log[0].frame_idx == 4, "first processed frame must be from_step"
    assert est.frame_idx == 9
    # a from_step=0 run processes from frame 0
    est0 = make_estimator()
    log0 = est0.perform_stereo_slam(iter(src))
    assert log0[0].frame_idx == 0
    # batched mode honors it identically
    estb = make_estimator(from_step=4)
    logb = estb.perform_stereo_slam_batched(iter(src), batch=3)
    assert logb[0].frame_idx == 4
    assert [r.frame_idx for r in logb] == [r.frame_idx for r in log]


def test_ransac_fit_prob_maps_to_hypotheses():
    """≙ ransac_fit_prob -> cv::findFundamentalMat iteration count
    (reference .cpp:2043): higher confidence = more hypotheses, bucketed to
    powers of two, capped."""
    assert hypotheses_for_prob(0.95) == 64
    assert hypotheses_for_prob(0.99) == 128
    assert hypotheses_for_prob(1.0 - 1e-12) == 512  # cap
    assert hypotheses_for_prob(0.99) > hypotheses_for_prob(0.95)
    est = make_estimator()
    assert est._ransac_n_hyp == hypotheses_for_prob(est.opts.ransac_fit_prob)
    est.opts.ransac_fit_prob = 0.9999
    est.initialize()
    assert est._ransac_n_hyp == hypotheses_for_prob(0.9999)
    assert est._ransac_n_hyp > hypotheses_for_prob(0.95)


def test_stage1_kernel_flag_reaches_engine():
    """srba_use_robust_kernel_stage1 must reach SRBAParams (and from there
    the window program's stage-1 static flag)."""
    est = make_estimator()
    assert est.rba.p.use_robust_kernel_stage1 is True
    est.opts.srba_use_robust_kernel_stage1 = False
    est.initialize()
    assert est.rba.p.use_robust_kernel_stage1 is False


def test_anchor_prior_weights_reach_engine():
    cfg = IniFile(
        "[SRBA_GENERAL]\nanchor_prior_w_rot=7.0\nanchor_prior_w_trans=3.0\n",
        is_text=True)
    opts = SRBAStereoSLAMOptions.from_config(cfg)
    assert opts.anchor_prior_w_rot == 7.0
    assert opts.anchor_prior_w_trans == 3.0
    est = make_estimator()
    est.opts.anchor_prior_w_rot = 7.0
    est.opts.anchor_prior_w_trans = 3.0
    est.initialize()
    assert est.rba.p.anchor_prior_w_rot == 7.0
    assert est.rba.p.anchor_prior_w_trans == 3.0


def test_state_file_keys_drive_checkpoint(tmp_path):
    """save_state_to_file/state_file actually persist state; a second run
    with load_state_from_file restores it (≙ the reference's designed-but-
    disabled state stream, utils.h:103-104 / .cpp:2264-2407)."""
    from srba_slam_tpu.utils.checkpoint import load_state, save_state

    src = list(SyntheticSource(small_cam(), n_frames=8, seed=11, step=0.12))
    state = str(tmp_path / "state.npz")
    est = make_estimator(save_state_to_file=True, state_file=state)
    est.perform_stereo_slam(iter(src))
    # what __main__ does when save_state_to_file is set
    assert est.general.save_state_to_file and est.general.state_file
    save_state(est, est.general.state_file)
    assert os.path.exists(state)

    est2 = make_estimator(load_state_from_file=True, state_file=state)
    assert est2.general.load_state_from_file and est2.general.state_file
    load_state(est2, est2.general.state_file)
    assert est2.store.n_kfs == est.store.n_kfs
    np.testing.assert_allclose(
        est2.rba.kf_global[: est2.store.n_kfs],
        est.rba.kf_global[: est.store.n_kfs])


def test_no_parsed_but_dead_keys():
    """Every key the config parser reads must be consumed somewhere outside
    config.py (grep-clean contract from the round-2 review)."""
    import re
    import subprocess

    cfg_src = open("srba_slam_tpu/config.py").read()
    keys = set(re.findall(r'read_\w+\([^,]+,\s*"(\w+)"', cfg_src))
    # the IF-MATCH windowed-search extents are parsed for config compat but
    # ignored BY DESIGN: the reference forces brute-force inter-frame
    # matching (ifmDescBF, reference .cpp:1137), which bypasses the windowed
    # search those keys configure
    keys -= {"window_width", "window_height"}
    # attribute name == key name for all but a handful of renames
    renames = {"grabber_type": "cap_src", "nOctaves": "n_octaves"}
    dead = []
    for key in sorted(keys):
        attr = renames.get(key, key)
        out = subprocess.run(
            ["grep", "-r", "-l", "--include=*.py", attr, "srba_slam_tpu"],
            capture_output=True, text=True).stdout.splitlines()
        consumers = [f for f in out if not f.endswith("config.py")]
        if not consumers:
            dead.append(key)
    assert not dead, f"parsed-but-dead config keys: {dead}"
