"""debug=true emits the reference's full golden-file artifact family.

The reference's primary QA mechanism (SURVEY.md §4) is its debug dumps:
per-KF keypoints/matches (CStereoSLAMKF::saveInfoToFiles), raw inter-frame
matches (``if_raw_match*``, /root/reference/src/CSRBAStereoSLAMEstimator.cpp:
1455-1473), post-filter matches with per-match status (``if_match_after*``,
:1649-1721), ID-propagation distances (``da_dist*``, :566-616), change-in-
pose outliers (``posechange_outliers*``, :2236-2251) and DA summaries
(``da_info*``). A debug=true run must produce every family so runs are
cross-comparable with the reference implementation.
"""

import glob
import os

import numpy as np

from srba_slam_tpu.config import (
    GeneralOptions, SRBAStereoSLAMOptions, VOOptions,
)
from srba_slam_tpu.models.estimator import SRBAStereoSLAMEstimator
from srba_slam_tpu.utils.framesource import SyntheticSource

from tests.test_estimator import small_cam


def _make_debug_estimator(tmp_path, n_feats=256):
    cam = small_cam()
    opts = SRBAStereoSLAMOptions(
        orb_adaptive_fast_th=True,
        camera=cam, n_feats=n_feats, detect_fast_th=12,
        adaptive_th_min_matches=40, max_translation=0.5, max_rotation=10.0,
        updated_matches_th=40, vo_id_tracking_th=30, srba_submap_size=5,
        srba_max_optimize_depth=3,
        da_filter_by_direction=False, residual_th=10.0,
    )
    est = SRBAStereoSLAMEstimator(
        GeneralOptions(debug=True, out_dir=str(tmp_path)),
        opts, VOOptions(fast_th=12, n_feats=n_feats),
        capacity=256, max_kfs=64,
    )
    est.initialize()
    return est


def _check_artifacts(est, dbg):
    n_kfs = est.store.n_kfs
    assert n_kfs >= 3

    fam = {
        name: sorted(glob.glob(os.path.join(dbg, name + "*")))
        for name in ("kf_", "da_info_", "if_raw_match_", "if_match_after_",
                     "da_dist_", "posechange_outliers_")
    }
    for name, files in fam.items():
        assert files, f"debug=true produced no {name}* artifacts"

    # if_raw_match / if_match_after: per (this_kf, other_kf) pair; headers
    # and row shapes match the reference formats
    raw = fam["if_raw_match_"][0]
    with open(raw) as f:
        lines = f.read().splitlines()
    assert lines[0] == "% OTHER_LX OTHER_LY THIS_LX THIS_LY DISTANCE"
    assert len(lines) > 1 and len(lines[1].split()) == 5
    after = fam["if_match_after_"][0]
    with open(after) as f:
        lines = f.read().splitlines()
    assert lines[0] == "%STATUS THIS_LU THIS_LV OTHER_LU OTHER_LV DISTANCE"
    stats = {int(l.split()[0]) for l in lines[1:]}
    assert stats and stats <= set(range(7))  # reference status enum values
    # the raw file for the same pair has the same row count (same raw
    # match set, pre- vs post-filter views)
    pair = os.path.basename(after).replace("if_match_after_", "")
    raw_same = os.path.join(dbg, "if_raw_match_" + pair)
    assert os.path.exists(raw_same)
    assert len(open(raw_same).read().splitlines()) == len(lines)

    # da_dist: one per INSERTED keyframe past the first; one row per stereo
    # match, tracked rows carry the winning distance, new features 0.00
    dd = fam["da_dist_"][0]
    kf_id = int(os.path.basename(dd)[len("da_dist_kf"):-4])
    vals = np.loadtxt(dd, ndmin=1)
    n_matches = int((est.store.match_ids[kf_id] >= 0).sum())
    assert len(vals) == n_matches
    assert (vals >= 0).all()

    # posechange_outliers: rows are "idx residual" with residual above the
    # configured threshold (file may legitimately be empty)
    rows = [l.split() for f in fam["posechange_outliers_"]
            for l in open(f).read().splitlines()]
    for r in rows:
        assert len(r) == 2 and float(r[1]) > est.opts.residual_th


def test_debug_artifact_family_per_frame(tmp_path):
    """Per-frame stepping (the synchronous query_and_associate path)."""
    cam = small_cam()
    frames = list(SyntheticSource(cam, n_frames=22, seed=11, step=0.12))
    est = _make_debug_estimator(tmp_path)
    for l, r in frames:
        est.step(l, r)
    est.rba.flush()
    _check_artifacts(est, os.path.join(str(tmp_path), "debug"))


def test_debug_artifact_family_batched(tmp_path):
    """Batched mode (deferred checks through fused_checks_batch) emits the
    same artifact families."""
    cam = small_cam()
    frames = list(SyntheticSource(cam, n_frames=22, seed=11, step=0.12))
    est = _make_debug_estimator(tmp_path)
    est.perform_stereo_slam_batched(frames, batch=6)
    est.rba.flush()
    _check_artifacts(est, os.path.join(str(tmp_path), "debug"))
