"""End-to-end with the UNMODIFIED reference demo config + vocabulary."""

import os

import numpy as np
import pytest

from srba_slam_tpu.models.estimator import SRBAStereoSLAMEstimator
from srba_slam_tpu.utils.framesource import SyntheticSource

KITTI_INI = "/root/reference/demo/config_imgdir_kitti_srba.ini"
VOC = "/root/reference/demo/voc.yml.gz"


@pytest.mark.skipif(not os.path.exists(KITTI_INI), reason="reference absent")
def test_reference_kitti_config_drives_full_pipeline(tmp_path):
    est = SRBAStereoSLAMEstimator.from_config(KITTI_INI, capacity=512,
                                              max_kfs=32)
    # the config's voc_filename is relative to the demo dir; point it at the
    # real file (the reference app is also run from the demo directory)
    est.opts.voc_filename = VOC
    est.general.out_dir = str(tmp_path)
    est.general.debug = False
    est.general.show3D = False
    est.initialize()
    # the reference 32273-word vocabulary must have loaded
    assert est.bow is not None and est.bow.voc.n_words == 32273
    assert est.cam.width == 1226 and est.cam.height == 370
    assert est.opts.srba_submap_size == 10 and est.opts.srba_max_tree_depth == 4

    src = SyntheticSource(est.cam, n_frames=4, seed=5, step=1.0)
    for left, right in src:
        est.step(left, right)
    assert est.store.n_kfs >= 1
    assert est.bow.n_kfs == est.store.n_kfs
    # BoW retrieval against the reference vocabulary works end-to-end
    frame = est.vo.last_frame()
    scores, ids = est.bow.query(frame.desc_l, frame.m_valid)
    assert ids[0] >= 0 and scores[0] > 0
    poses = est.finalize(out_dir=str(tmp_path))
    assert os.path.exists(tmp_path / "out_kf_poses.txt")
