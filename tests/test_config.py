import textwrap

from srba_slam_tpu.config import IniFile, GeneralOptions, SRBAStereoSLAMOptions, VOOptions
from srba_slam_tpu.utils.thresholds import update_rotation_threshold, update_translation_threshold

KITTI_INI = "/root/reference/demo/config_imgdir_kitti_srba.ini"


def test_parse_reference_kitti_config():
    cfg = IniFile(KITTI_INI)
    gen = GeneralOptions.from_config(cfg)
    srba = SRBAStereoSLAMOptions.from_config(cfg)
    vo = VOOptions.from_config(cfg)

    assert gen.max_num_kfs == 500
    assert gen.cap_src == "image_dir"
    assert gen.left_format == "image_0%06d.png"
    assert gen.end_index == 1100
    assert gen.debug is True

    assert srba.srba_max_tree_depth == 4
    assert srba.srba_max_optimize_depth == 5
    assert srba.srba_submap_size == 10
    assert srba.srba_kernel_param == 1.5
    assert srba.n_feats == 500
    assert srba.detect_fast_th == 20
    assert srba.da_stage2_method == 3
    assert srba.residual_th == 30.0
    assert srba.max_orb_distance_da == 60.0
    assert srba.max_y_diff_epipolar == 2.0
    assert srba.max_rotation == 25.0
    assert srba.max_translation == 2.0
    assert srba.updated_matches_th == 60
    assert srba.up_matches_th_plus == 25
    assert srba.lc_distance == 10
    assert srba.vo_id_tracking_th == 40
    assert srba.use_initial_pose is True
    assert srba.da_filter_by_direction is True

    cam = srba.camera
    assert cam.width == 1226 and cam.height == 370
    assert abs(cam.fx_l - 707.0912) < 1e-6
    assert abs(cam.cx_l - 601.8873) < 1e-6
    assert abs(cam.baseline - 0.54) < 1e-9

    assert vo.n_octaves == 1
    assert vo.max_y_diff == 2.0
    assert vo.orb_max_distance == 60
    assert vo.residual_threshold == 15.0
    assert vo.kernel_param == 2.0
    assert vo.fast_th == 20  # overridden by SRBA_DETECT (reference .cpp:1140-1142)
    assert vo.n_feats == 500


def test_defaults_without_file():
    cfg = IniFile("[APP_OPTIONS]\n", is_text=True)
    srba = SRBAStereoSLAMOptions.from_config(cfg)
    # reference defaults (utils.h:286-320)
    assert srba.srba_submap_size == 15
    assert srba.max_rotation == 15.0
    assert srba.max_translation == 0.3
    assert srba.updated_matches_th == 50
    assert srba.lc_distance == 2


def test_inline_comments_and_vectors():
    text = textwrap.dedent(
        """
        [S]
        a = 5 // comment
        v = [1 2 3]
        b = true
        """
    )
    cfg = IniFile(text, is_text=True)
    assert cfg.read_int("S", "a", 0) == 5
    assert cfg.read_vector("S", "v", []) == [1.0, 2.0, 3.0]
    assert cfg.read_bool("S", "b", False) is True


def test_threshold_schedules_bit_level():
    # reference utils.cpp:153-171
    assert update_translation_threshold(0.0, 60.0) == 0.02
    assert abs(update_translation_threshold(30.0, 60.0) - (0.02 + 0.25 / 60.0 * 30.0)) < 1e-12
    assert update_translation_threshold(1e9, 60.0) == 0.3
    assert update_rotation_threshold(60.0, 60.0) == 15.0
    assert update_rotation_threshold(-1e9, 60.0) == 2.0
    x, th = 40.0, 60.0
    assert abs(update_rotation_threshold(x, th) - (15.0 + 13.0 / th * (x - th))) < 1e-12
