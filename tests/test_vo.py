import numpy as np
import jax.numpy as jnp
import pytest

from srba_slam_tpu.config import VOOptions
from srba_slam_tpu.models.vo import StereoVOEngine
from srba_slam_tpu.utils import se3
from srba_slam_tpu.utils.camera import StereoCamera

from tests.synth import PlaneScene


def small_cam():
    # quarter-res KITTI-like rig to keep the test fast
    return StereoCamera(
        fx_l=180.0, fy_l=180.0, cx_l=160.0, cy_l=100.0,
        fx_r=180.0, fy_r=180.0, cx_r=160.0, cy_r=100.0,
        baseline=0.54, width=320, height=200,
    )


@pytest.fixture(scope="module")
def scene():
    return PlaneScene(np.random.default_rng(11))


def _run_sequence(scene, cam, poses, **eng_kw):
    eng = StereoVOEngine(cam, VOOptions(fast_th=12, n_feats=256), capacity=256, **eng_kw)
    results = []
    for p in poses:
        left, right = scene.render(cam, p)
        results.append(eng.process_stereo_pair(left, right))
    return eng, results


def test_vo_static_camera(scene):
    cam = small_cam()
    poses = [np.zeros(6, np.float32)] * 3
    _, results = _run_sequence(scene, cam, poses)
    assert results[0].valid and results[0].num_stereo_matches > 50
    for r in results[1:]:
        assert r.valid
        assert np.linalg.norm(r.pose_increment[3:]) < 0.01
        assert np.linalg.norm(r.pose_increment[:3]) < 0.005
        assert r.tracked_from_last_frame > 40


def test_vo_forward_motion(scene):
    cam = small_cam()
    # camera advances 0.15 m toward the plane each frame
    poses = [np.array([0, 0, 0, 0, 0, 0.15 * i], np.float32) for i in range(4)]
    _, results = _run_sequence(scene, cam, poses)
    for r in results[1:]:
        assert r.valid
        # pose_increment maps prev-frame coords to cur-frame: pure forward
        # motion of the camera moves scene points by -0.15 in z
        np.testing.assert_allclose(r.pose_increment[5], -0.15, atol=0.02)
        assert abs(r.pose_increment[3]) < 0.03 and abs(r.pose_increment[4]) < 0.03


def test_vo_lateral_and_rotation(scene):
    cam = small_cam()
    # sideways translation + small yaw per frame
    gt = []
    pose = np.zeros(6, np.float32)
    for i in range(4):
        gt.append(pose.copy())
        inc = np.array([0, 0.01, 0, 0.08, 0, 0.05], np.float32)
        pose = np.asarray(se3.compose(jnp.asarray(pose), jnp.asarray(inc)))
    _, results = _run_sequence(scene, cam, gt)
    for i, r in enumerate(results[1:], 1):
        assert r.valid, f"frame {i} invalid"
        # expected increment: T_cur_prev = inverse(inc)
        exp = np.asarray(se3.inverse(jnp.asarray(
            np.array([0, 0.01, 0, 0.08, 0, 0.05], np.float32))))
        np.testing.assert_allclose(r.pose_increment, exp, atol=0.02)


def test_vo_trajectory_accumulation(scene):
    cam = small_cam()
    incs = [np.array([0, 0.005, 0, 0.05, 0, 0.1], np.float32)] * 5
    gt = [np.zeros(6, np.float32)]
    for inc in incs:
        gt.append(np.asarray(se3.compose(jnp.asarray(gt[-1]), jnp.asarray(inc))))
    _, results = _run_sequence(scene, cam, gt)
    # accumulate VO increments: T_w_cur = T_w_prev ∘ inverse(increment)
    est = jnp.zeros(6)
    for r in results[1:]:
        est = se3.compose(est, se3.inverse(jnp.asarray(r.pose_increment)))
    err = np.asarray(est) - gt[-1]
    assert np.linalg.norm(err[3:]) < 0.05, err
    assert np.linalg.norm(err[:3]) < 0.02, err


def test_vo_multi_octave(scene):
    cam = small_cam()
    poses = [np.zeros(6, np.float32),
             np.array([0, 0, 0, 0, 0, 0.12], np.float32)]
    eng = StereoVOEngine(cam, VOOptions(fast_th=12, n_feats=256, n_octaves=2),
                         capacity=256)
    for p in poses:
        left, right = scene.render(cam, p)
        res = eng.process_stereo_pair(left, right)
    assert res.valid and res.num_stereo_matches > 40
    # octave-1 keypoints exist: coordinates with the level-1 parity pattern
    frame = eng.last_frame()
    ys = np.asarray(frame.ys_l)[np.asarray(frame.valid_l)]
    assert len(ys) > 0
    np.testing.assert_allclose(res.pose_increment[5], -0.12, atol=0.03)


def test_adaptive_threshold_protocol_rules():
    """The single-source retry/drift rules (StereoVOEngine.retry_step /
    drift_thresholds) follow the reference schedule exactly
    (≙ /root/reference/src/CSRBAStereoSLAMEstimator.cpp:271-315):
    FAST drops by 10 to its floor, then ORB rises by 10 to its cap, then
    retry_step reports exhaustion; the drift rule pulls FAST down 5 in
    the soft zone (<1.2x min matches) and otherwise steps FAST back
    toward its baseline while resetting ORB."""
    cam = small_cam()
    eng = StereoVOEngine(cam, VOOptions(fast_th=25, n_feats=256),
                         capacity=256)
    # retry: FAST 25 -> floor in -10 steps, clipped at fast_th_min
    seen_fast = [eng.fast_th]
    while not eng.is_fast_th_min():
        assert eng.retry_step()
        assert eng.fast_th == max(seen_fast[-1] - 10, eng.fast_th_min)
        seen_fast.append(eng.fast_th)
    # then ORB climbs in +10 steps to its cap
    seen_orb = [eng.orb_th]
    while not eng.is_orb_th_max():
        assert eng.retry_step()
        assert eng.fast_th == eng.fast_th_min  # FAST stays on its floor
        assert eng.orb_th == min(seen_orb[-1] + 10, eng.orb_th_max)
        seen_orb.append(eng.orb_th)
    assert len(seen_fast) > 1 and len(seen_orb) > 1
    # both exhausted: no further move
    assert not eng.retry_step()

    # drift, soft zone with FAST above its floor: FAST down 5, ORB untouched
    eng.set_fast_threshold(eng.fast_th_min + 8)
    eng.set_orb_threshold(eng.orb_th_max - 20)
    orb_before = eng.orb_th
    eng.drift_thresholds(n_matches=100, th_min=100)  # 100 < 1.2*100
    assert eng.fast_th == eng.fast_th_min + 3
    assert eng.orb_th == orb_before
    # drift, soft zone with FAST on its floor: ORB rises by 5 instead
    # (reference .cpp:301-306 elif branch)
    eng.set_fast_threshold(eng.fast_th_min)
    eng.drift_thresholds(n_matches=100, th_min=100)
    assert eng.fast_th == eng.fast_th_min
    assert eng.orb_th == orb_before + 5
    # soft zone with BOTH exhausted: no move at all
    eng.set_orb_threshold(eng.orb_th_max)
    eng.drift_thresholds(n_matches=100, th_min=100)
    assert eng.fast_th == eng.fast_th_min
    assert eng.orb_th == eng.orb_th_max
    # drift, healthy: FAST +5 toward baseline, ORB resets to its config
    eng.set_fast_threshold(eng.fast_th_max - 7)
    eng.drift_thresholds(n_matches=130, th_min=100)  # >= 1.2*100
    assert eng.fast_th == eng.fast_th_max - 2
    assert eng.orb_th == float(eng.opts.orb_max_distance)
    # healthy at baseline: FAST holds (no overshoot past the configured max)
    eng.set_fast_threshold(eng.fast_th_max)
    eng.drift_thresholds(n_matches=130, th_min=100)
    assert eng.fast_th == eng.fast_th_max
    # healthy with a MISALIGNED FAST value 2 below the max: the +5 step is
    # clamped to the configured baseline, not allowed to overshoot and stick
    # (reference .cpp:310 uses min(detect_fast_th, fast+5))
    eng.set_fast_threshold(eng.fast_th_max - 2)
    eng.drift_thresholds(n_matches=130, th_min=100)
    assert eng.fast_th == eng.fast_th_max
