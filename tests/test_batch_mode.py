import numpy as np

from srba_slam_tpu.utils.framesource import SyntheticSource

from tests.test_estimator import make_estimator, small_cam


def test_batched_matches_per_frame_pipeline():
    cam = small_cam()
    frames = list(SyntheticSource(cam, n_frames=25, seed=11, step=0.12))

    est_a = make_estimator()
    for l, r in frames:
        est_a.step(l, r)

    est_b = make_estimator()
    est_b.perform_stereo_slam_batched(frames, batch=6)

    # both modes should track the trajectory and insert similar keyframes
    assert abs(est_a.store.n_kfs - est_b.store.n_kfs) <= 1, (
        est_a.store.n_kfs, est_b.store.n_kfs)
    na, nb = est_a.store.n_kfs, est_b.store.n_kfs
    pa = est_a.rba.kf_global[na - 1]
    pb = est_b.rba.kf_global[nb - 1]
    assert np.linalg.norm(pa[3:] - pb[3:]) < 0.3, (pa, pb)
    # frame accounting identical
    assert est_b.frame_idx == len(frames) - 1
    assert len(est_b.step_log) == len(frames)


def test_batched_handles_ragged_tail():
    cam = small_cam()
    frames = list(SyntheticSource(cam, n_frames=10, seed=11, step=0.12))
    est = make_estimator()
    est.perform_stereo_slam_batched(frames, batch=4)  # 1 + 4 + 4 + 1
    assert len(est.step_log) == 10
    assert est.store.n_kfs >= 1
