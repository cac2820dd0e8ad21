import numpy as np

from srba_slam_tpu.utils.framesource import SyntheticSource

from tests.test_estimator import make_estimator, small_cam


def test_batched_matches_per_frame_pipeline():
    """Batched mode must reproduce per-frame mode exactly: the tail re-run
    of sub-threshold batches (≙ the reference's repeat request,
    .cpp:271-315) makes the two modes process identical detector outputs."""
    cam = small_cam()
    frames = list(SyntheticSource(cam, n_frames=25, seed=11, step=0.12))

    est_a = make_estimator()
    for l, r in frames:
        est_a.step(l, r)

    est_b = make_estimator()
    est_b.perform_stereo_slam_batched(frames, batch=6)

    assert est_a.store.n_kfs == est_b.store.n_kfs, (
        est_a.store.n_kfs, est_b.store.n_kfs)
    # identical insertion frames
    ka = [r.inserted_kf for r in est_a.step_log]
    kb = [r.inserted_kf for r in est_b.step_log]
    assert ka == kb
    est_a.rba.flush()
    est_b.rba.flush()
    n = est_a.store.n_kfs
    np.testing.assert_allclose(
        est_a.rba.kf_global[:n], est_b.rba.kf_global[:n], atol=1e-6)
    # frame accounting identical
    assert est_b.frame_idx == len(frames) - 1
    assert len(est_b.step_log) == len(frames)


def test_batched_retry_protocol_matches_per_frame():
    """Stress the adaptive FAST/ORB retry: dark low-texture frames force
    threshold drops mid-batch; the batched tail re-run must land on the same
    keyframes and final thresholds as the per-frame retry loop."""
    cam = small_cam()
    frames = list(SyntheticSource(cam, n_frames=25, seed=11, step=0.12))
    dark = [(l * 0.12, r * 0.12) for l, r in frames]

    est_a = make_estimator()
    for l, r in dark:
        est_a.step(l, r)
    est_b = make_estimator()
    est_b.perform_stereo_slam_batched(dark, batch=6)

    assert est_a.store.n_kfs == est_b.store.n_kfs
    assert est_a.vo.fast_th == est_b.vo.fast_th
    assert est_a.vo.orb_th == est_b.vo.orb_th
    ka = [r.inserted_kf for r in est_a.step_log]
    kb = [r.inserted_kf for r in est_b.step_log]
    assert ka == kb


def test_batched_handles_ragged_tail():
    cam = small_cam()
    frames = list(SyntheticSource(cam, n_frames=10, seed=11, step=0.12))
    est = make_estimator()
    est.perform_stereo_slam_batched(frames, batch=4)  # 1 + 4 + 4 + 1
    assert len(est.step_log) == 10
    assert est.store.n_kfs >= 1
