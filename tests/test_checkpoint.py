import numpy as np

from srba_slam_tpu.utils.checkpoint import load_state, save_state
from srba_slam_tpu.utils.framesource import SyntheticSource

from tests.test_estimator import make_estimator, small_cam


def test_checkpoint_roundtrip_and_resume(tmp_path):
    cam = small_cam()
    src = SyntheticSource(cam, n_frames=30, seed=11, step=0.12)
    frames = list(src)

    # run A: all frames straight through
    est_a = make_estimator()
    for l, r in frames:
        est_a.step(l, r)

    # run B: first half, checkpoint, restore into a FRESH estimator, resume
    est_b1 = make_estimator()
    for l, r in frames[:15]:
        est_b1.step(l, r)
    ckpt = str(tmp_path / "state.npz")
    save_state(est_b1, ckpt)

    est_b2 = make_estimator()
    load_state(est_b2, ckpt)
    # state carried over
    assert est_b2.store.n_kfs == est_b1.store.n_kfs
    assert est_b2.rba.n_kfs == est_b1.rba.n_kfs
    assert est_b2.next_match_id == est_b1.next_match_id
    np.testing.assert_array_equal(est_b2.store.match_ids, est_b1.store.match_ids)
    np.testing.assert_allclose(est_b2.rba.kf_global, est_b1.rba.kf_global)

    for l, r in frames[15:]:
        est_b2.step(l, r)

    # resumed run reaches a comparable final state to the uninterrupted one
    assert abs(est_b2.store.n_kfs - est_a.store.n_kfs) <= 1
    pa = est_a.rba.kf_global[est_a.store.n_kfs - 1]
    pb = est_b2.rba.kf_global[est_b2.store.n_kfs - 1]
    assert np.linalg.norm(pa[3:] - pb[3:]) < 0.3, (pa, pb)


def test_checkpoint_preserves_bow_queries(tmp_path):
    cam = small_cam()
    frames = list(SyntheticSource(cam, n_frames=20, seed=11, step=0.12))
    est = make_estimator()
    for l, r in frames:
        est.step(l, r)
    ckpt = str(tmp_path / "state.npz")
    save_state(est, ckpt)

    est2 = make_estimator()
    load_state(est2, ckpt)
    frame = est.vo.last_frame()
    s1, i1 = est.bow.query(frame.desc_l, frame.m_valid)
    s2, i2 = est2.bow.query(frame.desc_l, frame.m_valid)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_checkpoint_mid_batched_resolves_speculation(tmp_path):
    """save_state during batched stepping must land all speculative checks
    and queued window solves first: a checkpoint taken right after a
    step_batch equals the state of an uninterrupted batched run, and can
    resume in either mode."""
    cam = small_cam()
    frames = list(SyntheticSource(cam, n_frames=24, seed=11, step=0.12))

    est_a = make_estimator()
    est_a.perform_stereo_slam_batched(frames, batch=6)
    est_a.rba.flush()

    est_b = make_estimator()
    est_b.step(*frames[0])
    est_b._sync_bp_from_engine()
    # two raw batches WITHOUT the end-of-loop finish: speculation pending
    est_b._process_scan(est_b._dispatch_scan(
        np.stack([f[0] for f in frames[1:7]]),
        np.stack([f[1] for f in frames[1:7]])))
    est_b._process_scan(est_b._dispatch_scan(
        np.stack([f[0] for f in frames[7:13]]),
        np.stack([f[1] for f in frames[7:13]])))
    ckpt = str(tmp_path / "mid.npz")
    save_state(est_b, ckpt)          # must resolve pending speculation
    assert not est_b._spec
    assert not est_b.rba._pending

    # the checkpoint state equals what the same frames produce through the
    # public batched API (which resolves at the end)
    est_ref = make_estimator()
    est_ref.perform_stereo_slam_batched(frames[:13], batch=6)
    est_ref.rba.flush()
    assert est_b.store.n_kfs == est_ref.store.n_kfs
    n = est_b.store.n_kfs
    np.testing.assert_array_equal(est_b.store.match_ids[:n],
                                  est_ref.store.match_ids[:n])
    np.testing.assert_allclose(est_b.rba.kf_global[:n],
                               est_ref.rba.kf_global[:n], atol=1e-5)

    # and the checkpoint resumes cleanly in batched mode (the resume path
    # re-establishes the tracking reference with one per-frame step)
    est_c = make_estimator()
    load_state(est_c, ckpt)
    est_c.perform_stereo_slam_batched(frames[13:], batch=6)
    est_c.rba.flush()
    assert est_c.store.n_kfs >= est_b.store.n_kfs
    assert abs(est_c.store.n_kfs - est_a.store.n_kfs) <= 2
    pa = est_a.rba.kf_global[est_a.store.n_kfs - 1]
    pc = est_c.rba.kf_global[est_c.store.n_kfs - 1]
    assert np.linalg.norm(pa[3:] - pc[3:]) < 0.3, (pa, pc)
