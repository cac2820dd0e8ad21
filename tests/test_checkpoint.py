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
