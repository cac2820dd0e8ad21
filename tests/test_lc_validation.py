"""Adversarial loop-closure validation tests (framework extension).

The reference's ONLY loop-closure gate is the tracked > 0.5*best
confirmation (reference src/CSRBAStereoSLAMEstimator.cpp:482-521) — it has
no defense against perceptual aliasing, where a geometrically-consistent
consensus of repeating-texture matches seeds a long-range edge that folds
the map. These tests INJECT exactly that failure mode into the SRBA engine
and assert the validator (SRBAParams.lc_validate) rejects it at each layer:

* layer A (creation): the aliased edge's pose seed disagrees with the pose
  composed along the existing graph by the world-texture period — a
  constant — while honest VO drift is bounded by floor + frac*path_length;
  the edge must be rejected, the area pair blacklisted, the graph kept
  connected via the odometry predecessor, and the mis-associated
  observations re-based as fresh landmarks.
* layer B (post-solve): an edge whose SEED is consistent but whose
  observations are corrupt must be rolled back after the committed window
  solve (far-area reprojection RMSE > lc_chi2_px): edge removed, poses and
  landmarks restored, pair blacklisted, window re-solved without it.

The integration-level counterpart is tests/test_long_trajectory.py, which
(since round 5) runs the degenerate tiled-ground circuit at the DEFAULT
8-frame vocabulary — the configuration that used to fold the map.
"""

import numpy as np

from srba_slam_tpu.models.srba import SRBAEngine, SRBAParams
from srba_slam_tpu.utils import se3_np
from srba_slam_tpu.utils.camera import StereoCamera

CAM = StereoCamera.kitti()


def _project_from(pose_wc, pw):
    """Stereo-project world point ``pw`` from camera pose ``pose_wc``.
    Returns (ul, vl, ur, p_cam) or None when behind/outside."""
    pc = se3_np.transform_point(se3_np.inverse(pose_wc), pw)
    if pc[2] < 1.0:
        return None
    ul = CAM.cx_l + CAM.fx_l * pc[0] / pc[2]
    vl = CAM.cy_l + CAM.fy_l * pc[1] / pc[2]
    ur = CAM.cx_r + CAM.fx_r * (pc[0] - CAM.baseline) / pc[2]
    if not (0 <= ul < CAM.width and 0 <= vl < CAM.height):
        return None
    return ul, vl, ur, pc


def _corridor(rng, n_lms=500, length=45.0):
    return np.stack([
        rng.uniform(-12, 12, n_lms),
        rng.uniform(-3, 3, n_lms),
        rng.uniform(2, length, n_lms),
    ], -1)


def _true_obs(pts, pose_wc, known, max_depth=30.0):
    out = []
    for i, pw in enumerate(pts):
        pr = _project_from(pose_wc, pw)
        if pr is None or pr[3][2] > max_depth:
            continue
        ul, vl, ur, pc = pr
        out.append((int(i), float(ul), float(vl), float(ur), np.asarray(pc)))
    for o in out:
        known.add(o[0])
    return out


def _drive_corridor(eng, pts, n_kfs=6, step=0.8):
    """Insert ``n_kfs`` keyframes advancing +z; every observation carries its
    triangulated position (what the estimator does — estimator._build_obs)."""
    known: set[int] = set()
    first_seen: dict[int, int] = {}
    for i in range(n_kfs):
        gt = np.array([0, 0, 0, 0, 0, step * i])
        eng.set_initial_kf_pose(
            np.array([0, 0, 0, 0, 0, step]) if i else np.zeros(6))
        obs = _true_obs(pts, gt, known)
        for o in obs:
            first_seen.setdefault(o[0], i)
        eng.define_new_keyframe(obs, run_opt=True)
    return known, first_seen


def _aliased_obs(pts, first_seen, claim_area_kfs=(0, 1), min_z=3.5,
                 max_z=18.0):
    """The perceptual-aliasing injection: the camera claims to RE-OBSERVE
    area-0 landmarks from EXACTLY the perspective their base keyframe saw
    them (a world whose texture repeats with the travelled period). The
    claimed observations are internally consistent — pixels, disparities and
    triangulations all agree with each other — so every local filter passes;
    only the disagreement with the odometry chain exposes them."""
    out = []
    for i, pw in enumerate(pts):
        if first_seen.get(i) not in claim_area_kfs:
            continue
        if not (min_z <= pw[2] <= max_z):
            continue
        pr = _project_from(np.zeros(6), pw)   # as seen from KF0 at origin
        if pr is None:
            continue
        ul, vl, ur, pc = pr
        out.append((int(i), float(ul), float(vl), float(ur), np.asarray(pc)))
    return out


def _fresh_obs(rng, n=40, base_id=10_000):
    """Never-seen landmarks local to the new keyframe (inert filler)."""
    out = []
    for j in range(n):
        pw_c = np.array([rng.uniform(-8, 8), rng.uniform(-2, 2),
                         rng.uniform(4, 25)])
        pr = _project_from(np.zeros(6), pw_c)
        if pr is None:
            continue
        ul, vl, ur, pc = pr
        out.append((base_id + j, float(ul), float(vl), float(ur),
                    np.asarray(pc)))
    return out


def _make_engine(**kw):
    p = SRBAParams(submap_size=2, max_optimize_depth=2, opt_iters=4,
                   win_cams=8, **kw)
    return SRBAEngine(CAM, p)


def test_aliased_lc_rejected_at_creation(capsys):
    """Layer A: a confirmed-but-WRONG loop closure (identity-offset aliased
    consensus, 4.8 m period vs a ~0.6 m drift budget) must be rejected at
    edge creation, blacklisted, and recovered from: graph stays connected
    through the odometry predecessor and the mis-associations are re-based."""
    rng = np.random.default_rng(7)
    pts = _corridor(rng)
    eng = _make_engine()
    known, first_seen = _drive_corridor(eng, pts, n_kfs=6)

    # the estimator confirms a (wrong) closure with old KF 0
    eng.loop_closure_detected(True)
    eng.set_lc_old_id(0)
    eng.set_initial_kf_pose(np.array([0, 0, 0, 0, 0, 0.8]))
    bad = _aliased_obs(pts, first_seen)
    assert len(bad) >= 12, "world too thin for the injection"
    obs = bad + _fresh_obs(rng)
    n_lms_before = eng.n_lms
    eng.define_new_keyframe(obs, run_opt=True)
    kf = 6

    # the wrong edge was NOT created
    edges = set(zip(eng.edge_u[eng.edge_valid], eng.edge_v[eng.edge_valid]))
    assert (0, kf) not in edges, "aliased loop-closure edge was accepted"
    # ... and the rejection is recorded + blacklisted
    assert eng.lc_rejects_last_insert, "no rejection recorded"
    assert eng.is_lc_blacklisted(0, eng._area_of(kf))
    out = capsys.readouterr().out
    assert "REJECTED at create" in out
    # graph stays connected: kf anchored to the odometry predecessor's area
    assert (eng._area_of(kf - 1), kf) in edges
    # the aliased observations were re-based as fresh landmarks at kf —
    # they must no longer vote for (or constrain) area 0
    assert eng.n_lms > n_lms_before + len(_fresh_obs(rng)) - 5
    rows = np.nonzero(eng.obs_kf[: eng.n_obs] == kf)[0]
    for o in rows:
        base = int(eng.lm_base[int(eng.obs_lm[o])])
        assert eng._area_of(base) != 0, \
            "a kf observation still constrains the rejected area"
    # the pose chain is undisturbed (no fold): kf sits ~4.8 m down the
    # corridor, not back at the origin
    assert eng.kf_global[kf, 5] > 4.0, eng.kf_global[kf]


def test_true_lc_accepted_same_geometry():
    """Control for the adversarial case: the SAME world and confirmation,
    but honest re-observations (camera genuinely 4.8 m along, re-seeing
    area-0 landmarks from there) — the gate must let the edge through."""
    rng = np.random.default_rng(7)
    pts = _corridor(rng)
    eng = _make_engine()
    known, first_seen = _drive_corridor(eng, pts, n_kfs=6)

    eng.loop_closure_detected(True)
    eng.set_lc_old_id(0)
    eng.set_initial_kf_pose(np.array([0, 0, 0, 0, 0, 0.8]))
    gt = np.array([0, 0, 0, 0, 0, 4.8])
    obs = _true_obs(pts, gt, known)
    eng.define_new_keyframe(obs, run_opt=True)
    kf = 6

    edges = set(zip(eng.edge_u[eng.edge_valid], eng.edge_v[eng.edge_valid]))
    assert (0, kf) in edges, "true loop-closure edge was rejected"
    e = [i for i in range(eng.n_edges)
         if (eng.edge_u[i], eng.edge_v[i]) == (0, kf)][0]
    assert eng._edge_kind[e] == 2 and eng.edge_valid[e]
    assert not eng.lc_blacklist


def test_corrupt_lc_rolled_back_post_solve(capsys):
    """Layer B: an edge whose SEED passes the creation gate (clean 3D
    geometry) but whose pixel observations are corrupt must be rolled back
    after the committed window solve — far-area reprojection RMSE blows the
    lc_chi2_px gate. The rollback must remove the edge, restore the chain,
    re-base the bad observations, and blacklist the pair."""
    rng = np.random.default_rng(11)
    pts = _corridor(rng)
    eng = _make_engine(lc_chi2_px=3.0)
    known, first_seen = _drive_corridor(eng, pts, n_kfs=6)

    eng.loop_closure_detected(True)
    eng.set_lc_old_id(0)
    eng.set_initial_kf_pose(np.array([0, 0, 0, 0, 0, 0.8]))
    gt = np.array([0, 0, 0, 0, 0, 4.8])
    obs = _true_obs(pts, gt, known)
    # corrupt the PIXELS of every re-observation of an area-0 landmark
    # (keep the 3D rel positions clean so the creation-time Horn seed is
    # consistent and the edge gets created)
    corrupted = []
    for (lm, ul, vl, ur, rel) in obs:
        if first_seen.get(lm) in (0, 1):
            # ~2-4 m of claimed landmark displacement at these depths (x px
            # at depth z is x*z/fx meters laterally; fx=718, z in 6..30 m) —
            # decisively beyond the ~0.6 m drift budget even after the
            # robust kernel's tug-of-war against the area's own history
            ul, vl, ur = ul + 110.0, vl + 70.0, ur + 110.0
        corrupted.append((lm, ul, vl, ur, rel))
    eng.define_new_keyframe(corrupted, run_opt=True)
    kf = 6

    out = capsys.readouterr().out
    assert "REJECTED at solve" in out, out
    edges = set(zip(eng.edge_u[eng.edge_valid], eng.edge_v[eng.edge_valid]))
    assert (0, kf) not in edges, "corrupt loop-closure edge survived"
    assert eng.is_lc_blacklisted(0, eng._area_of(kf))
    # the final pose-graph export must not carry the edge
    eu, ev, _ = eng.get_global_graphslam_problem()
    assert (0, kf) not in set(zip(eu, ev))
    # chain connectivity survives the rollback
    assert eng.topo_distance(0, kf, max_depth=10) <= 6
    # and the chain did not fold back to the origin
    assert eng.kf_global[kf, 5] > 4.0, eng.kf_global[kf]


def test_blacklist_blocks_reproposal(capsys):
    """After a rejection, the same area pair must not get a second chance at
    edge creation (the estimator additionally filters candidates upstream)."""
    rng = np.random.default_rng(7)
    pts = _corridor(rng)
    eng = _make_engine()
    known, first_seen = _drive_corridor(eng, pts, n_kfs=6)

    eng.loop_closure_detected(True)
    eng.set_lc_old_id(0)
    eng.set_initial_kf_pose(np.array([0, 0, 0, 0, 0, 0.8]))
    bad = _aliased_obs(pts, first_seen)
    eng.define_new_keyframe(bad + _fresh_obs(rng), run_opt=True)
    assert eng.is_lc_blacklisted(0, eng._area_of(6))
    capsys.readouterr()

    # a second aliased insertion voting for the same area: the policy must
    # skip the pair outright (logged skip, no new consistency evaluation)
    eng.loop_closure_detected(True)
    eng.set_lc_old_id(0)
    eng.set_initial_kf_pose(np.array([0, 0, 0, 0, 0, 0.8]))
    bad2 = _aliased_obs(pts, first_seen)
    eng.define_new_keyframe(bad2 + _fresh_obs(rng, base_id=20_000),
                            run_opt=True)
    kf = 7
    edges = set(zip(eng.edge_u[eng.edge_valid], eng.edge_v[eng.edge_valid]))
    assert (0, kf) not in edges
    assert eng.lc_rejects_last_insert, "blacklist skip not recorded"
