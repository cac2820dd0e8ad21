import numpy as np
import pytest

from srba_slam_tpu.models.srba import SRBAEngine, SRBAParams
from srba_slam_tpu.utils import se3_np
from srba_slam_tpu.utils.camera import StereoCamera

CAM = StereoCamera.kitti()


def _project(pose_wc, pw):
    pc = se3_np.transform_point(se3_np.inverse(pose_wc), pw)
    if pc[2] < 1.0:
        return None
    ul = CAM.cx_l + CAM.fx_l * pc[0] / pc[2]
    vl = CAM.cy_l + CAM.fy_l * pc[1] / pc[2]
    ur = CAM.cx_r + CAM.fx_r * (pc[0] - CAM.baseline) / pc[2]
    if not (0 <= ul < CAM.width and 0 <= vl < CAM.height):
        return None
    return ul, vl, ur, pc


class World:
    """Landmark field along a corridor; KFs advance in +z."""

    def __init__(self, rng, n_lms=800, length=60.0):
        self.pts = np.stack([
            rng.uniform(-12, 12, n_lms),
            rng.uniform(-3, 3, n_lms),
            rng.uniform(2, length, n_lms),
        ], -1)

    def observe(self, pose_wc, max_depth=35.0):
        """Observations of landmarks visible from pose: (lm_id, ul, vl, ur, rel)."""
        out = []
        for i, pw in enumerate(self.pts):
            pr = _project(pose_wc, pw)
            if pr is None or pr[3][2] > max_depth:
                continue
            ul, vl, ur, pc = pr
            out.append((i, ul, vl, ur, pc))
        return out


def _insert(engine, obs, known_lms, noise_rng=None, px_noise=0.0,
            rel_always=False):
    """Feed observations; only first-sight landmarks carry rel positions
    unless ``rel_always`` (the estimator triangulates EVERY observation —
    estimator._build_obs — and loop-closure edge seeding requires the
    re-observed landmarks' fresh geometry, so LC tests set it)."""
    prepared = []
    for (lm_id, ul, vl, ur, pc) in obs:
        if px_noise and noise_rng is not None:
            ul += noise_rng.normal(0, px_noise)
            vl += noise_rng.normal(0, px_noise)
            ur += noise_rng.normal(0, px_noise)
        rel = pc if rel_always else None
        if lm_id not in known_lms:
            rel = pc  # first sighting: triangulated position in this KF frame
            known_lms.add(lm_id)
        prepared.append((lm_id, ul, vl, ur, rel))
    return engine.define_new_keyframe(prepared, run_opt=True)


def test_edge_policy_structure():
    rng = np.random.default_rng(0)
    world = World(rng)
    eng = SRBAEngine(CAM, SRBAParams(submap_size=3, max_optimize_depth=3,
                                     opt_iters=4, win_cams=8))
    known = set()
    for i in range(7):
        gt = np.array([0, 0, 0, 0, 0, 1.0 * i])
        eng.set_initial_kf_pose(np.array([0, 0, 0, 0, 0, 1.0]) if i else np.zeros(6))
        _insert(eng, world.observe(gt), known)
    # submap_size=3: centers 0,3,6. KFs 1,2 -> center 0; 4,5 -> center 3
    edges = set(zip(eng.edge_u, eng.edge_v))
    assert (0, 1) in edges and (0, 2) in edges
    assert (3, 4) in edges and (3, 5) in edges
    # base KFs 3 and 6 connect to the top-voted previous center
    assert any(u in (0, 1, 2) and v == 3 for (u, v) in edges)
    assert eng.localmap_center[4] == 3 and eng.localmap_center[6] == 6


def test_optimization_corrects_noisy_initial_poses():
    rng = np.random.default_rng(1)
    world = World(rng)
    eng = SRBAEngine(CAM, SRBAParams(submap_size=5, max_optimize_depth=4,
                                     opt_iters=10, win_cams=16))
    known = set()
    gts = []
    for i in range(8):
        gt = np.array([0, 0, 0, 0.05 * i, 0, 1.2 * i])
        gts.append(gt)
        # noisy odometry seed
        rel = np.array([0, 0, 0, 0.05, 0, 1.2]) + rng.normal(0, 0.03, 6) * (i > 0)
        eng.set_initial_kf_pose(rel if i else np.zeros(6))
        info = _insert(eng, world.observe(gt), known, rng, px_noise=0.3)
        assert info.cost_final <= info.cost_init or info.cost_init == 0
    # global poses should be close to ground truth (anchored at KF0)
    err = np.linalg.norm(eng.kf_global[:8, 3:] - np.stack(gts)[:, 3:], axis=1)
    assert err.max() < 0.08, err


def test_obs_rmse_small_on_clean_data():
    rng = np.random.default_rng(2)
    world = World(rng)
    eng = SRBAEngine(CAM, SRBAParams(submap_size=4, opt_iters=8, win_cams=8))
    known = set()
    last = None
    for i in range(5):
        gt = np.array([0, 0.01 * i, 0, 0, 0, 1.0 * i])
        eng.set_initial_kf_pose(np.array([0, 0.01, 0, 0, 0, 1.0]) if i else np.zeros(6))
        last = _insert(eng, world.observe(gt), known)
    assert last.obs_rmse < 0.1


def test_loop_closure_edge_created():
    rng = np.random.default_rng(3)
    world = World(rng)
    eng = SRBAEngine(CAM, SRBAParams(submap_size=2, max_optimize_depth=2,
                                     opt_iters=3, win_cams=8))
    known = set()
    for i in range(6):
        gt = np.array([0, 0, 0, 0, 0, 0.8 * i])
        eng.set_initial_kf_pose(np.array([0, 0, 0, 0, 0, 0.8]) if i else np.zeros(6))
        _insert(eng, world.observe(gt), known)
    # estimator confirms a loop closure with old KF 0
    eng.loop_closure_detected(True)
    eng.set_lc_old_id(0)
    eng.set_initial_kf_pose(np.array([0, 0, 0, 0, 0, 0.8]))
    _insert(eng, world.observe(np.array([0, 0, 0, 0, 0, 4.8])), known,
            rel_always=True)
    edges = set(zip(eng.edge_u, eng.edge_v))
    assert (0, 6) in edges  # explicit LC edge to old area center
    # the LC edge is typed as such (annotated graph export input)
    e_lc = [e for e in range(eng.n_edges)
            if (eng.edge_u[e], eng.edge_v[e]) == (0, 6)][0]
    assert eng._edge_kind[e_lc] == 2
    # mid-submap edges are kind 0
    e_mid = [e for e in range(eng.n_edges)
             if (eng.edge_u[e], eng.edge_v[e]) == (0, 1)][0]
    assert eng._edge_kind[e_mid] == 0


def test_annotated_dot_export(tmp_path):
    """save_graph_as_dot annotates nodes with poses (submap centers
    doubled) and edges with relative poses + types, loop closures
    highlighted (≙ the diagnostic value of the reference's SRBA graph
    exports, .cpp:801, :1094-1095)."""
    rng = np.random.default_rng(3)
    world = World(rng)
    eng = SRBAEngine(CAM, SRBAParams(submap_size=2, max_optimize_depth=2,
                                     opt_iters=3, win_cams=8))
    known = set()
    for i in range(6):
        gt = np.array([0, 0, 0, 0, 0, 0.8 * i])
        eng.set_initial_kf_pose(
            np.array([0, 0, 0, 0, 0, 0.8]) if i else np.zeros(6))
        _insert(eng, world.observe(gt), known)
    eng.loop_closure_detected(True)
    eng.set_lc_old_id(0)
    eng.set_initial_kf_pose(np.array([0, 0, 0, 0, 0, 0.8]))
    _insert(eng, world.observe(np.array([0, 0, 0, 0, 0, 4.8])), known,
            rel_always=True)
    path = tmp_path / "g.dot"
    eng.save_graph_as_dot(str(path))
    txt = path.read_text()
    assert txt.startswith("graph srba {")
    # every node annotated with a pose; submap centers doubled
    for k in range(eng.n_kfs):
        assert f" {k} [shape=" in txt
    assert "doublecircle" in txt and 'pose="' in txt
    # every edge typed and annotated with its relative pose
    assert txt.count(" -- ") == eng.n_edges
    assert 'kind="submap"' in txt and 'kind="lc"' in txt
    assert "color=red" in txt and 'rel="' in txt


def test_spanning_tree_poses_match_globals():
    rng = np.random.default_rng(4)
    world = World(rng)
    eng = SRBAEngine(CAM, SRBAParams(submap_size=3, opt_iters=6, win_cams=8))
    known = set()
    for i in range(6):
        gt = np.array([0, 0, 0, 0, 0, 1.0 * i])
        eng.set_initial_kf_pose(np.array([0, 0, 0, 0, 0, 1.0]) if i else np.zeros(6))
        _insert(eng, world.observe(gt), known)
    tree = eng.spanning_tree(0)
    assert set(tree.keys()) == set(range(6))
    for k, (hops, rel) in tree.items():
        recomposed = se3_np.compose(eng.kf_global[0], rel)
        np.testing.assert_allclose(recomposed, eng.kf_global[k], atol=1e-6)


def test_topo_distance():
    eng = SRBAEngine(CAM, SRBAParams())
    # hand-build a chain 0-1-2-3
    eng.n_kfs = 4
    for i in range(3):
        eng._add_edge(i, i + 1, np.zeros(6))
    assert eng.topo_distance(0, 3) == 3
    assert eng.topo_distance(0, 3, max_depth=2) > 1 << 20
    assert eng.topo_distance(2, 2) == 0


def test_window_truncation_keeps_best_supported_landmarks(capsys):
    """Over-capacity windows keep the MOST-OBSERVED landmarks (round-3
    policy; the old arbitrary id-prefix silently dropped exactly the
    well-tracked landmarks a loop-closure window needs), and the warning
    escalates to unconditional when a loop-closure-scale edge is inside
    the window."""
    eng = SRBAEngine(CAM, SRBAParams(
        submap_size=50, max_optimize_depth=4, max_kfs=8,
        win_cams=8, win_lms=8, win_obs=64, opt_iters=2), lazy=True)

    # landmarks 0..19; ids 0..7 observed by BOTH KFs (well-supported),
    # 8..19 observed once. win_lms=8 forces truncation to 8 of 20.
    def obs_for(kf, ids):
        n = len(ids)
        px = np.tile([[300.0, 200.0, 290.0]], (n, 1)) + \
            np.arange(n)[:, None] * 1.0
        rel = np.tile([[0.0, 0.0, 10.0]], (n, 1))
        return (np.asarray(ids, np.int64), px, rel)

    eng.define_new_keyframe(obs_for(0, list(range(20))), run_opt=False)
    eng.set_initial_kf_pose(np.array([0, 0, 0, 0, 0, 0.5]))
    eng.define_new_keyframe(obs_for(1, list(range(8))), run_opt=True)
    sel = eng._queued[-1]["entry"]["lms"]
    # the 8 kept landmark indices must be the doubly-observed ones
    assert set(sel.tolist()) == set(range(8)), sel
    eng.flush()

    # escalation: fabricate a long-range edge inside the window and force
    # truncation again — the warning must print unconditionally
    eng2 = SRBAEngine(CAM, SRBAParams(
        submap_size=2, max_optimize_depth=8, max_kfs=64,
        min_obs_to_loop_closure=4,
        win_cams=8, win_lms=8, win_obs=64, opt_iters=2), lazy=True)
    # chain of KFs; KF 6 re-observes KF0's landmarks => long-range edge
    eng2.define_new_keyframe(obs_for(0, list(range(12))), run_opt=False)
    for k in range(1, 6):
        eng2.set_initial_kf_pose(np.array([0, 0, 0, 0, 0, 0.5]))
        eng2.define_new_keyframe(
            obs_for(k, list(range(20 + k * 12, 32 + k * 12))), run_opt=False)
    eng2.set_initial_kf_pose(np.array([0, 0, 0, 0, 0, 0.5]))
    capsys.readouterr()
    eng2.define_new_keyframe(obs_for(6, list(range(12))), run_opt=True)
    span = np.abs(eng2.edge_u - eng2.edge_v)
    assert (span > 2).any(), "scenario must create a long-range edge"
    out = capsys.readouterr().out
    assert "loop-closure edge in window" in out, out
    eng2.flush()
