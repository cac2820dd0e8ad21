"""Sparser Relative Bundle Adjustment engine (TPU-native ≙ mySRBA/RbaEngine).

Re-creates, from observed behavior, the SRBA backend the reference drives
(reference src/srba-stereo-slam.h:30-310 and the define_new_keyframe call
sites src/CSRBAStereoSLAMEstimator.cpp:166-168, 782-784):

* keyframes linked by SE(3) kf2kf edges; landmarks parameterized relative to
  their base keyframe; per-insertion local optimization bounded to
  ``max_optimize_depth`` graph hops;
* the custom **submap edge-creation policy** (srba-stereo-slam.h:144-308):
  mid-submap KFs get a single edge to the current localmap center; submap-base
  KFs vote their observations per existing localmap and receive extra edges —
  including loop-closure edges when the topological distance is large and the
  shared-observation count passes ``min_obs_to_loop_closure``;
* loop-closure hooks ``loop_closure_detected`` / ``set_lc_old_id`` /
  ``set_initial_kf_pose`` (srba-stereo-slam.h:85-97).

Split of labor: graph bookkeeping (adjacency, BFS spanning trees, votes) runs
on host as VECTORIZED numpy over preallocated arrays (per-item python loops
cost ~40 us each and dominated insertion time); the windowed LM + Schur +
Cholesky bundle adjustment is one fixed-shape jitted device program
(srba_slam_tpu.ops.window_ba) shared by all windows.

Latency model: the window optimization is dispatched asynchronously and its
results are pulled LAZILY — either merged into the caller's next bulk
device transfer (``pending_device_arrays`` / ``commit_pending``) or forced by
``flush()``. Through the tunneled TPU runtime every host<->device sync costs
~40 ms regardless of payload, so deferring the pull hides both the round-trip
and the BA compute behind host work. Until commit, ``kf_global`` holds the
VO-seeded pose for the newest keyframe (one refinement stale); all reads that
need optimized state flush first.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from srba_slam_tpu.ops.window_ba import (BAWindow, optimize_window,
    optimize_window_packed, pack_window)
from srba_slam_tpu.utils import se3_np
from srba_slam_tpu.utils.camera import StereoCamera
from srba_slam_tpu.utils.pull import bulk_pull


@dataclass
class SRBAParams:
    """≙ rba.parameters.* + ecp.* (reference .cpp:1149-1160)."""

    submap_size: int = 10
    max_tree_depth: int = 4
    max_optimize_depth: int = 5
    min_obs_to_loop_closure: int = 50
    use_robust_kernel: bool = True
    # stage-1 (pose-only, new-edge refinement) kernel flag + iteration cap
    # (≙ rba.parameters.srba.use_robust_kernel_stage1, reference .cpp:1159)
    use_robust_kernel_stage1: bool = True
    stage1_iters: int = 2
    kernel_param: float = 1.5
    std_noise_pixels: float = 0.5
    max_kfs: int = 512
    # init-anchor prior weights (see ops/window_ba.py — a documented
    # deviation from the reference SRBA objective; 0 disables)
    anchor_prior_w_rot: float = 1000.0
    anchor_prior_w_trans: float = 100.0
    # window capacities (static shapes of the BA program); generous by
    # default — truncation silently weakens loop closures (observed: the
    # 25-KF loop test only snaps shut with all constraints kept)
    win_cams: int = 32
    win_lms: int = 8192
    win_obs: int = 16384
    # LM iteration cap of the window solve. The loop already early-exits on
    # quadratic-model convergence (ops/window_ba make_loop), so the cap only
    # binds on hard windows — and each bound iteration is serial device time
    # on the per-insertion critical path. Measured on the live v5e street
    # workload (tools/ba_iters_probe.py, 2026-08-19): (stage1=2, opt=8) vs
    # the old (4, 20) leaves every keyframe decision identical, max KF
    # position delta 0.14 m pre-epilogue (the global pose-graph solve
    # reconciles finals), and the KITTI-geometry ATE gate passes unchanged.
    opt_iters: int = 8
    verbose: bool = False


@dataclass
class NewKFInfo:
    """≙ TNewKeyFrameInfo (reference .cpp:178-181).

    With lazy optimization the cost fields are NaN until the engine commits
    the pending window solve (``pending`` flips to False then).
    """

    kf_id: int
    created_edges: list
    cost_init: float
    cost_final: float
    obs_rmse: float
    n_window_kfs: int
    n_window_obs: int
    pending: bool = False
    truncated_obs: int = 0
    # ≙ optimize_results_stg1.obs_rmse (reference .cpp:790)
    obs_rmse_stg1: float = float("nan")


class SRBAEngine:
    def __init__(self, cam: StereoCamera, params: SRBAParams | None = None,
                 logger=None, on_commit=None, lazy: bool = False, mesh=None):
        self.cam = cam
        self.p = params or SRBAParams()
        # optional jax.sharding.Mesh: window solves run observation-sharded
        # across it (ops/window_ba.shard_window_obs) — ONE sequence's bundle
        # adjustment spread over the mesh's chips
        self.mesh = mesh
        self.log = logger if logger is not None else (lambda level, msg: None)
        # called as on_commit(kf_id, old_root_global, new_root_global) after a
        # deferred window solve lands, so the owner can re-anchor bookkeeping
        self.on_commit = on_commit
        self.n_kfs = 0
        # edges: (u, v, T_uv) with T_uv = pose of v in u's frame
        self._edge_cap = 64
        self._edge_u = np.zeros(self._edge_cap, np.int32)
        self._edge_v = np.zeros(self._edge_cap, np.int32)
        self._edge_kind = np.zeros(self._edge_cap, np.int8)
        self._edge_pose = np.zeros((self._edge_cap, 6), np.float64)
        self.n_edges = 0
        self.adj: dict[int, list[tuple[int, int]]] = {}  # kf -> [(nbr, edge)]
        self.kf_global = np.zeros((self.p.max_kfs, 6), np.float64)
        # landmarks (preallocated growing arrays)
        self._lm_cap = 4096
        self.lm_base = np.zeros(self._lm_cap, np.int32)
        self.lm_pos = np.zeros((self._lm_cap, 3), np.float64)
        self.n_lms = 0
        self._lookup_cap = 8192
        self._lm_lookup = np.full(self._lookup_cap, -1, np.int32)  # lm id -> idx
        # observations
        self._obs_cap = 4096
        self.obs_kf = np.zeros(self._obs_cap, np.int32)
        self.obs_lm = np.zeros(self._obs_cap, np.int32)
        self.obs_px = np.zeros((self._obs_cap, 3), np.float64)
        self.n_obs = 0
        # loop-closure hooks (≙ srba-stereo-slam.h:85-97)
        self._lc_detected = False
        self._lc_old_id: int | None = None
        self._initial_rel_pose: np.ndarray | None = None
        self.localmap_center = np.full(self.p.max_kfs, -1, np.int32)
        # lazy=True defers window-solve pulls until flush()/commit_pending()
        # (the estimator merges them into its next bulk transfer); lazy=False
        # keeps the synchronous contract: results land before returning.
        # Multiple solves may be in flight at once (an ordered queue): a new
        # insertion no longer forces the previous solve to land, so
        # back-to-back insertions cost zero host round-trips. Queued solves
        # dispatch their windows from the host mirror as of dispatch time
        # (one-to-a-few commits stale) — the BA re-optimizes the whole window
        # from its spanning-tree init, so staleness only moves the LM start.
        self.lazy = lazy
        self._pending: list[dict] = []  # dispatched solve GROUPS (see
        # _dispatch_queued): dict(blob=[WINDOW_SLOTS, row] device array,
        # entries=[per-solve meta dicts])
        self._queued: list[dict] = []   # built-but-undispatched windows

    # ------------------------------------------------------------------ hooks
    def loop_closure_detected(self, flag: bool = True):
        self._lc_detected = flag

    def set_lc_old_id(self, kf_id: int):
        self._lc_old_id = kf_id

    def set_initial_kf_pose(self, rel_pose: np.ndarray):
        """Initial guess for the new KF's pose relative to the PREVIOUS KF
        (≙ setInitialKFPose, used when use_initial_pose is on)."""
        self._initial_rel_pose = np.asarray(rel_pose, np.float64)

    # ------------------------------------------------------------ graph utils
    def _add_edge(self, u: int, v: int, pose_uv: np.ndarray,
                  kind: int = 0) -> int:
        """``kind``: 0 = mid-submap edge to the localmap center, 1 = submap
        base's top-voted area edge, 2 = loop-closure edge (topo-distance
        gated extra edge or the estimator-confirmed LC) — recorded for the
        annotated graph exports (≙ the diagnostic value of the reference's
        SRBA dot/graph exports, .cpp:801, :1094-1095)."""
        e = self.n_edges
        if e == self._edge_cap:
            self._edge_cap *= 2
            self._edge_u = np.concatenate(
                [self._edge_u, np.zeros_like(self._edge_u)])
            self._edge_v = np.concatenate(
                [self._edge_v, np.zeros_like(self._edge_v)])
            self._edge_pose = np.concatenate(
                [self._edge_pose, np.zeros_like(self._edge_pose)])
            self._edge_kind = np.concatenate(
                [self._edge_kind, np.zeros_like(self._edge_kind)])
        self._edge_u[e] = u
        self._edge_v[e] = v
        self._edge_pose[e] = np.asarray(pose_uv, np.float64)
        self._edge_kind[e] = kind
        self.adj.setdefault(u, []).append((v, e))
        self.adj.setdefault(v, []).append((u, e))
        self.n_edges += 1
        return e

    def spanning_tree(self, root: int, max_depth: int | None = None,
                      allow_stale: bool = False):
        """BFS tree: kf -> (hops, pose of kf in root's frame), composed along
        current edge estimates (≙ create_complete_spanning_tree +
        rba_state.spanning_tree topological distances). Pose composition is
        batched per BFS level.

        ``allow_stale=True`` skips flushing a pending window solve (poses may
        be one refinement old) — for callers that only need rough poses and
        must not force an extra device sync, e.g. DA seeding."""
        if not allow_stale:
            self.flush()
        out = {root: (0, np.zeros(6))}
        pose_of = {root: np.zeros(6)}
        frontier = [root]
        depth = 0
        while frontier and (max_depth is None or depth < max_depth):
            parents, edges, nbrs = [], [], []
            seen_this = set()
            for k in frontier:
                for nbr, e in self.adj.get(k, ()):
                    if nbr in out or nbr in seen_this:
                        continue
                    seen_this.add(nbr)
                    parents.append(k)
                    edges.append(e)
                    nbrs.append(nbr)
            if not nbrs:
                break
            eidx = np.asarray(edges, np.int64)
            rel = self._edge_pose[eidx]
            flip = self._edge_u[eidx] != np.asarray(parents)
            if flip.any():
                rel = np.where(flip[:, None], se3_np.inverse_batch(rel), rel)
            parent_poses = np.stack([pose_of[p] for p in parents])
            new_poses = se3_np.compose_batch(parent_poses, rel)
            depth += 1
            for nbr, pose in zip(nbrs, new_poses):
                out[nbr] = (depth, pose)
                pose_of[nbr] = pose
            frontier = nbrs
        return out

    def topo_distance(self, a: int, b: int, max_depth: int | None = None) -> int:
        """Graph hops between a and b (integer BFS only — no pose algebra);
        a large sentinel when unreachable within max_depth."""
        if a == b:
            return 0
        visited = {a}
        frontier = [a]
        depth = 0
        while frontier and (max_depth is None or depth < max_depth):
            depth += 1
            nxt = []
            for k in frontier:
                for nbr, _e in self.adj.get(k, ()):
                    if nbr in visited:
                        continue
                    if nbr == b:
                        return depth
                    visited.add(nbr)
                    nxt.append(nbr)
            frontier = nxt
        return 1 << 30

    # --------------------------------------------------- edge creation policy
    def _geometric_edge_seed(self, u: int, kf: int, obs_lm_idx: np.ndarray,
                             obs_pts: np.ndarray | None):
        """Initial pose for a long-range (loop-closure) edge u -> kf from the
        SHARED landmark geometry instead of the drift-accumulated globals.

        ≙ the reference's ``has_approx_init_val = false`` on loop-closure
        edges (srba-stereo-slam.h:279-281): SRBA estimates those initial
        relative poses from the observations. Here: Horn/Umeyama 3D-3D
        alignment between the common landmarks' positions in u's frame
        (composed along the spanning tree from their base KFs) and the new
        KF's triangulated observations of them, with one outlier-trim pass.
        Returns the edge pose T_uv (pose of kf in u's frame) or None when
        the geometry is too thin; callers fall back to the global-pose seed.
        A drift-consistent seed encodes no loop information — the robust
        kernel then treats the true loop residuals as outliers and the loop
        never closes."""
        if obs_pts is None or len(obs_lm_idx) < 8:
            return None
        bases = self.lm_base[obs_lm_idx]
        mask = (bases != kf) & np.isfinite(obs_pts).all(axis=1)
        # restrict to landmarks of u's OWN area: mixing in recent-chain
        # landmarks (placed via the drifted odometry tree) makes the two
        # point sets disagree by exactly the loop drift and the fit rejects
        base_centers = np.where(self.localmap_center[bases] >= 0,
                                self.localmap_center[bases], bases)
        own_area = mask & (base_centers == u)
        if own_area.sum() >= 8:
            mask = own_area
        if mask.sum() < 8:
            return None
        tree = self.spanning_tree(u, allow_stale=True)
        li = obs_lm_idx[mask]
        q = obs_pts[mask]
        p_u = np.zeros_like(q)
        ok = np.zeros(len(li), bool)
        for j, (lm, base) in enumerate(zip(li, bases[mask])):
            ent = tree.get(int(base))
            if ent is None:
                continue
            p_u[j] = se3_np.transform_point(ent[1], self.lm_pos[lm])
            ok[j] = True
        if ok.sum() < 8:
            return None
        from srba_slam_tpu.utils.evaluation import align_se3

        p_sel, q_sel = p_u[ok], q[ok]
        R, t = align_se3(q_sel, p_sel)          # R q + t ~ p
        res = np.linalg.norm(q_sel @ R.T + t - p_sel, axis=1)
        keep = res <= max(3.0 * np.median(res), 1e-6)
        if keep.sum() >= 8:
            R, t = align_se3(q_sel[keep], p_sel[keep])
            res = np.linalg.norm(q_sel[keep] @ R.T + t - p_sel[keep], axis=1)
        if np.median(res) > 1.0:  # meters — geometry didn't agree
            return None
        return se3_np.log(R, t)

    def _edge_creation_policy(self, kf: int, obs_lm_idx: np.ndarray,
                              obs_pts: np.ndarray | None = None) -> list:
        """≙ mySRBA::edge_creation_policy (srba-stereo-slam.h:144-308)."""
        p = self.p
        created = []
        is_base = kf % p.submap_size == 0
        cur_center = (kf // p.submap_size) * p.submap_size

        def seed(u, v):
            return se3_np.relative(self.kf_global[v], self.kf_global[u])

        def lc_seed(u, v):
            g = self._geometric_edge_seed(u, v, obs_lm_idx, obs_pts)
            return g if g is not None else seed(u, v)

        if not is_base:
            # mid-submap: single edge to the current localmap center
            self.localmap_center[kf] = cur_center
            created.append(self._add_edge(cur_center, kf, seed(cur_center, kf),
                                          kind=0))
        else:
            # new submap base: vote observations per existing localmap
            # center. Only landmarks with an EXISTING base keyframe vote —
            # in the reference, edges are created before the new KF's fresh
            # landmarks are initialized, so they have no base to count
            # (srba-stereo-slam.h:221 make_ordered_list_base_kfs); counting
            # them here would self-vote kf and isolate it behind a self-edge.
            self.localmap_center[kf] = kf
            bases = self.lm_base[obs_lm_idx] if len(obs_lm_idx) else \
                np.zeros(0, np.int32)
            bases = bases[bases != kf]
            if len(bases):
                centers = self.localmap_center[bases]
                centers = np.where(centers >= 0, centers, bases)
                counts = np.bincount(centers)
                order = np.argsort(-counts, kind="stable")
                ranked = [(int(c), int(counts[c])) for c in order if counts[c] > 0]
            else:
                prev_c = int(self.localmap_center[kf - 1])
                ranked = [(prev_c if prev_c >= 0 else kf - 1, 1)]
            # every base-KF area edge is estimated from the shared
            # observations (≙ has_approx_init_val=false on all edges of the
            # base branch, srba-stereo-slam.h:279-294) — the top-voted area
            # can be a far loop-closure target, where a drift-consistent
            # seed would hide the loop
            top_center = ranked[0][0]
            # annotation: the top-voted edge IS the loop-closure edge when
            # it lands on the estimator-confirmed LC target's area
            lc_target = (int(self.localmap_center[self._lc_old_id])
                         if self._lc_detected and self._lc_old_id is not None
                         else None)
            if lc_target is not None and lc_target < 0:
                lc_target = self._lc_old_id
            created.append(
                self._add_edge(top_center, kf, lc_seed(top_center, kf),
                               kind=2 if top_center == lc_target else 1))
            # extra edges: far-away well-supported areas => loop-closure edges
            for center, n in ranked[1:]:
                if n < p.min_obs_to_loop_closure:
                    continue
                if self.topo_distance(kf, center, p.max_optimize_depth + 1) \
                        >= p.max_optimize_depth:
                    created.append(
                        self._add_edge(center, kf, lc_seed(center, kf),
                                       kind=2))
        # explicit LC edge requested by the estimator's confirmation stage
        if self._lc_detected and self._lc_old_id is not None:
            target = int(self.localmap_center[self._lc_old_id])
            if target < 0:
                target = self._lc_old_id
            have = {int(self._edge_u[e]) for e in created} | \
                   {int(self._edge_v[e]) for e in created}
            if target not in have and target != kf:
                created.append(
                    self._add_edge(target, kf, lc_seed(target, kf), kind=2))
        self._lc_detected = False
        self._lc_old_id = None
        return created

    # ------------------------------------------------------------- insertion
    def define_new_keyframe(self, observations, run_opt: bool = True) -> NewKFInfo:
        """Insert a keyframe.

        observations: either an iterable of (lm_id, ul, vl, ur,
        rel_pos3d_or_None) — ≙ the obs list built at reference .cpp:139-161 /
        685-728 — or a pre-vectorized tuple of arrays
        ``(lm_ids [N], px [N, 3], rel_pos [N, 3])`` (rows with non-finite
        rel_pos fall back to the default initialization).

        Does NOT force earlier queued window solves to land — insertions
        chain from the host mirror and the solves commit whenever the owner
        next pulls (see the latency model in the class docstring).
        """
        kf = self.n_kfs
        assert kf < self.p.max_kfs
        self.n_kfs += 1

        # initial global pose estimate
        if kf == 0:
            self.kf_global[0] = 0.0
        else:
            rel = (
                self._initial_rel_pose
                if self._initial_rel_pose is not None
                else np.zeros(6)
            )
            self.kf_global[kf] = se3_np.compose(self.kf_global[kf - 1], rel)
        self._initial_rel_pose = None

        lm_ids, px, rel_pos = _obs_as_arrays(observations)
        obs_lm_idx = self._register_observations(kf, lm_ids, px, rel_pos)

        created = [] if kf == 0 else self._edge_creation_policy(
            kf, obs_lm_idx, rel_pos)

        if not run_opt or kf == 0:
            return NewKFInfo(kf, created, 0.0, 0.0, 0.0, 1, len(obs_lm_idx))
        info = self._dispatch_window_opt(kf, created)
        if not self.lazy:
            self.commit_pending()
        return info

    def _register_observations(self, kf: int, lm_ids: np.ndarray,
                               px: np.ndarray, rel_pos: np.ndarray) -> np.ndarray:
        """Vectorized landmark registration + observation append. Returns the
        landmark indices of the new KF's observations."""
        n = len(lm_ids)
        if n == 0:
            return np.zeros(0, np.int64)
        max_id = int(lm_ids.max())
        if max_id >= self._lookup_cap:
            new_cap = max(self._lookup_cap * 2, max_id + 1)
            grown = np.full(new_cap, -1, np.int32)
            grown[: self._lookup_cap] = self._lm_lookup
            self._lm_lookup = grown
            self._lookup_cap = new_cap
        li = self._lm_lookup[lm_ids].astype(np.int64)
        new_mask = li < 0
        n_new = int(new_mask.sum())
        if n_new:
            while self.n_lms + n_new > self._lm_cap:
                self._lm_cap *= 2
                self.lm_base = np.concatenate(
                    [self.lm_base, np.zeros_like(self.lm_base)])
                self.lm_pos = np.concatenate(
                    [self.lm_pos, np.zeros_like(self.lm_pos)])
            new_idx = self.n_lms + np.arange(n_new)
            self._lm_lookup[lm_ids[new_mask]] = new_idx
            li[new_mask] = new_idx
            self.lm_base[new_idx] = kf
            rel_new = rel_pos[new_mask]
            ok = np.isfinite(rel_new).all(axis=1)
            self.lm_pos[new_idx] = np.where(
                ok[:, None], rel_new, np.array([0.0, 0.0, 10.0]))
            self.n_lms += n_new
        while self.n_obs + n > self._obs_cap:
            self._obs_cap *= 2
            self.obs_kf = np.concatenate([self.obs_kf, np.zeros_like(self.obs_kf)])
            self.obs_lm = np.concatenate([self.obs_lm, np.zeros_like(self.obs_lm)])
            self.obs_px = np.concatenate([self.obs_px, np.zeros_like(self.obs_px)])
        sl = slice(self.n_obs, self.n_obs + n)
        self.obs_kf[sl] = kf
        self.obs_lm[sl] = li
        self.obs_px[sl] = px
        self.n_obs += n
        return li

    # ----------------------------------------------------------- optimization
    def _dispatch_window_opt(self, root: int, created_edges) -> NewKFInfo:
        """Build the ≤max_optimize_depth window, dispatch the BA program, and
        defer the result pull (see the module docstring's latency model)."""
        p = self.p
        tree = self.spanning_tree(root, p.max_optimize_depth, allow_stale=True)
        # nearest-first, capped at the static capacity
        win_kfs = sorted(tree.keys(), key=lambda k: (tree[k][0], -k))[: p.win_cams]
        assert win_kfs[0] == root

        win_map = np.full(self.n_kfs, -1, np.int32)
        win_map[win_kfs] = np.arange(len(win_kfs))
        obs_kf = self.obs_kf[: self.n_obs]
        obs_lm = self.obs_lm[: self.n_obs]
        in_win = win_map[obs_kf] >= 0
        base_in_win = win_map[self.lm_base[obs_lm]] >= 0
        sel = np.nonzero(in_win & base_in_win)[0]
        # local landmark set; over capacity, keep the BEST-SUPPORTED
        # landmarks (most in-window observations; ties broken by id for
        # determinism) — an arbitrary id-prefix would silently drop exactly
        # the well-tracked landmarks a loop-closure window needs
        lms, lm_counts = np.unique(obs_lm[sel], return_counts=True)
        # prune single-observation landmarks: a landmark with ONE in-window
        # stereo observation has an invertible 3x3 J_l^T J_l, so the Schur
        # complement cancels its camera information EXACTLY (O(lambda) with
        # damping) — it cannot move any pose, and re-"optimizing" it only
        # adds damping noise to its estimate. Measured on the street
        # workload they are ~85% of window landmarks; pruning keeps windows
        # in the small compiled buckets (5-8x cheaper per LM iteration).
        n_pruned_single = 0
        multi = lm_counts >= 2
        if multi.any() and not multi.all():
            n_pruned_single = int(lm_counts[~multi].sum())
            lms, lm_counts = lms[multi], lm_counts[multi]
        if len(lms) > p.win_lms:
            keep = np.argsort(-lm_counts, kind="stable")[: p.win_lms]
            lms = np.sort(lms[keep])
        if len(sel) > p.win_obs:
            sel = sel[-p.win_obs:]  # favor recent observations
        lm_map = np.full(self.n_lms, -1, np.int32)
        lm_map[lms] = np.arange(len(lms))
        sel = sel[lm_map[obs_lm[sel]] >= 0]
        lms_in_sel = np.unique(obs_lm[sel])
        if len(lms_in_sel) < len(lms):
            lms = lms_in_sel
            lm_map[:] = -1
            lm_map[lms] = np.arange(len(lms))
        n_dropped = int((in_win & base_in_win).sum()) - len(sel) \
            - n_pruned_single
        if n_dropped > 0:
            # long-range (loop-closure-scale) edge inside the window =>
            # truncation directly weakens the closure: warn unconditionally
            eu_w = self._edge_u[: self.n_edges]
            ev_w = self._edge_v[: self.n_edges]
            both_in = (win_map[np.clip(eu_w, 0, self.n_kfs - 1)] >= 0) & \
                      (win_map[np.clip(ev_w, 0, self.n_kfs - 1)] >= 0)
            has_lc_edge = bool(
                (np.abs(eu_w - ev_w)[both_in] > p.submap_size).any())
            msg = (
                f"WARNING kf{root}: window capacity truncated {n_dropped} "
                f"observations (win_lms={p.win_lms}, win_obs={p.win_obs}) — "
                "loop-closure strength may suffer"
            )
            if has_lc_edge:
                print(msg + " [loop-closure edge in window]", flush=True)
            else:
                self.log(1, msg)

        # bucket the static shapes: typical small windows run a much cheaper
        # compiled program than loop-closure-sized ones; at most five
        # programs ever compile. The ladder reflects post-pruning shapes:
        # landmark/observation counts stay small (multi-obs landmarks only),
        # while deep spanning-tree balls still raise the camera count.
        buckets = [
            # the street/KITTI workload's early-to-mid-run windows use
            # <=~360 landmarks / ~900 observations after pruning (probed on
            # the bench workload) — a (512, 1024) bucket runs their per-LM-
            # iteration one-hot selector contractions at 1/4 the cost of
            # the (1024, 2048) bucket they previously landed in
            (min(8, p.win_cams), min(512, p.win_lms), min(1024, p.win_obs)),
            (min(8, p.win_cams), min(1024, p.win_lms), min(2048, p.win_obs)),
            (min(16, p.win_cams), min(1024, p.win_lms), min(2048, p.win_obs)),
            (p.win_cams, min(2048, p.win_lms), min(4096, p.win_obs)),
            (p.win_cams, p.win_lms, p.win_obs),
        ]
        for C, L, O in buckets:
            if len(win_kfs) <= C and len(lms) <= L and len(sel) <= O:
                break
        win_arr = np.asarray(win_kfs)
        cam_pose = np.zeros((C, 6), np.float32)
        cam_valid = np.zeros(C, bool)
        # initialize window poses ALONG THE SPANNING TREE from the root (the
        # relative SRBA parameterization), not from global-pose differences:
        # a freshly created loop-closure edge with a geometric seed places
        # the far area correctly relative to the root, so the BA starts near
        # the reconciled geometry instead of the drifted one (where the
        # robust kernel would discard the true loop residuals as outliers)
        cam_pose[: len(win_kfs)] = np.stack([tree[k][1] for k in win_kfs])
        cam_valid[: len(win_kfs)] = True
        lm_pos = np.zeros((L, 3), np.float32)
        lm_base_loc = np.zeros(L, np.int32)
        lm_valid = np.zeros(L, bool)
        lm_pos[: len(lms)] = self.lm_pos[lms]
        lm_base_loc[: len(lms)] = win_map[self.lm_base[lms]]
        lm_valid[: len(lms)] = True
        oc = np.zeros(O, np.int32)
        ol = np.zeros(O, np.int32)
        opx = np.zeros((O, 3), np.float32)
        ov = np.zeros(O, bool)
        n_o = len(sel)
        oc[:n_o] = win_map[obs_kf[sel]]
        ol[:n_o] = lm_map[obs_lm[sel]]
        opx[:n_o] = self.obs_px[: self.n_obs][sel]
        ov[:n_o] = True

        kw = dict(
            kernel_param=p.kernel_param,
            max_iters=p.opt_iters,
            use_kernel=p.use_robust_kernel,
            w_prior_rot=p.anchor_prior_w_rot,
            w_prior_trans=p.anchor_prior_w_trans,
            stage1_iters=p.stage1_iters,
            use_kernel_stage1=p.use_robust_kernel_stage1,
        )
        if self.mesh is not None:
            # mesh mode: observation-sharded SPMD window solve (one
            # sequence's BA across the mesh; see shard_window_obs)
            from srba_slam_tpu.ops.window_ba import shard_window_obs

            win = BAWindow(
                cam_pose=jnp.asarray(cam_pose), cam_valid=jnp.asarray(cam_valid),
                lm_pos=jnp.asarray(lm_pos), lm_base=jnp.asarray(lm_base_loc),
                lm_valid=jnp.asarray(lm_valid), obs_cam=jnp.asarray(oc),
                obs_lm=jnp.asarray(ol), obs_px=jnp.asarray(opx),
                obs_valid=jnp.asarray(ov))
            r = optimize_window(shard_window_obs(win, self.mesh), self.cam,
                                **kw)
            res_blob = jnp.concatenate([
                r.cam_pose.ravel(), r.lm_pos.ravel(),
                jnp.stack([r.cost_init, r.cost_final, r.obs_rmse,
                           r.obs_rmse_stg1])])
        info = NewKFInfo(
            kf_id=root,
            created_edges=created_edges,
            cost_init=float("nan"),
            cost_final=float("nan"),
            obs_rmse=float("nan"),
            n_window_kfs=len(win_kfs),
            n_window_obs=n_o,
            pending=True,
            truncated_obs=n_dropped,
        )
        entry = dict(
            root=root,
            C=C, L=L,
            win_arr=win_arr,
            win_map=win_map,
            lms=lms,
            info=info,
            old_root_global=self.kf_global[root].copy(),
        )
        if self.mesh is not None:
            # mesh mode dispatched immediately above: a 1-entry group
            self._pending.append(dict(blob=res_blob[None, :],
                                      entries=[entry]))
        else:
            # queue; groups of WINDOW_SLOTS dispatch as ONE program (the
            # per-solve jitted call cost ~2-7 ms of host RPC each through
            # tunneled runtimes). Dispatching every full group EAGERLY keeps
            # the device solving while the host resolves later insertions.
            from srba_slam_tpu.ops.window_ba import WINDOW_SLOTS

            ints, floats = pack_window(cam_pose, cam_valid, lm_pos,
                                       lm_base_loc, lm_valid, oc, ol, opx, ov)
            self._queued.append(dict(ints=ints, floats=floats,
                                     C=C, L=L, O=O, entry=entry, kw=kw))
            # eager HALF-group dispatch: waiting for a full group starves
            # the device during the host's resolution walk (solves used to
            # trickle per insert); half groups keep it fed at a quarter of
            # the per-solve dispatch overhead
            if len(self._queued) >= WINDOW_SLOTS // 2:
                self._dispatch_queued()
        return info

    def _dispatch_queued(self):
        """Dispatch every built-but-undispatched window solve, grouped by
        capacity bucket into WINDOW_SLOTS-slot batched programs (ONE jitted
        call + one stacked upload per group instead of per solve)."""
        q, self._queued = self._queued, []
        if not q:
            return
        from srba_slam_tpu.ops.window_ba import (
            WINDOW_SLOTS, optimize_windows_batch_blob,
        )

        i = 0
        while i < len(q):
            key = (q[i]["C"], q[i]["L"], q[i]["O"])
            grp = [q[i]]
            i += 1
            while (i < len(q) and len(grp) < WINDOW_SLOTS
                   and (q[i]["C"], q[i]["L"], q[i]["O"]) == key):
                grp.append(q[i])
                i += 1
            g = len(grp)
            pad = WINDOW_SLOTS - g
            # pad with a COPY of the first window: the vmapped solve runs
            # padded lanes too, and a real window is guaranteed benign
            ints = np.stack([x["ints"] for x in grp]
                            + [grp[0]["ints"]] * pad)
            floats = np.stack([x["floats"] for x in grp]
                              + [grp[0]["floats"]] * pad)
            valids = np.arange(WINDOW_SLOTS) < g
            blobs = optimize_windows_batch_blob(
                jnp.asarray(ints), jnp.asarray(floats), jnp.asarray(valids),
                *key, self.cam, **grp[0]["kw"])
            self._pending.append(dict(blob=blobs,
                                      entries=[x["entry"] for x in grp]))

    _N_PENDING_HANDLES = 1  # one packed f32 blob per solve GROUP (per-array
    # pull overhead on tunneled runtimes; see optimize_windows_batch_blob)

    def pending_device_arrays(self) -> tuple:
        """Device arrays of ALL in-flight window solves (oldest first, one
        packed blob per GROUP), for merging into the caller's next bulk
        device_get (empty tuple when nothing is pending). Dispatches any
        still-queued windows first."""
        self._dispatch_queued()
        return tuple(p["blob"] for p in self._pending)

    def commit_pending(self, host_vals: tuple | None = None):
        """Write back every queued window solve in dispatch order.
        ``host_vals``, when given, must be the already-pulled numpy values of
        ``pending_device_arrays()`` (one [WINDOW_SLOTS, row] array per
        group)."""
        self._dispatch_queued()
        groups, self._pending = self._pending, []
        if not groups:
            return
        if host_vals is None:
            host_vals = bulk_pull(tuple(p["blob"] for p in groups))
        assert len(host_vals) == len(groups)
        committed = []
        for grp, rows in zip(groups, host_vals):
            rows = np.asarray(rows)
            if rows.ndim == 1:  # defensive: a flat single-solve blob
                rows = rows[None]
            for r, entry in enumerate(grp["entries"]):
                self._commit_one(entry, (rows[r],), recompute=False)
                committed.append(entry)
        # ONE spanning-tree recompute for the whole commit burst (edges are
        # the source of truth; per-solve recomputes were O(n_kfs) python
        # each and only the final state is ever read — see _on_rba_commit)
        for k, (_h, rel) in self.spanning_tree(0, allow_stale=True).items():
            self.kf_global[k] = rel
        if self.on_commit is not None:
            for entry in committed:
                self.on_commit(entry["root"], entry["old_root_global"],
                               self.kf_global[entry["root"]].copy())

    def _commit_one(self, p: dict, host_vals: tuple,
                    recompute: bool = True):
        blob = np.asarray(host_vals[0])
        C, L = p["C"], p["L"]
        cam_opt_f = blob[: C * 6].reshape(C, 6)
        lm_opt_f = blob[C * 6: C * 6 + L * 3].reshape(L, 3)
        cost_init, cost_final, rmse, rmse_stg1 = blob[C * 6 + L * 3:]
        cam_opt = np.asarray(cam_opt_f, np.float64)
        win_map = p["win_map"]
        # keyframes inserted AFTER this solve dispatched are outside its
        # window: pad the dispatch-time map so their edges are ignored
        if len(win_map) < self.n_kfs:
            win_map = np.concatenate([
                win_map,
                np.full(self.n_kfs - len(win_map), -1, win_map.dtype),
            ])
        # Edges are the source of truth (the SRBA state): update every edge
        # whose endpoints are both in the window from the optimized
        # window-relative poses, then DERIVE all global poses by composing the
        # spanning tree from KF0 — the anchor can never move (the window's
        # internal gauge, root frozen, is irrelevant to the extracted relative
        # information).
        eu = self._edge_u[: self.n_edges]
        ev = self._edge_v[: self.n_edges]
        wu = win_map[eu]
        wv = win_map[ev]
        m = (wu >= 0) & (wv >= 0)
        if m.any():
            self._edge_pose[np.nonzero(m)[0]] = se3_np.relative_batch(
                cam_opt[wv[m]], cam_opt[wu[m]])
        if recompute:
            for k, (_h, rel) in self.spanning_tree(0,
                                                   allow_stale=True).items():
                self.kf_global[k] = rel
        lms = p["lms"]
        self.lm_pos[lms] = np.asarray(lm_opt_f, np.float64)[: len(lms)]
        info = p["info"]
        info.cost_init = float(cost_init)
        info.cost_final = float(cost_final)
        info.obs_rmse = float(rmse)
        info.obs_rmse_stg1 = float(rmse_stg1)
        info.pending = False
        if recompute and self.on_commit is not None:
            self.on_commit(p["root"], p["old_root_global"],
                           self.kf_global[p["root"]].copy())

    def flush(self):
        """Force every queued window solve to land (no-op when none)."""
        if self._pending or self._queued:
            self.commit_pending()

    # -------------------------------------------------------------- exports
    def get_global_graphslam_problem(self):
        """kf2kf constraint list for the final pose-graph solve
        (≙ get_global_graphslam_problem, reference .cpp:946-947)."""
        self.flush()
        return (
            self._edge_u[: self.n_edges].copy(),
            self._edge_v[: self.n_edges].copy(),
            self._edge_pose[: self.n_edges].copy(),
        )

    def save_graph_as_dot(self, path: str):
        """≙ save_graph_as_dot (reference .cpp:801, 1094-1095): annotated
        like the reference's SRBA exports — nodes carry their current
        global pose estimate (submap-center nodes doubled), edges carry
        their relative pose seed and type (solid = submap/base edges,
        bold red = loop-closure edges)."""
        kinds = {0: "submap", 1: "base", 2: "lc"}
        with open(path, "w") as f:
            f.write("graph srba {\n")
            f.write("  node [shape=circle fontsize=9];\n")
            for k in range(self.n_kfs):
                p = self.kf_global[k]
                shape = ("doublecircle"
                         if int(self.localmap_center[k]) == k else "circle")
                f.write(
                    f'  {k} [shape={shape} label="{k}" '
                    f'pose="{p[3]:.3f} {p[4]:.3f} {p[5]:.3f}"];\n')
            for e in range(self.n_edges):
                kind = kinds.get(int(self._edge_kind[e]), "submap")
                rel = self._edge_pose[e]
                style = (' color=red penwidth=2' if kind == "lc" else "")
                f.write(
                    f"  {self._edge_u[e]} -- {self._edge_v[e]} "
                    f'[kind="{kind}"{style} '
                    f'rel="{rel[3]:.3f} {rel[4]:.3f} {rel[5]:.3f}"];\n')
            f.write("}\n")

    # ------------------------------------------------------------ accessors
    @property
    def edge_u(self) -> np.ndarray:
        return self._edge_u[: self.n_edges]

    @property
    def edge_v(self) -> np.ndarray:
        return self._edge_v[: self.n_edges]

    @property
    def edge_pose(self) -> np.ndarray:
        return self._edge_pose[: self.n_edges]

def _obs_as_arrays(observations):
    """Normalize either obs format to (lm_ids [N], px [N,3], rel_pos [N,3])."""
    if isinstance(observations, tuple) and len(observations) == 3 \
            and isinstance(observations[0], np.ndarray):
        lm_ids, px, rel = observations
        return (np.asarray(lm_ids, np.int64), np.asarray(px, np.float64),
                np.asarray(rel, np.float64))
    rows = list(observations)
    n = len(rows)
    lm_ids = np.zeros(n, np.int64)
    px = np.zeros((n, 3), np.float64)
    rel = np.full((n, 3), np.nan)
    for i, (lm_id, ul, vl, ur, rel_pos) in enumerate(rows):
        lm_ids[i] = lm_id
        px[i] = (ul, vl, ur)
        if rel_pos is not None:
            rel[i] = rel_pos
    return lm_ids, px, rel
