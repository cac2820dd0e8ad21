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

Split of labor: the graph bookkeeping (integer adjacency, BFS spanning trees,
vote counting — hundreds of items) runs on host in numpy; every float-heavy
step (the windowed LM + Schur + Cholesky bundle adjustment) is one fixed-shape
jitted device program (srba_slam_tpu.ops.window_ba) shared by all windows.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import numpy as np

import jax
import jax.numpy as jnp

from srba_slam_tpu.ops.window_ba import (BAWindow, optimize_window,
    optimize_window_packed, pack_window)
from srba_slam_tpu.utils import se3_np
from srba_slam_tpu.utils.camera import StereoCamera


@dataclass
class SRBAParams:
    """≙ rba.parameters.* + ecp.* (reference .cpp:1149-1160)."""

    submap_size: int = 10
    max_tree_depth: int = 4
    max_optimize_depth: int = 5
    min_obs_to_loop_closure: int = 50
    use_robust_kernel: bool = True
    kernel_param: float = 1.5
    std_noise_pixels: float = 0.5
    max_kfs: int = 512
    # window capacities (static shapes of the BA program); generous by
    # default — truncation silently weakens loop closures (observed: the
    # 25-KF loop test only snaps shut with all constraints kept)
    win_cams: int = 32
    win_lms: int = 8192
    win_obs: int = 16384
    opt_iters: int = 20
    verbose: bool = False


@dataclass
class NewKFInfo:
    """≙ TNewKeyFrameInfo (reference .cpp:178-181)."""

    kf_id: int
    created_edges: list
    cost_init: float
    cost_final: float
    obs_rmse: float
    n_window_kfs: int
    n_window_obs: int


class SRBAEngine:
    def __init__(self, cam: StereoCamera, params: SRBAParams | None = None):
        self.cam = cam
        self.p = params or SRBAParams()
        self.n_kfs = 0
        # edges: (u, v, T_uv) with T_uv = pose of v in u's frame
        self.edge_u: list[int] = []
        self.edge_v: list[int] = []
        self.edge_pose: list[np.ndarray] = []
        self.adj: dict[int, list[tuple[int, int]]] = {}  # kf -> [(nbr, edge_idx)]
        self.kf_global = np.zeros((self.p.max_kfs, 6), np.float64)
        # landmarks
        self.lm_base: list[int] = []
        self.lm_pos: list[np.ndarray] = []
        self.lm_id2idx: dict[int, int] = {}
        # observations
        # observation storage: preallocated growing arrays (appending to
        # python lists and re-converting per insertion is O(total_obs) each
        # time — quadratic over a run)
        self._obs_cap = 4096
        self.obs_kf = np.zeros(self._obs_cap, np.int32)
        self.obs_lm = np.zeros(self._obs_cap, np.int32)
        self.obs_px = np.zeros((self._obs_cap, 3), np.float64)
        self.n_obs = 0
        # per-kf observed landmark indices (for votes / windows)
        self.kf_obs: dict[int, list[int]] = {}
        # loop-closure hooks (≙ srba-stereo-slam.h:85-97)
        self._lc_detected = False
        self._lc_old_id: int | None = None
        self._initial_rel_pose: np.ndarray | None = None
        self.localmap_center: dict[int, int] = {}  # kf -> its submap center kf

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
    def _add_edge(self, u: int, v: int, pose_uv: np.ndarray) -> int:
        e = len(self.edge_u)
        self.edge_u.append(u)
        self.edge_v.append(v)
        self.edge_pose.append(np.asarray(pose_uv, np.float64))
        self.adj.setdefault(u, []).append((v, e))
        self.adj.setdefault(v, []).append((u, e))
        return e

    def _edge_rel(self, e: int, from_kf: int) -> np.ndarray:
        """Pose of the OTHER endpoint in from_kf's frame."""
        if self.edge_u[e] == from_kf:
            return self.edge_pose[e]
        return se3_np.inverse(self.edge_pose[e])

    def spanning_tree(self, root: int, max_depth: int | None = None):
        """BFS tree: kf -> (hops, pose of kf in root's frame), composed along
        current edge estimates (≙ create_complete_spanning_tree +
        rba_state.spanning_tree topological distances)."""
        out = {root: (0, np.zeros(6))}
        q = deque([root])
        while q:
            k = q.popleft()
            hops, pose_k = out[k]
            if max_depth is not None and hops >= max_depth:
                continue
            for nbr, e in self.adj.get(k, ()):  # noqa: B905
                if nbr in out:
                    continue
                out[nbr] = (hops + 1, se3_np.compose(pose_k, self._edge_rel(e, k)))
                q.append(nbr)
        return out

    def topo_distance(self, a: int, b: int, max_depth: int | None = None) -> int:
        """Graph hops between a and b; a large sentinel when unreachable
        within max_depth."""
        tree = self.spanning_tree(a, max_depth)
        return tree[b][0] if b in tree else 1 << 30

    # --------------------------------------------------- edge creation policy
    def _edge_creation_policy(self, kf: int, obs_lm_indices: list[int]) -> list:
        """≙ mySRBA::edge_creation_policy (srba-stereo-slam.h:144-308)."""
        p = self.p
        created = []
        is_base = kf % p.submap_size == 0
        cur_center = (kf // p.submap_size) * p.submap_size

        def seed(u, v):
            return se3_np.relative(self.kf_global[v], self.kf_global[u])

        if not is_base:
            # mid-submap: single edge to the current localmap center
            self.localmap_center[kf] = cur_center
            created.append(self._add_edge(cur_center, kf, seed(cur_center, kf)))
        else:
            # new submap base: vote observations per existing localmap center
            self.localmap_center[kf] = kf
            votes: dict[int, int] = {}
            for li in obs_lm_indices:
                base = self.lm_base[li]
                center = self.localmap_center.get(base, base)
                votes[center] = votes.get(center, 0) + 1
            if not votes:
                votes = {self.localmap_center.get(kf - 1, kf - 1): 1}
            ranked = sorted(votes.items(), key=lambda kv: -kv[1])
            top_center = ranked[0][0]
            created.append(self._add_edge(top_center, kf, seed(top_center, kf)))
            # extra edges: far-away well-supported areas => loop-closure edges
            for center, n in ranked[1:]:
                if n < p.min_obs_to_loop_closure:
                    continue
                if self.topo_distance(kf, center, p.max_optimize_depth + 1) \
                        >= p.max_optimize_depth:
                    created.append(self._add_edge(center, kf, seed(center, kf)))
        # explicit LC edge requested by the estimator's confirmation stage
        if self._lc_detected and self._lc_old_id is not None:
            target = self.localmap_center.get(self._lc_old_id, self._lc_old_id)
            have = {self.edge_u[e] for e in created} | {self.edge_v[e] for e in created}
            if target not in have and target != kf:
                created.append(self._add_edge(target, kf, seed(target, kf)))
        self._lc_detected = False
        self._lc_old_id = None
        return created

    # ------------------------------------------------------------- insertion
    def define_new_keyframe(self, observations, run_opt: bool = True) -> NewKFInfo:
        """Insert a keyframe.

        observations: iterable of (lm_id, ul, vl, ur, rel_pos3d_or_None) —
        ≙ the obs list built at reference .cpp:139-161 / 685-728 (feat id,
        left px, right px, optional initial relative position).
        """
        kf = self.n_kfs
        assert kf < self.p.max_kfs
        self.n_kfs += 1
        self.kf_obs[kf] = []

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

        # landmarks + observations
        obs_lm_indices = []
        for (lm_id, ul, vl, ur, rel_pos) in observations:
            if lm_id in self.lm_id2idx:
                li = self.lm_id2idx[lm_id]
            else:
                li = len(self.lm_base)
                self.lm_id2idx[lm_id] = li
                self.lm_base.append(kf)
                pos = (
                    np.asarray(rel_pos, np.float64)
                    if rel_pos is not None
                    else np.array([0.0, 0.0, 10.0])
                )
                self.lm_pos.append(pos)
            if self.n_obs == self._obs_cap:
                self._obs_cap *= 2
                self.obs_kf = np.concatenate([self.obs_kf, np.zeros_like(self.obs_kf)])
                self.obs_lm = np.concatenate([self.obs_lm, np.zeros_like(self.obs_lm)])
                self.obs_px = np.concatenate([self.obs_px, np.zeros_like(self.obs_px)])
            self.obs_kf[self.n_obs] = kf
            self.obs_lm[self.n_obs] = li
            self.obs_px[self.n_obs] = (ul, vl, ur)
            self.n_obs += 1
            self.kf_obs[kf].append(li)
            obs_lm_indices.append(li)

        created = [] if kf == 0 else self._edge_creation_policy(kf, obs_lm_indices)

        if not run_opt or kf == 0:
            return NewKFInfo(kf, created, 0.0, 0.0, 0.0, 1, len(obs_lm_indices))
        return self._optimize_local_window(kf, created)

    # ----------------------------------------------------------- optimization
    def _optimize_local_window(self, root: int, created_edges) -> NewKFInfo:
        p = self.p
        tree = self.spanning_tree(root, p.max_optimize_depth)
        # nearest-first, capped at the static capacity
        win_kfs = sorted(tree.keys(), key=lambda k: (tree[k][0], -k))[: p.win_cams]
        win_set = {k: i for i, k in enumerate(win_kfs)}  # root -> 0
        assert win_set[root] == 0

        obs_kf = self.obs_kf[: self.n_obs]
        obs_lm = self.obs_lm[: self.n_obs]
        in_win = np.isin(obs_kf, win_kfs)
        lm_base_arr = np.asarray(self.lm_base)
        base_in_win = np.isin(lm_base_arr[obs_lm], win_kfs)
        sel = np.nonzero(in_win & base_in_win)[0]
        # local landmark set
        lms = np.unique(obs_lm[sel])
        if len(lms) > p.win_lms:
            lms = lms[: p.win_lms]
            sel = sel[np.isin(obs_lm[sel], lms)]
        if len(sel) > p.win_obs:
            sel = sel[-p.win_obs:]  # favor recent observations
            lms = np.unique(obs_lm[sel])
        lm_local = {li: i for i, li in enumerate(lms)}
        n_dropped = int((in_win & base_in_win).sum()) - len(sel)
        if n_dropped > 0:
            print(
                f"[srba] WARNING kf{root}: window capacity truncated "
                f"{n_dropped} observations (win_lms={p.win_lms}, "
                f"win_obs={p.win_obs}) — loop-closure strength may suffer"
            )

        # bucket the static shapes: the common small window (a handful of
        # KFs, a few hundred landmarks) runs a ~4x cheaper compiled program
        # than loop-closure-sized windows; exactly two programs ever compile
        buckets = [
            (min(16, p.win_cams), min(2048, p.win_lms), min(4096, p.win_obs)),
            (p.win_cams, p.win_lms, p.win_obs),
        ]
        for C, L, O in buckets:
            if len(win_kfs) <= C and len(lms) <= L and len(sel) <= O:
                break
        cam_pose = np.zeros((C, 6), np.float32)
        cam_valid = np.zeros(C, bool)
        root_global = self.kf_global[root]
        for k, i in win_set.items():
            cam_pose[i] = se3_np.relative(self.kf_global[k], root_global)
            cam_valid[i] = True
        lm_pos = np.zeros((L, 3), np.float32)
        lm_base_loc = np.zeros(L, np.int32)
        lm_valid = np.zeros(L, bool)
        for li, i in lm_local.items():
            lm_pos[i] = self.lm_pos[li]
            lm_base_loc[i] = win_set[self.lm_base[li]]
            lm_valid[i] = True
        oc = np.zeros(O, np.int32)
        ol = np.zeros(O, np.int32)
        opx = np.zeros((O, 3), np.float32)
        ov = np.zeros(O, bool)
        n_o = len(sel)
        win_map = np.full(self.n_kfs, -1, np.int32)
        for k_, i_ in win_set.items():
            win_map[k_] = i_
        lm_map = np.full(len(self.lm_base), -1, np.int32)
        for l_, i_ in lm_local.items():
            lm_map[l_] = i_
        oc[:n_o] = win_map[obs_kf[sel]]
        ol[:n_o] = lm_map[obs_lm[sel]]
        opx[:n_o] = self.obs_px[: self.n_obs][sel]
        ov[:n_o] = True

        ints, floats = pack_window(cam_pose, cam_valid, lm_pos, lm_base_loc,
                                   lm_valid, oc, ol, opx, ov)
        res = optimize_window_packed(
            jnp.asarray(ints), jnp.asarray(floats), C, L, O, self.cam,
            kernel_param=p.kernel_param,
            max_iters=p.opt_iters,
            use_kernel=p.use_robust_kernel,
        )
        # Write back. Edges are the source of truth (the SRBA state): update
        # every edge whose endpoints are both in the window from the optimized
        # window-relative poses, then DERIVE all global poses by composing the
        # spanning tree from KF0 — the anchor can never move (the window's
        # internal gauge, root frozen, is irrelevant to the extracted
        # relative information).
        cam_opt_f, lm_opt_f, cost_init, cost_final, rmse = jax.device_get(
            (res.cam_pose, res.lm_pos, res.cost_init, res.cost_final,
             res.obs_rmse)
        )
        cam_opt = cam_opt_f.astype(np.float64)
        for e in range(len(self.edge_u)):
            u, v = self.edge_u[e], self.edge_v[e]
            if u in win_set and v in win_set:
                self.edge_pose[e] = se3_np.relative(
                    cam_opt[win_set[v]], cam_opt[win_set[u]]
                )
        for k, (_h, rel) in self.spanning_tree(0).items():
            self.kf_global[k] = rel
        lm_opt = lm_opt_f.astype(np.float64)
        for li, i in lm_local.items():
            self.lm_pos[li] = lm_opt[i]

        return NewKFInfo(
            kf_id=root,
            created_edges=created_edges,
            cost_init=float(cost_init),
            cost_final=float(cost_final),
            obs_rmse=float(rmse),
            n_window_kfs=len(win_kfs),
            n_window_obs=n_o,
        )

    # -------------------------------------------------------------- exports
    def get_global_graphslam_problem(self):
        """kf2kf constraint list for the final pose-graph solve
        (≙ get_global_graphslam_problem, reference .cpp:946-947)."""
        return (
            np.asarray(self.edge_u, np.int32),
            np.asarray(self.edge_v, np.int32),
            np.asarray(self.edge_pose, np.float64).reshape(-1, 6),
        )

    def save_graph_as_dot(self, path: str):
        """≙ save_graph_as_dot (reference .cpp:801, 1094-1095)."""
        with open(path, "w") as f:
            f.write("graph srba {\n")
            for e in range(len(self.edge_u)):
                f.write(f"  {self.edge_u[e]} -- {self.edge_v[e]};\n")
            f.write("}\n")
