"""Debug artifact dumps (≙ the reference's ``debug=true`` instrumentation).

With debug enabled the reference writes per-keyframe inspection files:
raw inter-frame matches (``if_raw_match*``, src/CSRBAStereoSLAMEstimator.cpp:
1455-1473), post-filter matches with status (``if_match_after*``,
:1649-1721), DA distances (``da_dist*``, :566-616), SRBA input observations
(``da_info_*.txt``, :750-764), loop-closure correspondences
(``loop_closure_info_*.txt``, :676-727) and per-KF keypoints/matches
(CStereoSLAMKF::saveInfoToFiles, src/CStereoSLAMKF.cpp:60-110). Same file
shapes here, driven by the ``debug`` flag in APP_OPTIONS.
"""

from __future__ import annotations

import os

import numpy as np

from srba_slam_tpu.models.data_association import DAResult


class DebugDumper:
    def __init__(self, out_dir: str, enabled: bool = True):
        self.out_dir = out_dir
        self.enabled = enabled
        if enabled:
            os.makedirs(out_dir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def dump_kf(self, kf_id: int, frame, ids: np.ndarray):
        """≙ CStereoSLAMKF::saveInfoToFiles: keypoints, descriptors, matches."""
        if not self.enabled:
            return
        m_valid = np.asarray(frame.m_valid)
        with open(self._path(f"kf_{kf_id:04d}_keypoints.txt"), "w") as f:
            ys_l, xs_l = np.asarray(frame.ys_l), np.asarray(frame.xs_l)
            ys_r, xs_r = np.asarray(frame.ys_r), np.asarray(frame.xs_r)
            for i in np.nonzero(np.asarray(frame.valid_l))[0]:
                f.write(f"L {i} {xs_l[i]} {ys_l[i]}\n")
            for i in np.nonzero(np.asarray(frame.valid_r))[0]:
                f.write(f"R {i} {xs_r[i]} {ys_r[i]}\n")
        with open(self._path(f"kf_{kf_id:04d}_matches.txt"), "w") as f:
            m_r = np.asarray(frame.m_r_idx)
            for i in np.nonzero(m_valid)[0]:
                f.write(f"{i} {m_r[i]} {ids[i]}\n")

    def dump_da(self, kf_id: int, similar: list, da: DAResult):
        """≙ if_match_after* / da_dist*: per-candidate statuses + distances."""
        if not self.enabled:
            return
        self.dump_da_host(kf_id, similar, np.asarray(da.status),
                          np.asarray(da.other_idx), np.asarray(da.tracked_count))

    def dump_da_host(self, kf_id: int, similar: list, status, oidx, tracked):
        if not self.enabled:
            return
        with open(self._path(f"da_info_{kf_id:04d}.txt"), "w") as f:
            for s, other_kf in enumerate(similar):
                f.write(f"# candidate {other_kf} tracked {tracked[s]}\n")
                # every feature that found a raw match (status != sNON_TRACKED=1)
                for i in np.nonzero(status[s] != 1)[0]:
                    f.write(f"{other_kf} {i} {oidx[s, i]} {status[s, i]}\n")

    def dump_loop_closure(self, kf_id: int, lc_with: int, tracked: int):
        """≙ loop_closure_info_*.txt."""
        if not self.enabled:
            return
        with open(self._path(f"loop_closure_info_{kf_id:04d}.txt"), "w") as f:
            f.write(f"{kf_id} {lc_with} {tracked}\n")


def export_scene_ply(path: str, poses: np.ndarray, landmarks=None):
    """Final map/trajectory export (≙ final_global_path.3DScene,
    reference .cpp:960-974) as a standard PLY point cloud: trajectory
    vertices in red, landmarks (if given) in gray."""
    pts = [(*p[3:6], 255, 40, 40) for p in poses]
    if landmarks is not None and len(landmarks):
        pts += [(*lm, 160, 160, 160) for lm in landmarks]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for x, y, z, r, g, b in pts:
            f.write(f"{x:.4f} {y:.4f} {z:.4f} {r} {g} {b}\n")
