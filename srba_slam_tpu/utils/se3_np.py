"""Pure-numpy mirror of the SE(3) 6-vector algebra in ``se3``.

Host-side graph bookkeeping (spanning trees, pose composition along paths,
global-pose refresh after optimization) touches hundreds of tiny 6-vectors;
dispatching each through JAX would cost a device round-trip per op. These
numpy twins are bit-compatible (same [wx wy wz tx ty tz] layout, float64
internally for stability) and exist only for host logic — device code uses
``srba_slam_tpu.utils.se3``.
"""

from __future__ import annotations

import numpy as np


def hat(w: np.ndarray) -> np.ndarray:
    return np.array(
        [[0.0, -w[2], w[1]], [w[2], 0.0, -w[0]], [-w[1], w[0], 0.0]]
    )


def so3_exp(w: np.ndarray) -> np.ndarray:
    w = np.asarray(w, np.float64)
    theta = np.linalg.norm(w)
    W = hat(w)
    if theta < 1e-9:
        return np.eye(3) + W + 0.5 * W @ W
    a = np.sin(theta) / theta
    b = (1.0 - np.cos(theta)) / theta**2
    return np.eye(3) + a * W + b * W @ W


def so3_log(R: np.ndarray) -> np.ndarray:
    R = np.asarray(R, np.float64)
    tr = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(tr)
    if theta < 1e-9:
        return np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]) / 2.0
    if theta > np.pi - 1e-6:
        # near pi: use the symmetric part
        A = (R + np.eye(3)) / 2.0
        axis = np.sqrt(np.maximum(np.diag(A), 0.0))
        # fix signs from off-diagonals
        if axis[0] > 0:
            axis[1] = np.copysign(axis[1], A[0, 1])
            axis[2] = np.copysign(axis[2], A[0, 2])
        elif axis[1] > 0:
            axis[2] = np.copysign(axis[2], A[1, 2])
        axis /= max(np.linalg.norm(axis), 1e-12)
        return axis * theta
    return (
        theta
        / (2.0 * np.sin(theta))
        * np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    )


def exp(xi: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    xi = np.asarray(xi, np.float64)
    return so3_exp(xi[:3]), xi[3:].copy()


def log(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    return np.concatenate([so3_log(R), np.asarray(t, np.float64)])


def compose(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    Ra, ta = exp(a)
    Rb, tb = exp(b)
    return log(Ra @ Rb, Ra @ tb + ta)


def inverse(a: np.ndarray) -> np.ndarray:
    Ra, ta = exp(a)
    return log(Ra.T, -Ra.T @ ta)


def relative(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pose of `a` as seen from frame `b` (== inverse(b) ⊕ a)."""
    return compose(inverse(b), a)


def transform_point(pose: np.ndarray, p: np.ndarray) -> np.ndarray:
    R, t = exp(pose)
    return R @ np.asarray(p, np.float64) + t
